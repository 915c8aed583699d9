"""Driver-contract pins: every registered query is deterministically
ordered on both twins, and the static _ORDER_KEYS table matches the
live output schemas (a schema change without a key-table update would
silently desync the two sides' sort order).

Plan-only: DataFrames are built and analyzed, never executed, so the
whole registry checks in seconds.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tools.order_audit import oracle_has_order_by, spark_plan_is_ordered


def test_order_keys_cover_registry():
    qs = entrymod.queries()
    assert set(entrymod._ORDER_KEYS) == set(qs)


def test_order_keys_match_live_schemas(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        assert entrymod._ORDER_KEYS[name] == sorted(df.columns), name


def test_every_query_globally_sorted(spark):
    unordered = []
    for name, fn in entrymod.queries().items():
        if not spark_plan_is_ordered(fn(spark, SF_SMALL)):
            unordered.append(name)
    assert not unordered, unordered


def test_every_oracle_has_top_level_order_by():
    missing = [
        name
        for name, sql in entrymod.oracle_sql().items()
        if not oracle_has_order_by(sql)
    ]
    assert not missing, missing


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, extra
