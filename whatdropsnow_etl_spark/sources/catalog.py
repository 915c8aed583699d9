"""Session catalog helpers: expose the test tables as SQL views.

A reference user lives in SQL (`sql.py` is one big query); after
`register_views` every table is addressable from `spark.sql(...)`
with the same canonicalized schemas `load_table` produces — the
timestamp normalization and schema caching ride along for free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLE_NAMES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per test table; returns the
    view names. Views are lazy — nothing is scanned until queried,
    and Catalyst prunes/pushes through them like any DataFrame."""
    names = []
    for t in TABLE_NAMES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
