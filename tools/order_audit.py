"""Audit: every registered query must end in a deterministic global
ORDER BY (the driver's value-hash is row-order-sensitive), and its
DuckDB oracle must have a matching top-level ORDER BY.

The Spark side is checked structurally: the analyzed plan's root must
be a Sort (global), optionally under GlobalLimit/LocalLimit/Project
(orderBy().limit() / trailing select are fine). Single-row results
cannot be mis-ordered, but we still require the Sort for uniformity —
the cost is one no-op exchange on a 1-row relation.

Usage: python tools/order_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from whatdropsnow_etl_spark.session import get_spark

# Plan roots that preserve an underlying global Sort's row order.
_ORDER_PRESERVING = ("GlobalLimit", "LocalLimit", "Project", "SubqueryAlias")


def spark_plan_is_ordered(df) -> bool:
    node = df._jdf.queryExecution().analyzed()
    while node.nodeName() in _ORDER_PRESERVING:
        node = node.children().head()
    if node.nodeName() != "Sort":
        return False
    # Sort's first plan line reads "Sort [keys...], <global>"; require a
    # global sort — sortWithinPartitions ("false") is not deterministic
    # across partition assignment.
    first = node.toString().splitlines()[0]
    return ", true" in first


def oracle_has_order_by(sql: str) -> bool:
    """True if the top-level (depth-0) text contains ORDER BY."""
    depth = 0
    s = sql.upper()
    for m in re.finditer(r"\(|\)|ORDER\s+BY", s):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    oracles = entrymod.oracle_sql()
    bad_spark, bad_oracle = [], []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            bad_spark.append((name, f"ERR building: {e}"))
            continue
        if not spark_plan_is_ordered(df):
            bad_spark.append((name, "no top-level Sort in plan"))
        sql = oracles.get(name)
        if sql is not None and not oracle_has_order_by(sql):
            bad_oracle.append(name)
    for name, why in bad_spark:
        print(f"UNORDERED spark  {name}: {why}")
    for name in bad_oracle:
        print(f"UNORDERED oracle {name}")
    if not bad_spark and not bad_oracle:
        print("ORDER AUDIT OK: all queries globally ordered on both twins")
        return 0
    print(f"{len(bad_spark)} spark / {len(bad_oracle)} oracle unordered")
    return 1


if __name__ == "__main__":
    sys.exit(main())
