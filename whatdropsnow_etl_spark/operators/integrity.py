"""Foreign-key integrity reporting.

Reference parity: db.py:63-67 — offers referencing missing products
are skipped (logged), not fatal. Spark-first: instead of catching
per-batch FK violations, classify every child row in one pass with a
LEFT JOIN against the parent keys and report valid/orphan counts;
``valid_only`` gives the tolerant-load projection (the rows the
reference would have kept).

Scale: parent key set is projected to its key column only →
broadcast join, zero shuffle on the child (fact) side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_integrity_report(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    group_by: str,
) -> DataFrame:
    """Per-``group_by`` counts of FK-valid vs orphan child rows."""
    parent_keys = parent.select(F.col(pk).alias("__pk")).distinct()
    joined = child.join(
        F.broadcast(parent_keys), child[fk] == F.col("__pk"), "left"
    )
    return (
        joined.groupBy(group_by)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("__pk").alias("n_valid"),
            (F.count(F.lit(1)) - F.count("__pk")).alias("n_orphan"),
        )
    )


def valid_only(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Tolerant-load projection: child rows whose FK exists (semi join)."""
    parent_keys = parent.select(F.col(pk).alias("__pk")).distinct()
    return child.join(F.broadcast(parent_keys), child[fk] == F.col("__pk"), "left_semi")
