"""Z-order data-layout planning: multi-dimensional file clustering.

At 100 TB the cheapest query is the one that never reads the file:
per-file min/max statistics prune a scan only along the sort order.
Z-ordering (Morton interleaving of bucketized dimensions) bounds the
per-file range of EVERY interleaved dimension at once, so filters on
any of them skip files. This module plans and audits that layout as
plain DataFrame expressions (``functions/layout.py`` holds the key
math); writing is ``df.repartitionByRange(F.col(key)).
sortWithinPartitions(key)`` into any of the sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.layout import bucketize_minmax, zorder_key


def zorder_layout_report(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    bits: int = 8,
    file_bits: int = 8,
) -> DataFrame:
    """Audit the z-order layout of a table along two BIGINT
    dimensions: assign every row its Morton key, split the keyspace
    into ``2**file_bits`` equal prefix ranges ("files"), and report
    each file's row count and raw min/max along BOTH dimensions —
    the exact statistics a pruning scan would consult. Tight ranges
    on both dims in every file = the layout works.

    Plan shape: one (min, max)-per-dim 1-row aggregate broadcast
    back (the Q11 scalar-subquery pattern) feeds the order-preserving
    bucketization, the interleave is ``2·bits`` literal shift/mask
    adds inside codegen, and the report is ONE map-side-combined
    groupBy over ``2**file_bits`` groups. Nothing wider than the two
    dim columns leaves the scan, and no UDF anywhere.

    Output: (file_id, n_rows, min_a, max_a, min_b, max_b) — BIGINT.
    """
    a, b = F.col(dim_a).cast("long"), F.col(dim_b).cast("long")
    bounds = df.agg(
        F.min(a).alias("__loa"),
        F.max(a).alias("__hia"),
        F.min(b).alias("__lob"),
        F.max(b).alias("__hib"),
    )
    keyed = df.select(a.alias("__a"), b.alias("__b")).join(F.broadcast(bounds))
    z = zorder_key(
        [
            bucketize_minmax(F.col("__a"), F.col("__loa"), F.col("__hia"), bits),
            bucketize_minmax(F.col("__b"), F.col("__lob"), F.col("__hib"), bits),
        ],
        bits=bits,
    )
    file_id = F.shiftright(z, 2 * bits - file_bits)
    return (
        keyed.select(file_id.alias("file_id"), "__a", "__b")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("__a").cast("bigint").alias("min_a"),
            F.max("__a").cast("bigint").alias("max_a"),
            F.min("__b").cast("bigint").alias("min_b"),
            F.max("__b").cast("bigint").alias("max_b"),
        )
        .select(
            F.col("file_id").cast("bigint").alias("file_id"),
            "n_rows", "min_a", "max_a", "min_b", "max_b",
        )
    )
