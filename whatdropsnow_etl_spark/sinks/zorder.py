"""Z-order (Morton) clustered parquet layout for 2-D data skipping.

Sorting a table by one column gives tight parquet row-group min/max
stats on that column only — a filter on any OTHER column still
reads every row group. Interleaving the bits of two columns into one
Morton value and range-partitioning + sorting by it gives every row
group a tight range in BOTH dimensions (each Z-run is a small
rectangle in (a, b) space), so predicates on either column skip row
groups. This is the core of Delta/Iceberg OPTIMIZE ZORDER, built
here from plain Column expressions: the bit-spread is five
shift-and-mask ops per column (the classic Morton magic numbers),
fully inside whole-stage codegen.

The write is one range-shuffle on the z-value (sampling-based
boundaries, same cost shape as any global sort) + in-partition
sort; no extra pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread16(c: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of 32 bits."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def zorder_value(a: Column, b: Column) -> Column:
    """Morton-interleave two non-negative int expressions (16 bits
    each -> one 32-bit z-value). Normalize BOTH inputs to fill
    [0, 65535] upstream: quantize/bucket wider domains down (rank or
    range bucketing preserves locality; raw modulo does not) and
    scale narrower domains up — a column left in its low bits loses
    the interleave to the other column's high bits and gets no
    clustering."""
    # widen BEFORE the shift: on IntegerType inputs _spread16 can
    # reach 0x55555555 and shiftleft(...) would wrap int32 negative
    # (a >= 32768 sorts before a < 32768 — a broken Morton order
    # across the sign boundary); bigint inputs were unaffected,
    # which is why tests masked it
    return (
        F.shiftleft(_spread16(a).cast("long"), 1)
        .bitwiseOR(_spread16(b).cast("long"))
        .cast("long")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    n_files: int = 8,
) -> None:
    """Write parquet clustered by z(a, b): range-partition on the
    z-value (n_files sampled ranges) then sort within each file so
    row-group stats are tight in both dimensions."""
    with_z = df.withColumn("__z", zorder_value(a, b))
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
