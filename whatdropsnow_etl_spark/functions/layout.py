"""Z-order (Morton) interleaving for multi-dimensional data layout.

The lakehouse pruning trick: sorting a table by ONE column makes
min/max file statistics tight for that column only; interleaving the
bits of several bucketized columns into one sort key keeps EVERY
interleaved column's per-file range bounded, so a scan filtering on
any of them can skip most files. (Delta OPTIMIZE ZORDER BY and
Iceberg's z-ordering rewrite do exactly this; here it's a plain
column expression usable with repartitionByRange + sortWithinPartitions
or any of the sinks.)

All arithmetic is integer and unrolled at plan-build time (shift
amounts are Python literals), so the key is engine-exact and stays
inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucketize_minmax(
    col: Column, lo: Column, hi: Column, bits: int
) -> Column:
    """Order-preserving bucket id in [0, 2**bits) for a BIGINT
    column given its (lo, hi) bounds — integer arithmetic only:
    ``floor((v - lo) * 2**bits / (hi - lo + 1))``. Overflow contract:
    ``(hi - lo) * 2**bits`` must fit int64 (fine for ids, epoch
    days/seconds, cents at any realistic range and bits <= 20).
    """
    span = hi - lo + F.lit(1)
    return F.floor(((col - lo) * F.lit(1 << bits)) / span).cast("long")


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each bucket id.

    Bit j of column i lands at interleaved position
    ``j * len(cols) + i`` — fully unrolled into shift/mask adds
    (``bits * len(cols)`` terms, all literal shifts), so the whole
    expression codegens. Key width = bits * len(cols) <= 63.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError("zorder key wider than 63 bits")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit.cast("long"), j * n + i)
    return out
