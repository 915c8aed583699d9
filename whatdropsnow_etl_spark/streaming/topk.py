"""Streaming top-k (heavy hitters) with bounded mergeable state.

The pattern every other sketch module here uses — persist mergeable
REGISTERS per micro-batch, never raw history — applied to frequency
ranking: the state is a Misra-Gries summary of at most ``capacity``
rows, merged per batch with the pointwise-sum-then-decrement rule of
Agarwal et al., "Mergeable Summaries" (PODS'12, §3.2). Guarantees
(the classic MG bounds, pytest-pinned):

- the stored count never overestimates the true count;
- it underestimates by at most N / (capacity+1) (N = total rows
  folded so far) — every subtraction of s is paid for by ≥
  s·(capacity+1) true mass;
- any key with true frequency > N / (capacity+1) is IN the summary
  (it cannot have been decremented to zero).

So ``capacity`` is the precision dial: top-k queries are exact for
keys whose margin over the runner-up exceeds the error bound. State
is O(capacity) rows regardless of stream length or key cardinality —
the whole point at 100 TB, where per-key exact counts (the
incremental_rollup path) may themselves be too hot to keep.

Everything is lazy DataFrame algebra: the (capacity+1)-th largest
count is a sort-limit heap cut crossJoined back as a 1-row relation —
no driver collect, no window over the full key space.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(
    prev: DataFrame | None,
    batch_counts: DataFrame,
    capacity: int,
    key_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Fold one micro-batch's EXACT per-key counts into a bounded
    Misra-Gries summary. ``prev`` is the persisted state (None on the
    first batch); returns the new ≤ ``capacity``-row state.

    Merge rule: pointwise count sum, then subtract the
    (capacity+1)-th largest merged count from every row and drop the
    non-positive remainder — at most ``capacity`` rows can exceed
    that pivot, so the bound holds by construction. When the merged
    relation already fits (≤ capacity keys), the pivot contributes
    zero and the counts stay exact. Ties at the pivot share the same
    pivot value, so the surviving set is deterministic.
    """
    keys = list(key_cols)
    merged = (
        batch_counts
        if prev is None
        else prev.unionByName(batch_counts)
        .groupBy(*keys)
        .agg(F.sum(count_col).alias(count_col))
    )
    pivot_src = merged.orderBy(F.col(count_col).desc(), *keys).limit(capacity + 1)
    pivot = pivot_src.agg(
        F.when(F.count(F.lit(1)) > capacity, F.min(count_col))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("__pivot")
    )
    return (
        merged.crossJoin(F.broadcast(pivot))
        .select(
            *keys,
            (F.col(count_col) - F.col("__pivot")).cast("bigint").alias(count_col),
        )
        .where(F.col(count_col) > 0)
    )


def heavy_hitters(
    state: DataFrame,
    k: int,
    key_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Top-k report over the summary: rank by stored (lower-bound)
    count, deterministic key tiebreak. A sort-limit over ≤ capacity
    rows — trivially cheap; the stream already paid the hard part."""
    keys = list(key_cols)
    from pyspark.sql.window import Window

    top = state.orderBy(F.col(count_col).desc(), *keys).limit(k)
    w = Window.orderBy(F.col(count_col).desc(), *keys)
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "rnk", *keys, count_col
    )
