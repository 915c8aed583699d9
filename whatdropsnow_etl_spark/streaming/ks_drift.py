"""Streaming KS drift maintenance: fold batch value-histograms, ask
KS per trigger.

The sketch-maintenance pattern (topk's Misra-Gries registers, the
line-dedup frequency index) applied to the two-sample KS screen: the
(group, value, count) histogram is an exact MONOID under union +
groupBy-sum, so a foreachBatch sink folds each micro-batch's
compacted histogram into a persisted state relation — O(groups ×
distinct values), never raw history — and the per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.integrity.ks_from_histogram`
over the folded state: the SAME code path the batch operator runs,
so union-over-batches == full relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps).

At 100 TB the state relation stays histogram-sized (value ranges are
bounded in practice — lengths, status codes, bucketed scores); the
per-batch fold is one map-combined aggregate plus a state-sized
shuffle, and the KS report reads only the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.integrity import ks_from_histogram


def fold_value_histogram(
    prev: DataFrame | None,
    batch: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Fold one micro-batch into the persisted (group, value, count)
    histogram state. ``prev`` is None on the first batch. NULL group
    or value rows are excluded (the batch operator's contract)."""
    h = (
        batch.select(
            F.col(group_col),
            F.col(value_col).cast("bigint").alias(value_col),
        )
        .where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias(count_col))
    )
    if prev is None:
        return h
    return (
        prev.unionByName(h)
        .groupBy(group_col, value_col)
        .agg(F.sum(count_col).cast("bigint").alias(count_col))
    )


def ks_drift_report(
    state: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Per-group KS-vs-rest over the folded histogram state —
    delegates to the batch operator's post-histogram half."""
    return ks_from_histogram(state, group_col, value_col, count_col)


def overlap_report(
    state: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Per-group overlap-coefficient-vs-rest over the SAME folded
    histogram state the KS report reads (r10) — the two gauges share
    one monoid, so a drift stream gets both for one fold. Delegates
    to the batch operator's post-histogram half
    (operators.integrity.overlap_from_histogram), keeping the
    batch-folded == full-relation contract."""
    from ..operators.integrity import overlap_from_histogram

    return overlap_from_histogram(state, group_col, value_col, count_col)
