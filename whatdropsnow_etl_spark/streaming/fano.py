"""Streaming burstiness maintenance: fold batch (type, hour)
histograms, ask the exact Fano factor per trigger.

The sketch-maintenance pattern (streaming/ks_drift.py, topk's
Misra-Gries registers) applied to the dispersion screen: the
(type, hour, count) histogram is an exact MONOID under union +
groupBy-sum, so a foreachBatch sink folds each micro-batch's
compacted histogram into a persisted state relation — O(types ×
active hours), never raw history — and the per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.events.fano_from_histogram`
over the folded state: the SAME code path the batch operator runs,
so union-over-batches == full relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps).

At 100 TB the state grows one row per (type, hour) — ~9k rows per
type-year — and each fold is one map-combined aggregate plus a
state-sized shuffle; the report reads only the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import fano_from_histogram


def fold_hour_histogram(
    prev: DataFrame | None,
    batch: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    count_col: str = "n",
) -> DataFrame:
    """Fold one micro-batch into the persisted (type, hour, count)
    histogram state. ``prev`` is None on the first batch. NULL type
    or timestamp rows are excluded (the batch operator's contract)."""
    h = (
        batch.select(
            F.col(type_col),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .where(F.col(type_col).isNotNull() & F.col("hour").isNotNull())
        .groupBy(type_col, "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias(count_col))
    )
    if prev is None:
        return h
    return (
        prev.unionByName(h)
        .groupBy(type_col, "hour")
        .agg(F.sum(count_col).cast("bigint").alias(count_col))
    )


def fano_report(
    state: DataFrame,
    type_col: str = "event_type",
    count_col: str = "n",
) -> DataFrame:
    """Exact per-type Fano factor over the folded histogram state —
    delegates to the batch operator's post-histogram half."""
    return fano_from_histogram(state, type_col, "hour", count_col)
