"""Streaming cross-correlation maintenance: fold per-batch
(type, hour) counts, ask the lagged pairwise correlation per trigger.

The gauge-maintenance pattern (streaming/fano.py — literally the same
(type, hour, count) histogram fold; this module reuses it): the
hourly histogram is an exact MONOID under union + groupBy-sum, and
the per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.events.xcorr_from_hourly`
over the folded state: the SAME code path the batch operator runs, so
batch-folded == full-relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps). Fold
order is irrelevant (a true commutative monoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_floor_index, ts_micros
from ..operators.events import xcorr_from_hourly


def fold_hourly_counts(
    prev: DataFrame | None,
    batch: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Fold one micro-batch into the persisted (type, hour, n)
    histogram state. ``prev`` is None on the first batch. NULL type
    or timestamp rows are excluded (the batch operator's contract);
    the hour index is the shared exact floor helper."""
    us = ts_micros(F.col(ts_col))
    h = (
        batch.select(F.col(type_col).alias("event_type"), us.alias("__us"))
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select(
            "event_type",
            epoch_floor_index(F.col("__us"), 3_600_000_000).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    if prev is None:
        return h
    return (
        prev.unionByName(h)
        .groupBy("event_type", "hour")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def xcorr_report(state: DataFrame, max_lag: int = 2) -> DataFrame:
    """Lagged pairwise correlations over the folded histogram —
    delegates to the batch operator's post-histogram half, so the
    streamed report is bit-identical to event_xcorr over the full
    relation."""
    return xcorr_from_hourly(state, max_lag=max_lag)
