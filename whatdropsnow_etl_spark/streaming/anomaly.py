"""Streaming seasonal-anomaly maintenance: fold per-batch
(type, day, hour) bucket counts, ask the weekly-cell z-score screen
per trigger.

The gauge-maintenance pattern (streaming/seasonality.py — the same
fold one grain coarser): the (type, day, hour, count) bucket relation
is an exact MONOID under union + groupBy-sum (a row lands in the same
bucket regardless of which micro-batch carries it, so fold order is
irrelevant — a true commutative monoid), and the per-trigger report
is :func:`~whatdropsnow_etl_spark.operators.events.anomalies_from_buckets`
over the folded state: the SAME code path the batch operator runs, so
batch-folded == full-relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps).

Unlike the 168-cell seasonality state, the bucket state grows with
the day axis (the fano hour-axis trade, accepted there for the same
reason): the maintainer's state is days × types × 24 rows — compacted
counts, not events — and a retention horizon can prune old days
without touching cell math for the days retained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_floor_index, ts_micros
from ..operators.events import anomalies_from_buckets


def fold_anomaly_buckets(
    prev: DataFrame | None,
    batch: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    count_col: str = "n_events",
) -> DataFrame:
    """Fold one micro-batch into the persisted (type, day, hour,
    count) bucket state. ``prev`` is None on the first batch. NULL
    type or timestamp rows are excluded (the batch operator's
    contract); day/hour use the shared floor/pmod epoch arithmetic
    so pre-1970 rows land in the batch operator's exact buckets."""
    us = ts_micros(F.col(ts_col))
    buckets = (
        batch.select(F.col(type_col).alias("event_type"), us.alias("__us"))
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select(
            "event_type",
            epoch_floor_index(F.col("__us"), 86_400_000_000).alias("day"),
            (
                F.pmod(F.col("__us"), F.lit(86_400_000_000))
                / F.lit(3_600_000_000)
            )
            .cast("bigint")
            .alias("hour"),
        )
        .groupBy("event_type", "day", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias(count_col))
    )
    if prev is None:
        return buckets
    return (
        prev.unionByName(buckets)
        .groupBy("event_type", "day", "hour")
        .agg(F.sum(count_col).cast("bigint").alias(count_col))
    )


def anomaly_report(
    state: DataFrame,
    threshold: float = 2.0,
    count_col: str = "n_events",
) -> DataFrame:
    """Weekly-cell z-score anomalies over the folded bucket state —
    delegates to the batch operator's post-histogram half, so the
    streamed report is bit-identical to seasonal_anomalies over the
    full relation."""
    return anomalies_from_buckets(
        state, threshold=threshold, count_col=count_col
    )
