"""Structured Streaming: watermarked tumbling-window aggregation.

The streaming twin of plans.olap.tumbling_window_agg — same output
schema (hour_start_us BIGINT, event_type, n_events, sum_value), so
a batch backfill and the live stream are interchangeable downstream.

Scale: stateful window aggregation partitions state by (window,
event_type) across executors; the watermark bounds state size (late
rows beyond it are dropped), which is what keeps an always-on
100 TB/day stream's state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

from ..functions.money import dec


def windowed_event_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type over a (possibly
    streaming) events DataFrame. Works identically on batch input
    (watermark is a no-op there)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(value_col)).cast("double").alias("sum_value"),
        )
        .select(
            ts_micros(F.col("win.start")).alias("hour_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
