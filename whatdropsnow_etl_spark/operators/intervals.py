"""Interval-overlap (range) join, bucketized for scale.

Spark has no native interval join: an inequality-only join pair
falls back to BroadcastNestedLoop/Cartesian. The standard scale
trick is to quantize time into fixed buckets no smaller than the
interval length, attach an EQUALITY key — (partition key, bucket) —
to both sides, and re-check the exact range predicate after the
hash join. Each probe row lives in exactly one bucket and each
interval is replicated to every bucket it covers, so a qualifying
(row, interval) pair meets exactly once: no dedup pass needed, and
the join is an ordinary shuffled/broadcast hash join that AQE can
plan like any other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.functions.timeutil import ts_micros


def interval_overlap_count(
    events: DataFrame,
    trigger: Column,
    window_s: int = 14_400,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per event: how many trigger windows of the same key cover it.

    Trigger rows open a half-open interval ``[ts, ts + window_s)``;
    every event of the same ``key_col`` falling inside at least one
    window is returned with its overlap count (a trigger event
    counts its own window). Output: (``id_col``, n_windows BIGINT).
    """
    bucket_us = F.lit(int(window_s) * 1_000_000)
    ev = events.select(
        id_col,
        key_col,
        ts_micros(F.col(ts_col)).alias("__us"),
    ).withColumn("__bucket", F.floor(F.col("__us") / bucket_us))

    win = (
        events.where(trigger)
        .select(
            F.col(key_col).alias("__wkey"),
            ts_micros(F.col(ts_col)).alias("__ws"),
            (ts_micros(F.col(ts_col)) + bucket_us).alias("__we"),
        )
        # window spans at most 2 buckets (len == bucket size); the
        # half-open end lands in bucket floor((end-1)/bucket)
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__ws") / bucket_us),
                    F.floor((F.col("__we") - 1) / bucket_us),
                )
            ),
        )
    )

    joined = ev.join(
        win,
        (ev[key_col] == win["__wkey"])
        & (ev["__bucket"] == win["__bucket"])
        & (ev["__us"] >= win["__ws"])
        & (ev["__us"] < win["__we"]),
    )
    return joined.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
