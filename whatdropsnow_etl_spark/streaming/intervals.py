"""Structured Streaming: watermarked stream-stream interval join.

Streaming twin of ``operators.intervals.interval_overlap_count``'s
join stage. Batch bucketizes time onto equality keys because a batch
range join would otherwise nested-loop; streaming already hash-joins
on the equality key (user) and uses the TIME-RANGE predicate itself
to bound join state: with both sides watermarked and the condition
``t.ts <= p.ts < t.ts + W``, Spark derives how long each side's rows
can still match and evicts state past watermark + W. That eviction
is what keeps an always-on stream's state finite — the streaming
analogue of the batch operator's bucket locality.

The operator emits the matched PAIR stream (probe id, window start);
the per-probe overlap COUNT is a downstream aggregation. Emitting
pairs keeps the operator in plain append mode — counts would chain a
second stateful operator whose append-mode results only finalize
when the watermark passes them, which an at-rest comparison test
would read as missing rows. The batch twin's counts are reproduced
exactly by COUNT(*) GROUP BY id over this stream's sink (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.functions.timeutil import ts_micros


def streaming_interval_pairs(
    events: DataFrame,
    trigger: Column,
    window_s: int = 14_400,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """(probe event, trigger window) matches over a streaming self-join.

    Trigger rows open ``[ts, ts + window_s)``; every event of the
    same key inside a window emits one row (event_id, window_start_us
    BIGINT). Works identically on a batch DataFrame (watermarks are
    no-ops there), which is how the parity test pins it to the
    bucketized batch operator.
    """
    probes = events.select(
        F.col(id_col).alias("p_id"),
        F.col(key_col).alias("p_key"),
        F.col(ts_col).alias("p_ts"),
    )
    trigs = events.where(trigger).select(
        F.col(key_col).alias("t_key"),
        F.col(ts_col).alias("t_ts"),
    )
    if events.isStreaming:
        probes = probes.withWatermark("p_ts", watermark)
        trigs = trigs.withWatermark("t_ts", watermark)
    cond = (
        (F.col("p_key") == F.col("t_key"))
        & (F.col("p_ts") >= F.col("t_ts"))
        & (
            F.col("p_ts")
            < F.col("t_ts") + F.make_interval(secs=F.lit(float(window_s)))
        )
    )
    return probes.join(trigs, cond).select(
        F.col("p_id").alias(id_col),
        ts_micros("t_ts").alias("window_start_us"),
    )
