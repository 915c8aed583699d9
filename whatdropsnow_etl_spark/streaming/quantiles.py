"""Structured Streaming: windowed approximate quantiles.

Latency/size distribution monitoring over an unbounded stream:
tumbling event-time windows, per-window percentile_approx. The
underlying sketch (Spark's QuantileSummaries) is MERGEABLE — partial
sketches combine map-side and across micro-batches — which is the
only reason quantiles can stream at all: exact quantiles need a
per-group sort over all data (see operators/quantiles.py for the
batch-exact twin), a sketch folds each new batch into bounded state.

Accuracy is the percentile_approx contract: rank error <= 1/accuracy
of the window's row count. The parity test compares streamed windows
against the batch-exact operator within that bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.functions.timeutil import ts_micros


def windowed_value_quantiles(
    events: DataFrame,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per (window, event_type) approximate quantiles of value cents.

    Works identically on batch input (watermark is a no-op there).
    Output: window_start_us BIGINT, event_type, n_events, one
    p{NN}_cents BIGINT per requested quantile.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    cents = F.round(F.col(value_col) * 100, 0).cast("long")

    def _label(p: float) -> str:
        # dot-free label: the old str(p)-derived scheme produced
        # 'p1.0_cents' for p=1.0, which the string-select below
        # parsed as struct access and failed at query construction
        return f"p{int(round(p * 100)):02d}_cents"

    qcols = [
        F.percentile_approx(
            "__cents", F.lit(float(p)), F.lit(accuracy)
        )
        .cast("long")
        .alias(_label(p))
        for p in ps
    ]
    return (
        df.select(
            F.window(F.col(ts_col), window_duration).alias("win"),
            "event_type",
            cents.alias("__cents"),
        )
        .groupBy("win", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), *qcols)
        .select(
            ts_micros(F.col("win.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            *[_label(p) for p in ps],
        )
    )
