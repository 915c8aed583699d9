"""Streaming weekly-seasonality maintenance: fold per-batch
(type, dow, hour) cells, ask shares + lift per trigger.

The gauge-maintenance pattern (streaming/fano.py — the same
histogram fold at a different grain): the (type, dow, hour, count)
cell relation is an exact MONOID under union + groupBy-sum, so a
foreachBatch sink folds each micro-batch's compacted cells into a
persisted state relation (<= types × 168 rows — strictly bounded,
unlike fano's hour axis it never grows with time), and the
per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.events.seasonality_from_cells`
over the folded state: the SAME code path the batch operator runs,
so batch-folded == full-relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps).

Cell assignment is the batch operator's pure integer epoch
arithmetic (UTC), so a row lands in the same cell regardless of
which micro-batch carries it — fold order is irrelevant (a TRUE
commutative monoid, unlike streaming/interevent.py's ordered
segment fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_day_cell, ts_micros
from ..operators.events import seasonality_from_cells


def fold_seasonality_cells(
    prev: DataFrame | None,
    batch: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    count_col: str = "n_events",
) -> DataFrame:
    """Fold one micro-batch into the persisted (type, dow, hour,
    count) cell state. ``prev`` is None on the first batch. NULL
    type or timestamp rows are excluded (the batch operator's
    contract)."""
    us = ts_micros(F.col(ts_col))
    dow, hour = epoch_day_cell(F.col("__us"))
    cells = (
        batch.select(F.col(type_col).alias("event_type"), us.alias("__us"))
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select("event_type", dow.alias("dow"), hour.alias("hour"))
        .groupBy("event_type", "dow", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias(count_col))
    )
    if prev is None:
        return cells
    return (
        prev.unionByName(cells)
        .groupBy("event_type", "dow", "hour")
        .agg(F.sum(count_col).cast("bigint").alias(count_col))
    )


def seasonality_report(
    state: DataFrame, count_col: str = "n_events"
) -> DataFrame:
    """Shares + lift over the folded cell state — delegates to the
    batch operator's post-histogram half, so the streamed report is
    bit-identical to weekly_seasonality over the full relation."""
    return seasonality_from_cells(state, count_col=count_col)
