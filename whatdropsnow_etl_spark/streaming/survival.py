"""Streaming survival-hazard maintenance: fold per-batch per-user
(first, last) epoch bounds, ask the Kaplan-Meier risk table per
trigger.

The gauge-maintenance pattern (streaming/lifecycle.py — the same
per-user compacted state, a different report): the per-user
(first_us, last_us) bounds relation is an exact MONOID under union +
groupBy-min/max, so a foreachBatch sink folds each micro-batch's
compacted bounds into a persisted state relation — one row per user,
never raw events — and the per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.survival.hazard_from_user_bounds`
over the folded state: the SAME code path the batch operator runs, so
batch-folded == full-relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps). Late or
replayed events fold idempotently (min/max absorb them) — safe under
at-least-once delivery.

The churn gate compares against the max last_us IN THE STATE, exactly
as the batch operator compares against the relation's own max — so a
trigger's report is the risk table "as of the stream's high-water
mark", shifting as data arrives (the same moving-reference semantics
rfm_segments documents for its recency scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ts_micros
from ..operators.survival import hazard_from_user_bounds


def fold_user_bounds(
    prev: DataFrame | None,
    batch: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Fold one micro-batch into the persisted per-user (first_us,
    last_us) bounds state. ``prev`` is None on the first batch. NULL
    user or timestamp rows are excluded (the batch operator's
    contract); replays are absorbed by min/max."""
    us = ts_micros(F.col(ts_col))
    b = (
        batch.select(F.col(user_col).alias("__u"), us.alias("__us"))
        .where(F.col("__u").isNotNull() & F.col("__us").isNotNull())
        .groupBy("__u")
        .agg(
            F.min("__us").alias("first_us"),
            F.max("__us").alias("last_us"),
        )
    )
    if prev is None:
        return b
    return (
        prev.unionByName(b)
        .groupBy("__u")
        .agg(
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
    )


def survival_report(
    state: DataFrame, churn_gap_days: int = 7
) -> DataFrame:
    """Kaplan-Meier risk table over the folded bounds state —
    delegates to the batch operator's post-bounds half, so the
    streamed report is bit-identical to survival_hazard over the
    full relation."""
    return hazard_from_user_bounds(state, churn_gap_days=churn_gap_days)
