"""Streaming growth-accounting maintenance: fold per-batch (user,
day) activity, ask the lifecycle table per trigger.

The sketch-maintenance pattern (streaming/ks_drift.py,
streaming/fano.py) applied to growth accounting: the DISTINCT
(user, day) activity relation is an exact MONOID under union +
distinct, so a foreachBatch sink folds each micro-batch's compacted
activity into a persisted state relation — O(users × active days),
never raw events — and the per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.events.lifecycle_from_activity`
over the folded state: the SAME code path the batch operator runs,
so union-over-batches == full relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps). Late
or replayed events fold idempotently (distinct absorbs them) — the
property that makes the state safe under at-least-once delivery.

At 100 TB the state grows one row per (user, active day); a
retention window (drop days older than the report horizon) bounds
it, trading only the new-vs-resurrected distinction for users whose
whole history ages out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import lifecycle_from_activity


def fold_activity(
    prev: DataFrame | None,
    batch: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Fold one micro-batch into the persisted DISTINCT (user_id,
    day) activity state. ``prev`` is None on the first batch. NULL
    user or timestamp rows are excluded (the batch operator's
    contract); replays are absorbed by the distinct."""
    a = (
        batch.select(
            F.col(user_col).alias("user_id"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .where(F.col("user_id").isNotNull() & F.col("day").isNotNull())
        .distinct()
    )
    if prev is None:
        return a
    return prev.unionByName(a).distinct()


def lifecycle_report(state: DataFrame) -> DataFrame:
    """Growth accounting over the folded activity state — delegates
    to the batch operator's post-activity half."""
    return lifecycle_from_activity(state)
