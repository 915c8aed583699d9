"""Streaming ranking-quality maintenance: fold batch score
histograms, ask the exact ROC-AUC per trigger.

The sketch-maintenance pattern (streaming/fano.py, ks_drift.py)
applied to classifier evaluation: the per-(group, quantized-score)
positive/negative count histogram is an exact MONOID under union +
groupBy-sum, so a foreachBatch sink folds each micro-batch's
compacted histogram into a persisted state relation — O(groups ×
distinct scores), never raw history — and the per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.classifier.auc_from_histogram`
over the folded state: the SAME code path the batch operator runs,
so union-over-batches == full relation EXACTLY (pytest-pinned, the
streaming-twin contract every incremental module here keeps). This
is the live "is the quality classifier still ranking well on fresh
traffic" gauge a curation pipeline runs next to ks_drift's
distribution alarm.

At 100 TB the state grows one row per (group, distinct quantized
score) — bounded by ``scale`` per group — and each fold is one
map-combined aggregate plus a state-sized shuffle; the report reads
only the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classifier import auc_from_histogram


def fold_score_histogram(
    prev: DataFrame | None,
    batch: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    scale: int = 1000000,
) -> DataFrame:
    """Fold one micro-batch into the persisted (__g, __s, __p, __n)
    score histogram state. ``prev`` is None on the first batch.
    NULL scores/groups and labels outside {0, 1} are excluded (the
    batch operator's contract)."""
    g = F.col(group_col) if group_col is not None else F.lit("all")
    h = (
        batch.select(
            g.alias("__g"),
            F.round(F.col(score_col) * scale, 0).cast("long").alias("__s"),
            F.col(label_col).cast("bigint").alias("__y"),
        )
        .where(
            F.col("__g").isNotNull()
            & F.col("__s").isNotNull()
            & F.col("__y").isin(0, 1)
        )
        .groupBy("__g", "__s")
        .agg(
            F.sum("__y").cast("bigint").alias("__p"),
            F.sum(1 - F.col("__y")).cast("bigint").alias("__n"),
        )
    )
    if prev is None:
        return h
    return (
        prev.unionByName(h)
        .groupBy("__g", "__s")
        .agg(
            F.sum("__p").cast("bigint").alias("__p"),
            F.sum("__n").cast("bigint").alias("__n"),
        )
    )


def auc_report(
    state: DataFrame, group_col: str | None = None
) -> DataFrame:
    """Exact ROC-AUC over the folded histogram state — delegates to
    the batch operator's post-histogram half."""
    return auc_from_histogram(state, group_col=group_col)
