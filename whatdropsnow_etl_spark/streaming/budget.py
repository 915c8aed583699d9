"""Streaming token-budget-curve maintenance: fold per-batch score
bins, ask the cumulative budget sweep per trigger.

The gauge-maintenance pattern (streaming/fano.py, seasonality.py)
applied to the curation budget screen: the (bin, n_rows, sum_w)
histogram is an exact MONOID under union + groupBy-sum (bin
assignment is batch-independent integer quantization — a true
commutative fold), so a foreachBatch sink folds each micro-batch's
compacted bins into a persisted <= n_bins-row state relation and the
per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.classifier.budget_curve_from_bins`
— the SAME code path the batch operator runs, so batch-folded ==
full-relation EXACTLY (pytest-pinned, the streaming-twin contract).

The production read: a curation stream watches "how many tokens
survive cutoff b" drift live as a crawl lands, without re-scoring
history — the state is n_bins rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classifier import budget_curve_from_bins


def fold_score_bins(
    prev: DataFrame | None,
    batch: DataFrame,
    score_col: str,
    weight_col: str,
    n_bins: int = 10,
    scale: int = 1000000,
) -> DataFrame:
    """Fold one micro-batch into the persisted (bin, n_rows, sum_w)
    state. ``prev`` is None on the first batch. NULL score/weight
    rows are excluded and out-of-range scores clamp into the edge
    bins (the batch operator's contract)."""
    s_fp = F.round(F.col(score_col) * scale, 0).cast("long")
    per = (
        batch.select(
            s_fp.alias("__s"),
            F.col(weight_col).cast("bigint").alias("__w"),
        )
        .where(F.col("__s").isNotNull() & F.col("__w").isNotNull())
        .select(
            F.least(
                F.greatest(
                    F.expr(f"__s * {n_bins} div {scale}"),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(n_bins - 1).cast("bigint"),
            )
            .cast("bigint")
            .alias("bin"),
            "__w",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("__w").cast("bigint").alias("sum_w"),
        )
    )
    if prev is None:
        return per
    return (
        prev.unionByName(per)
        .groupBy("bin")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_w").cast("bigint").alias("sum_w"),
        )
    )


def budget_report(state: DataFrame) -> DataFrame:
    """Cumulative budget sweep over the folded bin state — delegates
    to the batch operator's post-histogram half, so the streamed
    report is bit-identical to token_budget_curve over the full
    relation."""
    return budget_curve_from_bins(state)
