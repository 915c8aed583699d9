"""Streaming calibration maintenance: fold batch score/label
histograms, ask the exact reliability diagram + ECE per trigger.

The sketch-maintenance pattern (streaming/auc.py, fano.py) applied
to the calibration half of classifier eval: the per-(quantized
score) positive-count/score-sum histogram is an exact MONOID under
union + groupBy-sum, so a foreachBatch sink folds each micro-batch's
compacted histogram into a persisted state relation — O(distinct
quantized scores), never raw history — and the per-trigger report
re-bins the folded state through the SAME
:func:`~whatdropsnow_etl_spark.operators.classifier.calibration_bins`
arithmetic (state rows ARE (score_fp, y-sum, count) aggregates whose
re-expansion is exact: a bin's n/n_pos/Σs decompose over score_fp
grain). Batch-folded == full-relation equality is pytest-pinned.
This is the live "do the classifier's probabilities still mean what
they claim on fresh traffic" gauge next to streaming/auc.py's
ranking alarm — AUC can hold while calibration drifts (score
inflation), which is exactly the failure a threshold-gated curation
pipeline must catch.

State keeps the SCORE grain (not the bin grain) so ``n_bins`` can be
changed at report time without refolding history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_calibration_histogram(
    prev: DataFrame | None,
    batch: DataFrame,
    score_col: str,
    label_col: str,
    scale: int = 1000000,
) -> DataFrame:
    """Fold one micro-batch into the persisted (__s, __n, __p) score
    histogram state (quantized score, row count, positive count).
    ``prev`` is None on the first batch. NULL scores and labels
    outside {0, 1} are excluded (the batch operator's contract)."""
    h = (
        batch.select(
            F.round(F.col(score_col) * scale, 0).cast("long").alias("__s"),
            F.col(label_col).cast("bigint").alias("__y"),
        )
        .where(F.col("__s").isNotNull() & F.col("__y").isin(0, 1))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum("__y").cast("bigint").alias("__p"),
        )
    )
    if prev is None:
        return h
    return (
        prev.unionByName(h)
        .groupBy("__s")
        .agg(
            F.sum("__n").cast("bigint").alias("__n"),
            F.sum("__p").cast("bigint").alias("__p"),
        )
    )


def calibration_report(
    state: DataFrame, n_bins: int = 10, scale: int = 1000000
) -> DataFrame:
    """Exact reliability diagram + ECE over the folded score
    histogram — the batch operator's arithmetic applied to the
    score-grain state: each state row expands to (bin, n, n_pos,
    Σs = __s·__n) partials, which sum exactly because quantization
    already happened at fold time."""
    dec = "decimal(38,0)"
    per_bin = (
        state.select(
            F.least(
                F.greatest(
                    F.expr(f"__s * {n_bins} div {scale}"),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(n_bins - 1).cast("bigint"),
            )
            .cast("bigint")
            .alias("bin"),
            "__s",
            "__n",
            "__p",
        )
        .groupBy("bin")
        .agg(
            F.sum("__n").cast("bigint").alias("n"),
            F.sum("__p").cast("bigint").alias("n_pos"),
            F.sum(F.col("__s").cast(dec) * F.col("__n").cast(dec))
            .cast(dec)
            .alias("__ss"),
        )
    )
    gap_num = F.abs(
        F.col("n_pos").cast(dec) * scale - F.col("__ss")
    ).cast(dec)
    binned = per_bin.select(
        "bin", "n", "n_pos", "__ss", gap_num.alias("__gap_num")
    )
    tot = binned.agg(
        F.sum(F.col("n").cast(dec)).cast(dec).alias("__N"),
        F.sum("__gap_num").cast(dec).alias("__ece_num"),
    )
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        F.col("__ss").cast("string").alias("sum_score_fp"),
        F.round(
            F.col("__ss").cast("double")
            / (F.col("n").cast("double") * float(scale)),
            6,
        ).alias("mean_score"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("pos_rate"),
        F.round(
            F.col("__gap_num").cast("double")
            / (F.col("n").cast("double") * float(scale)),
            6,
        ).alias("gap"),
        F.col("__ece_num").cast("string").alias("ece_num"),
        F.round(
            F.col("__ece_num").cast("double")
            / (F.col("__N").cast("double") * float(scale)),
            6,
        ).alias("ece"),
    )
