"""Deterministic corpus sampling for training-data mixing.

Stratified sampling keeps data mixtures controllable: fix the strata
(here: fixed quality bands — no global sort or NTILE, which would
funnel the corpus through one partition), then take a deterministic
pseudo-random k per stratum by ordering on a content-independent
hash. Every engine and every run picks the same rows, so mixtures
are reproducible and oracle-checkable.

Scale: one shuffle on the stratum key for the per-stratum window;
strata counts are bounded (10 bands), rows within a band sort only
within their band's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import quality_expr


def stratified_sample_by_quality(
    df: DataFrame,
    k_per_band: int = 5,
    n_bands: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """k docs per quality band, chosen by md5-of-id order.

    Bands are fixed-width slices of the [0, 1] quality score
    (band = min(floor(q * n_bands), n_bands - 1)) — scale-free and
    engine-portable, unlike exact deciles which need a global rank.
    Selection order inside a band is md5(id) with id tiebreak:
    deterministic, uncorrelated with content, identical in SQL.
    """
    q = quality_expr(text_col)
    banded = df.select(
        F.col(id_col),
        F.round(q, 6).alias("quality"),
        F.least(
            F.floor(q * n_bands).cast("bigint"), F.lit(n_bands - 1)
        ).alias("band"),
    )
    w = Window.partitionBy("band").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        banded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_per_band)
        .select(id_col, "band", "quality")
    )
