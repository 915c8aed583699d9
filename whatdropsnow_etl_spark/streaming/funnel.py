"""Streaming twin of the batch curation funnel (plans/curation.py).

Maintains live survivor counts for the curation stages as documents
arrive: all → quality gate → language gate → exact dedup. Stage
flags are stateless Column expressions (identical to the batch
funnel's), so the only state is the exact-dedup hash set — one
``dropDuplicates`` entry per distinct normalized text, the minimum
any global dedup must hold.

Spark allows at most one aggregation per streaming query, so the
funnel can't take five counts from five filters. Instead each doc
EMITS one row per stage it survives (an array explode — stateless),
the exact-dedup branch contributes its rows after dropDuplicates,
and a single groupBy(stage).count() in complete mode keeps all
stage counts in one query.

The batch funnel's 5th stage (near-dedup) is deliberately absent:
shingle-Jaccard pairs need every doc joined against the corpus seen
so far — unbounded two-sided state. The supported pattern is
lambda-style: stream stages 1-4 live, run the full batch funnel
(which reconciles with these counts stage-for-stage) on the landed
corpus periodically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textops import lang_id, quality_expr


def curation_funnel_stream(
    docs: DataFrame,
    quality_min: float = 0.75,
    lang: str = "de",
    text_col: str = "text",
) -> DataFrame:
    """Live (stage, n_docs) counts over a documents stream.

    Output schema matches the batch funnel's first four stages:
    stage in ('1_all', '2_quality', '3_lang', '4_exact_dedup').
    Run with outputMode='complete'.
    """
    flags = (
        lang_id(docs, text_col)
        .withColumn("f1", quality_expr(text_col) >= quality_min)
        .withColumn("f2", F.col("f1") & (F.col("pred_lang") == lang))
        .withColumn("__gid", F.md5(F.lower(F.trim(F.col(text_col)))))
    )
    per_doc = flags.select(
        F.explode(
            F.concat(
                F.array(F.lit("1_all")),
                F.when(F.col("f1"), F.array(F.lit("2_quality"))).otherwise(
                    F.array()
                ),
                F.when(F.col("f2"), F.array(F.lit("3_lang"))).otherwise(F.array()),
            )
        ).alias("stage")
    )
    exact = (
        flags.where(F.col("f2"))
        .select("__gid")
        .dropDuplicates(["__gid"])
        .select(F.lit("4_exact_dedup").alias("stage"))
    )
    return (
        per_doc.unionByName(exact)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
