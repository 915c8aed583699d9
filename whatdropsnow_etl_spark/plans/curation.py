"""End-to-end training-data curation funnel.

The composition story: a switching user chains this engine's
operators the way the reference chains its ETL steps — here the
canonical LLM-corpus pipeline (quality gate → language gate → exact
dedup → near-dedup) as ONE declarative plan. Each stage reuses the
exact operator the standalone query exposes, so the funnel's
numbers reconcile with the per-operator queries, and the whole
chain stays in Catalyst (one logical plan; no intermediate
materialization or driver round-trips between stages).

Scale: the stages only narrow — each later, costlier stage (the
quadratic-candidate near-dedup last) sees fewer docs. The shuffles
are per-stage group-bys on content hashes; nothing global."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import ngram_jaccard_pairs
from ..operators.textops import lang_id, quality_score


def curation_funnel(
    docs: DataFrame,
    quality_min: float = 0.75,
    lang: str = "de",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Stage-by-stage survivor counts of the curation pipeline.

    Stages: all docs → quality ≥ ``quality_min`` → predicted
    language == ``lang`` → exact dedup (keep lowest doc_id per
    normalized-text hash) → greedy near-dedup (drop the higher id of
    every shingle-Jaccard ≥ ``threshold`` pair; clusters-based
    keeping is dedup_clusters' job).
    Output: (stage, n_docs), one row per stage, funnel-ordered.
    """
    ql = quality_score(docs).select("doc_id", "quality")
    enriched = lang_id(docs).join(ql, "doc_id")
    s1 = enriched.where(F.col("quality") >= quality_min)
    s2 = s1.where(F.col("pred_lang") == lang)
    w = Window.partitionBy("__gid").orderBy("doc_id")
    s3 = (
        s2.withColumn("__gid", F.md5(F.lower(F.trim(F.col("text")))))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__gid", "__rn")
    )
    pairs = ngram_jaccard_pairs(
        s3.select("doc_id", "text"), k=k, threshold=threshold, hash_shingles=True
    )
    s4 = s3.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    stages = [
        ("1_all", docs),
        ("2_quality", s1),
        ("3_lang", s2),
        ("4_exact_dedup", s3),
        ("5_near_dedup", s4),
    ]
    parts = [
        d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )
        for name, d in stages
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("stage")
