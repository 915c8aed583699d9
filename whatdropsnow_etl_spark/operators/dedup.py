"""Deduplication operators for document corpora.

- exact: hash-groupBy on normalized text (one shuffle, map-side
  partial agg).
- n-gram Jaccard: shingle explode → inverted-index self-join →
  exact Jaccard on shared-shingle pairs.

Scale (100 TB, SURVEY §6): the Jaccard self-join here carries the
shingle *string* so its DuckDB oracle twin is exactly equivalent; at
scale pass ``hash_shingles=True`` to carry only a 64-bit xxhash
through the explode/shuffle (~10× narrower shuffle rows), and gate
candidate generation with MinHash-LSH banding (r2) instead of the
full inverted index. Pairs that share no shingle never meet — the
join *is* the candidate filter; there is no all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group docs by md5(lower(trim(text))); keeper = min id.

    Reference parity: db.py upsert's "one row per key" contract,
    applied content-wise.
    """
    h = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_doc_id"),
        )
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int, hash_shingles: bool) -> DataFrame:
    sh = shingles(tokens(F.col(text_col)), k)
    out = df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
    if hash_shingles:
        out = out.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Pairs (doc_a < doc_b) with k-gram-shingle Jaccard >= threshold.

    Exact (not approximate): intersection via inverted-index
    self-join, union via per-doc distinct shingle counts.
    """
    sh = _doc_shingles(df, text_col, id_col, k, hash_shingles)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("__nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
