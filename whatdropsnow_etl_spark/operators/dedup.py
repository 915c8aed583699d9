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
    max_docs_per_shingle: int | None = None,
) -> DataFrame:
    """Pairs (doc_a < doc_b) with k-gram-shingle Jaccard >= threshold.

    Exact (not approximate). Shape chosen for minimal passes:
    - per-doc shingle counts are a *narrow* projection on the base
      table (size of the shingle array — no explode, no shuffle),
      broadcast into the final join;
    - candidate pairs come from ONE explode → groupBy(shingle) →
      collect_list → in-memory combination expansion (JVM
      higher-order funcs), i.e. 2 shuffles total and a single
      evaluation of the shingle pipeline — vs 3 evaluations + 3
      shuffles for the naive inverted-index self-join.

    Scale guard: a shingle shared by c docs expands to C(c,2) pairs;
    ultra-frequent shingles are non-discriminative and blow up any
    exact method. ``max_docs_per_shingle`` drops hotter shingles
    (documented approximation, off by default); the 100 TB path is
    MinHash-LSH banding (r2) which bounds candidates by design.
    """
    sh = _doc_shingles(df, text_col, id_col, k, hash_shingles)

    sizes = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(shingles(tokens(F.col(text_col)), k)).cast("bigint").alias("n_shingles"),
    )

    grouped = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("__docs")
    )
    if max_docs_per_shingle is not None:
        grouped = grouped.where(F.size("__docs") <= max_docs_per_shingle)
    # all ordered pairs (docs[i], docs[j]), i < j, expanded JVM-side
    combos = F.flatten(
        F.transform(
            F.col("__docs"),
            lambda x, i: F.transform(
                F.slice(F.col("__docs"), i + 2, F.size(F.col("__docs"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    inter = (
        grouped.where(F.size("__docs") > 1)
        .select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
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
