"""Invariants for dedup / similarity / text operators (sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    ann_cosine_topk,
    dedup_exact,
    lang_id_confusion,
    ngram_jaccard_pairs,
    quality_score,
    token_count,
)


def test_dedup_exact_partitions_corpus(tables):
    docs = tables["documents"]
    out = dedup_exact(docs)
    assert out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    # keeper ids are real doc ids
    assert out.join(docs, out.keeper_doc_id == docs.doc_id, "left_anti").count() == 0


def test_jaccard_pairs_valid(tables):
    pairs = ngram_jaccard_pairs(tables["documents"], k=3, threshold=0.3)
    rows = pairs.collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
    assert all(0.3 <= r["jaccard"] <= 1.0 for r in rows)
    # hashing shingles must find the identical pair set (64-bit
    # collisions are ~impossible at this scale)
    hashed = ngram_jaccard_pairs(
        tables["documents"], k=3, threshold=0.3, hash_shingles=True
    )
    a = {(r["doc_a"], r["doc_b"]) for r in rows}
    b = {(r["doc_a"], r["doc_b"]) for r in hashed.collect()}
    assert a == b


def test_ann_topk_shape_and_selfless(tables):
    emb = tables["embeddings"]
    corpus = emb.where(F.col("vec_id") >= 10)
    queries = emb.where(F.col("vec_id") < 10)
    out = ann_cosine_topk(corpus, queries, k=5)
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)
    assert out.where((F.col("cosine") < -1.000001) | (F.col("cosine") > 1.000001)).count() == 0
    # rank 1 has the max cosine within its query
    mx = out.groupBy("query_id").agg(F.max("cosine").alias("mx"))
    r1 = out.where(F.col("rnk") == 1).join(mx, "query_id")
    assert r1.where(F.col("cosine") != F.col("mx")).count() == 0


def test_lang_id_covers_all_docs(tables):
    out = lang_id_confusion(tables["documents"])
    assert out.agg(F.sum("n_docs")).collect()[0][0] == tables["documents"].count()


def test_quality_score_ranges(tables):
    out = quality_score(tables["documents"])
    bad = out.where(
        (F.col("stop_ratio") < 0) | (F.col("stop_ratio") > 1)
        | (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
        | (F.col("quality") < 0) | (F.col("quality") > 1)
    )
    assert bad.count() == 0
    assert out.count() == tables["documents"].count()


def test_token_count_consistency(tables):
    out = token_count(tables["documents"])
    # corpus is plain lowercase words: BPE-ish tokens == ws tokens
    joined = out.join(tables["documents"], "doc_id")
    assert out.where(F.col("n_ws_tokens") <= 0).count() == 0
    assert joined.where(F.col("n_bpe_tokens") < F.col("n_ws_tokens")).count() == 0
