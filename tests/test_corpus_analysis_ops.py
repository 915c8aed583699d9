"""Tests for the corpus-analysis batch: windowed co-occurrence
counts, the Heaps'-law vocabulary-growth curve, keyword-in-context
search, and market-basket pair affinity.

Pin points:
- cooccurrence_pairs counts every unordered pair within the window
  exactly (hand-computed tiny corpus), including same-token pairs,
  and symmetric orders accumulate together;
- vocab_growth's bucketed first-appearance decomposition equals the
  definitionally-cumulative answer, with zero-filled empty buckets;
- kwic_search clips contexts at document edges and matches whole
  tokens only;
- market_basket's support counts each order once per pair (repeated
  part lines collapse) and lift is the exact count ratio.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    cooccurrence_pairs,
    kwic_search,
    vocab_growth,
)
from whatdropsnow_etl_spark.plans.olap import market_basket


def test_cooccurrence_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b")], "doc_id long, text string"
    )
    # window=2: doc1 pairs: (a,b)[1-2], (a,a)[1-3], (a,b)[2-3 as b,a],
    # (a,c)[3-4], (b,c)[2-4]; doc2: (b,b)
    got = {
        (r.a, r.b): r.n_cooc
        for r in cooccurrence_pairs(df, window=2, top_k=10).collect()
    }
    assert got == {
        ("a", "b"): 2,
        ("a", "a"): 1,
        ("a", "c"): 1,
        ("b", "c"): 1,
        ("b", "b"): 1,
    }


def test_cooccurrence_topk_deterministic_cut(spark):
    df = spark.createDataFrame([(1, "x y z w")], "doc_id long, text string")
    out = cooccurrence_pairs(df, window=3, top_k=2).collect()
    # all pairs have count 1 -> tie broken by (a, b) ascending
    assert [(r.a, r.b) for r in out] == [("w", "x"), ("w", "y")]


def test_vocab_growth_matches_definition(spark):
    # doc i introduces term t{i}; every doc repeats 'base'
    rows = [(i, f"base t{i // 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_growth(df, n_buckets=5).orderBy("bucket").collect()
    assert [r.bucket for r in out] == [0, 1, 2, 3, 4]
    # 30 docs x 2 tokens, 6 docs per bucket
    assert all(r.n_tokens == 12 for r in out)
    assert out[-1].cum_tokens == 60
    # bucket 0: 'base' + t0,t1 = 3 new; each later bucket: 2 new
    assert [r.n_new_terms for r in out] == [3, 2, 2, 2, 2]
    assert out[-1].cum_vocab == 11
    # definitional check: cum_vocab at bucket k == distinct terms in
    # docs of buckets 0..k
    seen = set()
    for k, r in enumerate(out):
        for i in range(30):
            if (i * 5) // 30 <= k:
                seen.update(f"base t{i // 3}".split())
        assert r.cum_vocab == len(seen)


def test_vocab_growth_zero_fills_empty_buckets(spark):
    # ids 0 and 99 only: middle buckets are empty but still emitted
    df = spark.createDataFrame(
        [(0, "a b"), (99, "c")], "doc_id long, text string"
    )
    out = vocab_growth(df, n_buckets=4).orderBy("bucket").collect()
    assert [r.bucket for r in out] == [0, 1, 2, 3]
    assert [r.n_tokens for r in out] == [2, 0, 0, 1]
    assert [r.cum_vocab for r in out] == [2, 2, 2, 3]


def test_kwic_edges_and_whole_token(spark):
    df = spark.createDataFrame(
        [
            (1, "spark runs fast"),  # hit at pos 1: no left context
            (2, "we love spark"),  # hit at pos 3: no right context
            (3, "sparkly things here"),  # substring must NOT match
            (4, "a b c spark d e f"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in kwic_search(df, "spark", width=2).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].pos == 1 and out[1].left_ctx == ""
    assert out[1].right_ctx == "runs fast"
    assert out[2].pos == 3 and out[2].right_ctx == ""
    assert out[2].left_ctx == "we love"
    assert out[4].left_ctx == "b c" and out[4].right_ctx == "d e"


def test_market_basket_support_and_lift(spark):
    # orders: 1:{A,B}, 2:{A,B}, 3:{A,C}, 4:{B} and a duplicate A line
    # in order 1 that must not inflate support
    rows = [
        (1, 10), (1, 10), (1, 20),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 20),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.pk1, r.pk2): r for r in market_basket(df, top_k=10).collect()}
    ab = out[(10, 20)]
    assert ab.n_both == 2 and ab.n_pk1 == 3 and ab.n_pk2 == 3
    # lift = n_both * N / (n_a * n_b) = 2*4/9
    assert math.isclose(ab.lift, 8 / 9, rel_tol=1e-12)
    ac = out[(10, 30)]
    assert ac.n_both == 1 and ac.n_pk2 == 1
    assert math.isclose(ac.lift, 4 / 3, rel_tol=1e-12)
    assert (20, 30) not in out


def test_triangle_count_hand_and_bruteforce(spark):
    from itertools import combinations

    from whatdropsnow_etl_spark.operators import triangle_count

    # K4 on {1..4} (4 triangles, each node in 3) + path 5-6-7 (none)
    # + a duplicate and a reversed edge that must not double-count
    edges = (
        list(combinations([1, 2, 3, 4], 2))
        + [(5, 6), (6, 7)]
        + [(1, 2), (3, 1)]
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.n_tri for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # random graph vs brute force
    import random

    rng = random.Random(11)
    nodes = list(range(25))
    redges = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(80)
    }
    rdf = spark.createDataFrame(
        sorted(redges), "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.n_tri for r in triangle_count(rdf).collect()}
    ref: dict[int, int] = {}
    es = set(redges)
    for x, y, z in combinations(nodes, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for v in (x, y, z):
                ref[v] = ref.get(v, 0) + 1
    assert got == ref


def test_nb_classify_disjoint_vocab_hand_case(spark):
    """Two classes with disjoint vocabularies: every held-out doc must
    classify to its own class, and the winning score decomposes as
    prior + sum of per-token whole-bit surprisals (hand-checked)."""
    from whatdropsnow_etl_spark.operators import nb_classify

    rows = (
        # class a docs: ids 1..8 train (id%10!=0 means all but 10,20)
        [(i, "alpha beta", "a") for i in range(1, 9)]
        + [(10, "alpha beta", "a")]          # held (10 % 10 == 0)
        + [(100 + i, "gamma delta", "b") for i in range(1, 9)]
        + [(110, "gamma delta", "b")]        # held
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in nb_classify(df).collect()}
    assert set(out) == {10, 110}
    assert out[10]["predicted"] == "a" and out[10]["hit"] == 1
    assert out[110]["predicted"] == "b" and out[110]["hit"] == 1
    # hand score for doc 10 under class a: V=4 distinct train tokens,
    # total_a=16 occurrences, each token seen 8x ->
    # bits = floor(log2((16+4)/(8+1))) = floor(log2(20/9)) = 1 per
    # token, prior = floor(log2(16/8)) = 1 -> score = 2*1 + 1 = 3
    assert out[10]["score_bits"] == 3 and out[10]["n_tokens"] == 2


def test_nb_classify_partitioning_invariant(spark):
    """Whole-bit integer scoring is exact, so the classification is
    bit-identical under any repartitioning of the input."""
    from whatdropsnow_etl_spark.operators import nb_classify
    from whatdropsnow_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple, nb_classify(docs.repartition(1)).collect()))
    b = sorted(map(tuple, nb_classify(docs.repartition(13)).collect()))
    assert a == b
