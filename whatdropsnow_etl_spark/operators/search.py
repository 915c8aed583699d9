"""Case-insensitive search.

Reference parity: wdn_api.py:20-30 ``get_brand`` (case-insensitive
exact match) and etl.py:40 (``ilike``). Expressed as predicates that
Catalyst can push into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ilike_search(df: DataFrame, col: str, needle: str) -> DataFrame:
    """SQL ILIKE '%needle%' (substring, case-insensitive)."""
    return df.where(F.lower(F.col(col)).like(f"%{needle.lower()}%"))


def ilike_exact(df: DataFrame, col: str, value: str) -> DataFrame:
    """Case-insensitive exact match (the reference's brand lookup)."""
    return df.where(F.lower(F.col(col)) == value.lower())


def bm25_search(
    docs: DataFrame,
    terms: tuple[str, ...] = ("dup", "key", "window"),
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k full-text scoring with an odds-ratio idf — the
    lexical-retrieval baseline behind corpus search and RAG-style
    recall sets, over whitespace tokens (the corpus_vocab
    convention).

    Deviation, and why: classic BM25's idf is
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``, which simplifies to
    ``ln((2N+2)/(2df+1))``. libm ``ln`` differs by 1 ulp across
    engines (the bigram_surprisal determinism argument), so this
    operator uses the ODDS RATIO ``(2N+2)/(2df+1)`` itself —
    the same quantity without the log. Per-term ranking is
    unchanged (log is monotone); multi-term mixing weights rare
    terms more steeply than log-idf would. Every score is built
    from exact BIGINT counts by int->double conversion, one IEEE
    division per factor, one multiply, and a fixed left-to-right
    term sum — bitwise deterministic on any IEEE-754 engine, no
    libm anywhere.

    The tf saturation keeps classic k1=1.2, b=0.75 as exact
    rationals (6/5, 3/4): with dl the doc token count, Ltot the
    corpus token count and N the doc count (avgdl = Ltot/N),

        tfpart = 44*tf*Ltot / (20*tf*Ltot + 6*Ltot + 18*dl*N)

    (both sides of the classic formula multiplied by 20*Ltot).
    The BIGINT products stay exact-in-double while
    ``44*tf*Ltot < 2^53``; past that both engines round the
    int->double conversion identically (IEEE round-to-nearest), so
    determinism survives even when exactness doesn't.

    Plan shape: one map-side pass computes per-doc (dl, tf_1..tf_k)
    from a single tokenize; a one-row corpus-stats aggregate
    (N, Ltot, df_1..df_k) is broadcast back (BroadcastNestedLoopJoin
    over a single row); scoring is map-side; the cut is a
    TakeOrdered (distributed per-partition heaps, no global sort).
    Docs matching no term are filtered before the cut. At 100 TB
    nothing wider than (id, dl, k tf columns) leaves the scan.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
    )

    # A 2-arg lambda would flip F.filter into its (element, index)
    # form, so bind each term via a closure factory instead.
    def _tf(term: str) -> Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[
            _tf(t).cast("long").alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("dl").alias("__ltot"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    # Fixed left-to-right association: f0 + f1 + ... (parenthesized
    # by fold order) so the double sum is order-pinned in both twins.
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"__tf_{i}"), F.col(f"__df_{i}")
        idf = (
            (F.lit(2) * F.col("__n") + F.lit(2)).cast("double")
            / (F.lit(2) * df + F.lit(1)).cast("double")
        )
        num = (F.lit(44) * tf * F.col("__ltot")).cast("double")
        den = (
            F.lit(20) * tf * F.col("__ltot")
            + F.lit(6) * F.col("__ltot")
            + F.lit(18) * F.col("dl") * F.col("__n")
        ).cast("double")
        part = idf * (num / den)
        score = part if score is None else score + part
    return (
        scored.select(
            F.col(id_col),
            F.col("dl"),
            score.alias("score"),
        )
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: tuple[str, ...] = ("dup", "key", "window"),
    query_vec_id: int = 0,
    k_each: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid lexical+vector retrieval via reciprocal-rank fusion —
    the industry-standard RAG recall set (BM25 catches exact terms,
    the embedding side catches paraphrase; RRF combines WITHOUT
    score calibration, which is why it won: ranks are comparable
    when scores never are).

    rrf(d) = sum over lists of 1/(rrf_k + rank_d) for the lists
    containing d (Cormack et al.'s k=60 default). Both inputs are
    the repo's exact kernels — bm25_search (libm-free odds-ratio
    idf) and ann_cosine_topk (bit-exact Arrow cosine) — so the
    ranks, and therefore the fused score (two IEEE divisions and
    one add on exact integers), are engine-deterministic.

    Scale shape: each side is already a top-k_each cut (TakeOrdered
    / bounded-window kernels), so the fusion is a FULL OUTER join
    of two k-row relations — nothing corpus-sized happens here; at
    100 TB the candidate generators swap to their scale variants
    (bm25 unchanged, IVF/PQ for the vector side) with the fusion
    untouched.

    Output: (doc_id, lex_rank, vec_rank nullable bigint, rrf
    double), one row per doc in either list.
    """
    from .similarity import ann_cosine_topk

    lex = bm25_search(docs, terms, top_k=k_each, id_col=id_col)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))  # k_each-bounded
    lexr = lex.select(
        F.col(id_col).alias("__ldoc"),
        F.row_number().over(w).cast("bigint").alias("lex_rank"),
    )
    vec = ann_cosine_topk(
        embeddings.where(F.col(vec_id_col) != query_vec_id),
        embeddings.where(F.col(vec_id_col) == query_vec_id),
        id_col=vec_id_col,
        k=k_each,
    )
    vecr = vec.select(
        F.col("neighbor_id").alias("__vdoc"),
        F.col("rnk").cast("bigint").alias("vec_rank"),
    )
    fused = lexr.join(
        vecr, F.col("__ldoc") == F.col("__vdoc"), "full_outer"
    )

    def rrf_term(rank: Column) -> Column:
        return F.when(
            rank.isNotNull(),
            F.lit(1.0) / (F.lit(rrf_k) + rank).cast("double"),
        ).otherwise(F.lit(0.0))

    return fused.select(
        F.coalesce("__ldoc", "__vdoc").alias("doc_id"),
        "lex_rank",
        "vec_rank",
        (rrf_term(F.col("lex_rank")) + rrf_term(F.col("vec_rank"))).alias(
            "rrf"
        ),
    )
