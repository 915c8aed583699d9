"""Exact all-pairs sparse cosine similarity self-join (AllPairs).

The exact-sparse member of the near-dup family: MinHash/SimHash are
probabilistic, embedding_dedup needs a dense model — this finds EVERY
document pair whose bag-of-words cosine clears a threshold, exactly.

Two regimes, same exact result (both pure BIGINT, no floats, no
libm):

* **sparse** — Bayardo/Ma/Srikant prefix filtering ("Scaling Up All
  Pairs Similarity Search", WWW'07): per-doc suffix-mass bound over a
  global (df ASC, term ASC) term order decides which postings enter
  the inverted index; candidates come from a prefix⋈full term join,
  verification is a per-candidate map fold. Right when the
  vocabulary is large (real corpora): the stopword-tier postings
  that make the naive self-join quadratic sort last and fall out of
  every prefix first.
* **dense** — when the measured vocabulary is small (synthetic /
  categorical corpora, where EVERY pair shares rare terms and no
  candidate filter can prune: measured on the 31-term test corpus,
  prefix + suffix-product bounds left 11.8M of 12.5M pairs alive),
  candidate filtering is provably useless and the cost floor is
  N²/2 exact dots. The cheapest way to pay it is the blocked-GEMM
  tile kernel (same shape as embedding_dedup's): docs become dense
  int64 tf vectors over the collected vocab, blocks join pairwise,
  and one numpy integer matmul per tile scores a million pairs at a
  time — no per-pair rows ever materialize for non-qualifying pairs.

Reference behavior: the reference's near-duplicate reports are
pairwise similarity relations over a document table (same shape as
its shingle/Jaccard outputs); this re-expresses the exact-cosine
variant Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def sparse_cosine_join(
    df: DataFrame,
    threshold: tuple[int, int] = (9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "auto",
    dense_vocab_cap: int = 4096,
    block_size: int = 1024,
) -> DataFrame:
    """All pairs (a < b) with tf-vector cosine >= num/den, exactly.

    The guard is pure BIGINT — ``dot² · den² >= num² · |a|² · |b|²``
    (squares both sides of ``dot / (|a||b|) >= num/den``; dot >= 0 so
    squaring preserves order) — no sqrt, no doubles, bitwise equal in
    any engine. Exactness contract: per-doc ``Σtf²`` <= ~10⁸ and
    ``den`` <= ~30 keep every product inside int64 (any chunked
    corpus qualifies; a doc needs ~10⁴ repeats of one token to break
    it).

    ``mode='auto'`` counts the vocabulary first (one small job —
    the ``nblocks`` caveat of ``_allpairs_blocked`` applies) and
    takes the dense tile path when it fits ``dense_vocab_cap``,
    else the sparse prefix-filter path. Both paths emit identical
    rows; pick explicitly with ``mode='sparse'|'dense'``.

    Output: (doc_a, doc_b, dot, na2, nb2), all BIGINT, doc_a < doc_b.
    """
    num, den = threshold
    if num <= 0 or den <= 0:
        raise ValueError("threshold must be a positive fraction")

    posts = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(tokens(text_col)).alias("__term"),
        )
        .where(F.col("__term") != "")
        .groupBy("__doc", "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    # the dense tile kernel materializes doc ids as int64 numpy
    # arrays (and declares a bigint output schema): non-integral id
    # columns must take the sparse path — auto falls back silently,
    # an explicit dense ask fails loudly instead of crashing inside
    # the executor with a numpy conversion error
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_integral = isinstance(
        df.schema[id_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    if mode == "dense" and not id_integral:
        raise ValueError(
            f"mode='dense' requires an integral id column; "
            f"{id_col!r} is {df.schema[id_col].dataType.simpleString()}"
            " — use mode='sparse'"
        )
    if mode == "auto" and not id_integral:
        mode = "sparse"
    if mode in ("auto", "dense"):
        # these paths run 3-4 separate jobs over the postings (vocab
        # probe, vocab collect, doc count, the tile job) — pin the
        # lineage once instead of re-tokenizing the corpus per job
        # (the pair_pagerank lesson: loop-invariant inputs get
        # localCheckpoint'ed)
        posts = posts.localCheckpoint(eager=True)
    if mode == "auto":
        nvocab = posts.select("__term").distinct().limit(dense_vocab_cap + 1).count()
        mode = "dense" if nvocab <= dense_vocab_cap else "sparse"
    if mode == "dense":
        return _dense_tiles(posts, num, den, block_size)
    if mode != "sparse":
        raise ValueError(f"unknown mode {mode!r}")
    # sparse: a single multi-stage query — Spark's ReuseExchange
    # dedupes the repeated posts subplan inside it, no pin needed
    return _sparse_prefix(posts, num, den)


def _dense_tiles(
    posts: DataFrame, num: int, den: int, block_size: int
) -> DataFrame:
    """Small-vocab regime: dense int64 tf vectors + blocked integer
    GEMM tiles (the embedding_dedup tile shape, integer edition).

    Vocab is collected to the driver (bounded by dense_vocab_cap,
    a few KB) and becomes a literal array; each doc's vector is a
    map-side transform lookup — one groupBy(doc) shuffle total.
    Blocks of ``block_size`` docs join pairwise (B(B+1)/2 tiles) and
    each tile runs ONE numpy int64 matmul — exact, no rounding
    anywhere — then filters by the integer guard before any pair row
    exists. Shuffle is O(N·|V|·B); at 100 TB raise block_size so B
    stays in the low hundreds.
    """
    import pandas as pd

    vocab = sorted(
        r["__term"] for r in posts.select("__term").distinct().collect()
    )
    vocab_arr = F.array(*[F.lit(t) for t in vocab])
    vecs = (
        posts.groupBy("__doc")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__term", "__tf"))
            ).alias("__m")
        )
        .select(
            "__doc",
            F.transform(
                vocab_arr,
                lambda t: F.coalesce(
                    F.element_at(F.col("__m"), t), F.lit(0).cast("long")
                ),
            ).alias("__v"),
        )
    )
    nblocks = max(1, -(-posts.select("__doc").distinct().count() // block_size))
    blocks = vecs.groupBy(
        (F.abs(F.hash("__doc")) % nblocks).alias("b")
    ).agg(F.collect_list(F.struct("__doc", "__v")).alias("items"))
    # Tile assembly by EXPLODE + one (b1, b2)-keyed aggregation, not a
    # `b1 <= b2` theta self-join: the theta join planned as
    # BroadcastNestedLoopJoin over a BroadcastExchange of the ENTIRE
    # blocked vector set — the whole corpus on the driver and every
    # executor, OOM by construction at 100 TB — and Catalyst computed
    # the whole vecs pipeline TWICE for the two join branches (r11
    # plan ops 1-8 vs 9-17). Here each block row emits its payload
    # once per tile it participates in (as the b1 side for tiles
    # (b, b..B-1), as the b2 side for tiles (0..b, b)), and one
    # hash-partitioned groupBy(b1, b2) assembles the tile — ONE
    # subplan, no broadcast, no join, O(N·|V|·B) shuffled bytes
    # spread over B(B+1)/2 keys (guide §3.1/§2.4). Exactly one row
    # per (tile, role) exists, so the ignorenulls-first aggregates
    # are deterministic.
    last = F.lit(nblocks - 1)
    fanout = blocks.select(
        "items",
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.col("b"), last),
                    lambda b2: F.struct(
                        F.col("b").alias("b1"),
                        b2.alias("b2"),
                        F.lit(1).alias("role"),
                    ),
                ),
                F.transform(
                    F.sequence(F.lit(0), F.col("b")),
                    lambda b1: F.struct(
                        b1.alias("b1"),
                        F.col("b").alias("b2"),
                        F.lit(2).alias("role"),
                    ),
                ),
            )
        ).alias("t"),
    )
    tiles = (
        fanout.select(
            F.col("t.b1").alias("b1"),
            F.col("t.b2").alias("b2"),
            F.col("t.role").alias("role"),
            "items",
        )
        .groupBy("b1", "b2")
        .agg(
            F.first(
                F.when(F.col("role") == 1, F.col("items")), ignorenulls=True
            ).alias("items1"),
            F.first(
                F.when(F.col("role") == 2, F.col("items")), ignorenulls=True
            ).alias("items2"),
        )
    )
    num2, den2 = num * num, den * den

    def score(it):
        import numpy as np

        for batch in it:
            out = {"doc_a": [], "doc_b": [], "dot": [], "na2": [], "nb2": []}
            for _, row in batch.iterrows():
                ia = np.array([x["__doc"] for x in row["items1"]], dtype=np.int64)
                ib = np.array([x["__doc"] for x in row["items2"]], dtype=np.int64)
                A = np.stack([x["__v"] for x in row["items1"]]).astype(np.int64)
                B = np.stack([x["__v"] for x in row["items2"]]).astype(np.int64)
                dot = A @ B.T  # int64 exact under the Σtf² contract
                na2 = np.einsum("ij,ij->i", A, A)
                nb2 = np.einsum("ij,ij->i", B, B)
                keep = dot * dot * den2 >= num2 * np.outer(na2, nb2)
                if row["b1"] == row["b2"]:
                    # diagonal tile: each unordered pair appears at
                    # (i,j) and (j,i); keep one, drop self-pairs
                    keep &= ia[:, None] < ib[None, :]
                ii, jj = np.nonzero(keep)
                a_first = ia[ii] < ib[jj]
                out["doc_a"].append(np.where(a_first, ia[ii], ib[jj]))
                out["doc_b"].append(np.where(a_first, ib[jj], ia[ii]))
                out["dot"].append(dot[ii, jj])
                out["na2"].append(np.where(a_first, na2[ii], nb2[jj]))
                out["nb2"].append(np.where(a_first, nb2[jj], na2[ii]))
            yield pd.DataFrame(
                {
                    k: (np.concatenate(v) if v else np.array([], dtype=np.int64))
                    for k, v in out.items()
                }
            )

    return tiles.mapInPandas(
        score,
        schema="doc_a bigint, doc_b bigint, dot bigint, na2 bigint, nb2 bigint",
    )


def _sparse_prefix(posts: DataFrame, num: int, den: int) -> DataFrame:
    """Large-vocab regime: prefix-filtered inverted-index join.

    Each doc's terms are ordered by (df ASC, term ASC) — rarest
    first — and a per-doc window cumsum running from the COMMON end
    computes the suffix mass ``ss(i) = Σ_{j>=i} tf²``. Term i is
    indexed iff ``ss(i)·den² >= num²·|a|²``: if a pair's first shared
    term (in the global order) were unindexed in a, Cauchy-Schwarz
    over a's suffix gives ``dot² <= ss(i)·|b|² < t²·|a|²·|b|²`` —
    below threshold. Joining PREFIX postings against FULL postings on
    term (both directions, then pair-distinct) therefore yields a
    superset of all qualifying pairs while skipping the stopword-tier
    postings entirely. A second exact prune drops join rows where
    even ``ss_a(i)·ss_b(i)`` (both suffixes) can't reach the
    threshold. Verification joins the per-doc term→tf maps and folds
    an exact dot per surviving candidate — work bounded by candidate
    count, not corpus size.
    """
    norms = posts.groupBy("__doc").agg(
        F.sum(F.col("__tf") * F.col("__tf")).alias("__n2")
    )
    dfreq = posts.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    w = (
        Window.partitionBy("__doc")
        .orderBy(F.desc("__df"), F.desc("__term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        posts.join(dfreq, "__term")
        .withColumn("__ss", F.sum(F.col("__tf") * F.col("__tf")).over(w))
        .join(norms, "__doc")
    )
    num2, den2 = num * num, den * den
    prefix = ranked.where(
        F.col("__ss") * F.lit(den2) >= F.lit(num2) * F.col("__n2")
    ).select("__term", "__doc", "__ss", "__n2")

    p2 = prefix.select(
        "__term",
        F.col("__doc").alias("__d2"),
        F.col("__ss").alias("__ss2"),
        F.col("__n2").alias("__n22"),
    )
    # prefix ⋈ prefix is exact here because the order is GLOBAL: the
    # first shared term of a qualifying pair is the same term in both
    # docs' orders, hence indexed in both (the single-sided argument
    # applied twice). The row-level suffix-product prune is safe for
    # the same reason: ss is non-increasing along the order, so the
    # first shared term maximizes ss_a·ss_b; if no shared row passes,
    # the pair's dot² <= max(ss_a·ss_b) < t²·|a|²·|b|².
    cands = (
        prefix.join(p2, "__term")
        .where(
            (F.col("__doc") < F.col("__d2"))
            & (
                F.col("__ss") * F.col("__ss2") * F.lit(den2)
                >= F.lit(num2) * F.col("__n2") * F.col("__n22")
            )
        )
        .select(F.col("__doc").alias("doc_a"), F.col("__d2").alias("doc_b"))
        .distinct()
    )

    vecs = (
        posts.groupBy("__doc")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__term", "__tf"))
            ).alias("__vec")
        )
        .join(norms, "__doc")
    )
    va = vecs.select(
        F.col("__doc").alias("doc_a"),
        F.col("__vec").alias("__va"),
        F.col("__n2").alias("na2"),
    )
    vb = vecs.select(
        F.col("__doc").alias("doc_b"),
        F.col("__vec").alias("__vb"),
        F.col("__n2").alias("nb2"),
    )
    scored = (
        cands.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn(
            "dot",
            F.aggregate(
                F.map_keys(F.col("__va")),
                F.lit(0).cast("long"),
                lambda acc, k: acc
                + F.element_at(F.col("__va"), k)
                * F.coalesce(
                    F.element_at(F.col("__vb"), k), F.lit(0).cast("long")
                ),
            ),
        )
    )
    return scored.where(
        F.col("dot") * F.col("dot") * F.lit(den2)
        >= F.lit(num2) * F.col("na2") * F.col("nb2")
    ).select(
        "doc_a",
        "doc_b",
        F.col("dot").cast("bigint").alias("dot"),
        F.col("na2").cast("bigint").alias("na2"),
        F.col("nb2").cast("bigint").alias("nb2"),
    )
