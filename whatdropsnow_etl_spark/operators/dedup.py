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
    # Parallelism floor (guide §2.5 "input skew: one huge unsplittable
    # file → repartition immediately after the read", r12): a small
    # corpus parquet is one row group, so the scan is ONE task and the
    # entire shingle-explode + hash pipeline downstream of it ran
    # serially no matter the core count (the r11 verdict's flat 8→32
    # scaling on the MinHash family). When the source yields fewer
    # partitions than cores, hash-repartition by doc id first: the
    # shuffle is input-sized (small by the very condition that
    # triggers it), the downstream doc-keyed aggregations reuse the
    # partitioning, and every hash/min computation spreads over the
    # cores. At production scale the scan has thousands of splits and
    # this branch never fires. Deterministic hash partitioning, and
    # every consumer aggregates order-insensitively (min / count /
    # sort_array), so results are partition-layout-free.
    from ..functions.parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df, id_col)
    sh = shingles(tokens(F.col(text_col)), k)
    out = df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
    if hash_shingles:
        out = out.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    return out


def _expand_sorted_pairs(grouped: DataFrame, docs_col: str = "__docs") -> DataFrame:
    """(bucket rows w/ sorted doc array) → one row per ordered pair.

    All C(n,2) combinations are expanded JVM-side with higher-order
    functions (no Python, no self-join re-shuffle): for each element
    x at index i, pair it with every later element.
    """
    combos = F.flatten(
        F.transform(
            F.col(docs_col),
            lambda x, i: F.transform(
                F.slice(F.col(docs_col), i + 2, F.size(F.col(docs_col))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        grouped.where(F.size(docs_col) > 1)
        .select(F.explode(combos).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    hash_shingles: bool = False,
    max_docs_per_shingle: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Pairs (doc_a < doc_b) with k-gram-shingle Jaccard >= threshold.

    Exact (not approximate). With ``collapse_exact`` (default) the
    corpus is first collapsed to one representative per distinct
    normalized text, pairs are computed over representatives, and
    duplicate groups are expanded back — output-identical (verified
    against the naive SQL twin) but the quadratic candidate
    expansion operates on UNIQUE texts. On a 90 %-duplicate corpus
    this took the pair computation from 64 s to seconds; at 100 TB,
    where exact-dup rates are routinely 2-10x, collapsing first is
    the difference between a bounded and an exploding shuffle.

    The prepass is insurance with a measured premium: on a
    LOW-duplicate corpus (sf1, 0.16 % dups) the extra md5-groupBy
    shuffle makes collapse ~2x the naive path (8.0 s vs 3.7 s warm,
    identical 2 560 pairs). Callers that KNOW their input is already
    exact-deduped (e.g. downstream of ``dedup_exact``) should pass
    ``collapse_exact=False``; the default stays True because the
    failure mode it prevents is quadratic, not constant.
    """
    if collapse_exact:
        return _jaccard_with_collapse(
            df, text_col, id_col, k, threshold, hash_shingles, max_docs_per_shingle
        )
    return _jaccard_pairs_naive(
        df, text_col, id_col, k, threshold, hash_shingles, max_docs_per_shingle
    )


def _jaccard_pairs_naive(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
    hash_shingles: bool,
    max_docs_per_shingle: int | None,
) -> DataFrame:
    """Direct inverted-index pair computation.

    Shape chosen for minimal passes:
    - per-doc shingle counts are a *narrow* projection on the base
      table (size of the shingle array — no explode, no shuffle),
      broadcast into the final join;
    - candidate pairs come from ONE explode → groupBy(shingle) →
      collect_list → in-memory combination expansion (JVM
      higher-order funcs), i.e. 2 shuffles total and a single
      evaluation of the shingle pipeline.

    Scale guard: a shingle shared by c docs expands to C(c,2) pairs;
    ultra-frequent shingles are non-discriminative and blow up any
    exact method. ``max_docs_per_shingle`` drops hotter shingles
    (documented approximation, off by default); the 100 TB path is
    MinHash-LSH banding which bounds candidates by design.
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
    inter = (
        _expand_sorted_pairs(grouped)
        .groupBy("doc_a", "doc_b")
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


def _jaccard_with_collapse(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
    hash_shingles: bool,
    max_docs_per_shingle: int | None,
) -> DataFrame:
    """Exact-dup collapse → rep pairs → group expansion.

    Identical texts have identical shingle sets, so (a) every
    within-group pair has Jaccard exactly 1.0 with n_common = the
    text's shingle count, and (b) every cross-group pair has the
    same (n_common, jaccard) as its representative pair. Both facts
    let the expansion reconstruct the naive output exactly.
    """
    gid = F.md5(F.lower(F.trim(F.col(text_col))))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        gid.alias("__gid"),
    )
    # min_by carries the representative's OWN text through the same
    # aggregate — not any member's: members share md5(lower(trim())),
    # but tokens() splits the raw lowered text, where stray edge
    # whitespace yields empty tokens, so shingle sets can differ
    # within a group. One shuffle replaces the old groups⋈base
    # join-back (a second full-corpus shuffle).
    #
    # Lazily persisted (r11): the relation feeds reps (whose shingle
    # and size passes each re-evaluate it), the ma/mb member
    # broadcasts, nsh AND within_src — ~6 subplan copies in the one
    # physical plan, each a full corpus scan + md5 groupBy, since
    # Catalyst does not dedupe subtrees (the rank_correlation /
    # budget_curve_from_bins lesson applied to the pair kernel that
    # the whole cluster family sits on). Released via the
    # _cached_inputs convention.
    groups = base.groupBy("__gid").agg(
        F.sort_array(F.collect_list("doc_id")).alias("__members"),
        F.min("doc_id").alias("__rep"),
        F.min_by("__text", "doc_id").alias("__rtext"),
    ).persist()
    reps = groups.select(
        F.col("__rep").alias("doc_id"), F.col("__rtext").alias("__text")
    )
    rep_pairs = _jaccard_pairs_naive(
        reps.select("doc_id", F.col("__text").alias("text")),
        "text",
        "doc_id",
        k,
        threshold,
        hash_shingles,
        max_docs_per_shingle,
    )
    gmap = groups.select(F.col("__rep").alias("rep"), "__members")
    ma = gmap.select(F.col("rep").alias("doc_a"), F.col("__members").alias("__ma"))
    mb = gmap.select(F.col("rep").alias("doc_b"), F.col("__members").alias("__mb"))
    cart = F.flatten(
        F.transform(
            F.col("__ma"),
            lambda x: F.transform(
                F.col("__mb"),
                lambda y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        )
    )
    cross = (
        rep_pairs.join(F.broadcast(ma), "doc_a")
        .join(F.broadcast(mb), "doc_b")
        .select("n_common", "jaccard", F.explode(cart).alias("p"))
        .select(
            F.col("p.a").alias("doc_a"),
            F.col("p.b").alias("doc_b"),
            "n_common",
            "jaccard",
        )
    )
    nsh = groups.select(
        "__gid",
        F.size(shingles(tokens(F.col("__rtext")), k)).cast("bigint").alias("__nsh"),
    )
    within_src = (
        groups.join(nsh, "__gid")
        .where((F.size("__members") > 1) & (F.col("__nsh") > 0))
        .select(F.col("__members").alias("__docs"), "__nsh")
    )
    combos = F.flatten(
        F.transform(
            F.col("__docs"),
            lambda x, i: F.transform(
                F.slice(F.col("__docs"), i + 2, F.size(F.col("__docs"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    within = within_src.select(
        F.col("__nsh"), F.explode(combos).alias("p")
    ).select(
        F.col("p.a").alias("doc_a"),
        F.col("p.b").alias("doc_b"),
        F.col("__nsh").alias("n_common"),
        F.lit(1.0).alias("jaccard"),
    )
    out = cross.unionByName(within)
    out._cached_inputs = [groups]
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """One row per doc with columns h0..h{P-1}: MinHash signature.

    Portable string-hash MinHash (reference parity: the engine's
    dedup path, SURVEY §2.3): signature slot i is
    min(md5(shingle || '#i')) over the doc's distinct k-shingles.
    md5-of-string is bit-identical in Spark and DuckDB, so the LSH
    query has an exact SQL twin. The md5s are computed map-side on
    the exploded shingle stream and reduced by min() with partial
    (map-side) aggregation — the shuffle carries only P×32-char
    strings per doc, never the shingles. At 100 TB swap the md5
    family for xxhash64(shingle, seed) (8-byte slots, ~4× narrower
    shuffle); the banding logic below is hash-family agnostic.
    """
    sh = _doc_shingles(df, text_col, id_col, k, hash_shingles=False)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    P = bands × rows signature; docs collide in a band iff all rows
    of that band's signature slice agree. Output: (doc_a < doc_b,
    n_shared_bands). Collision probability for Jaccard s is
    1-(1-s^r)^b — with b=4, r=4 the S-curve knee sits near s≈0.7.

    Scale (SURVEY §6): candidates are bounded by bucket
    co-occupancy, never all-pairs; the two shuffles are
    groupBy(doc_id) [signatures] and groupBy(band, key) [buckets].
    A crowded bucket (skew) expands C(n,2) pairs — AQE skew-split
    handles the join-side; pathological buckets can be capped the
    same way ngram_jaccard_pairs caps hot shingles.
    """
    buckets = minhash_band_index(df, text_col, id_col, k, num_hashes, bands)
    grouped = buckets.groupBy("band", "key").agg(
        F.sort_array(F.collect_list("doc_id")).alias("__docs")
    )
    return (
        _expand_sorted_pairs(grouped)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The persistable LSH index relation: one (doc_id, band, key)
    row per (doc, band). At 100 TB this is what lives on disk
    (bucketed by (band, key)) between ingestion batches — the corpus
    text is never re-shingled to serve a new batch's dedup probe."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                    "key"
                ),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col("doc_id"), F.explode(band_structs).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def incremental_dedup_minhash(
    batch: DataFrame,
    index_buckets: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Incremental near-dup probe: which NEW docs collide with the
    EXISTING corpus — the production shape of dedup at 100 TB, where
    re-running all-pairs per ingestion batch is impossible.

    ``index_buckets`` is a :func:`minhash_band_index` relation (built
    once, persisted, appended per batch). The new batch is shingled/
    signed fresh (it's batch-sized), its band keys are broadcast into
    the index join — so the probe costs one scan of the index's
    matching buckets and ZERO corpus text re-processing. Output:
    (batch_doc, index_doc, n_shared_bands), batch-vs-index pairs
    only; fold the batch's own bucket rows into the index afterward
    to cover future batches (new-vs-new dups surface then, or via
    minhash_lsh_pairs over the batch alone).
    """
    bb = minhash_band_index(batch, text_col, id_col, k, num_hashes, bands).select(
        F.col("doc_id").alias("batch_doc"), "band", "key"
    )
    idx = index_buckets.select(
        F.col("doc_id").alias("index_doc"), "band", "key"
    )
    return (
        idx.join(F.broadcast(bb), ["band", "key"])
        .groupBy("batch_doc", "index_doc")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash fingerprint (BIGINT, low `bits` bits used).

    Bit j of token t is the parity of hex digit j of md5(t) (odd →
    +1 vote, even → -1), weighted by term frequency; fingerprint bit
    j is set iff the summed vote is positive. md5-hex-digit parity
    is engine-portable, so the pair query has an exact DuckDB twin.

    One explode over tokens, one explode over bit positions, then two
    tiny aggregates — md5 is computed once per token occurrence,
    map-side; partial agg reduces the shuffle to `bits` rows per doc.
    """
    # each token's md5 collapses to ONE 64-bit int whose bit (31-j)
    # is the parity of hex digit j: translate maps every hex digit
    # to '0'/'1', and conv(·, 2, 10) reads that as a binary number.
    # Semantically identical to summing ±1 votes (cnt_odd*2 > n ⟺
    # vote_sum > 0, ties → bit unset, matching the oracle's
    # CASE … > 0).
    #
    # The per-bit votes are tallied by exploding bit POSITIONS into
    # rows and aggregating (doc_id, j) groups, not by `bits` separate
    # sum columns: a 32-buffer HashAggregate plus a 32-term
    # fingerprint projection compiles into one enormous
    # whole-stage-codegen unit (~10 s of Janino on first execution —
    # the single worst cold-start in the driver bench); two 2-buffer
    # aggregates over 32× the rows codegen in milliseconds and the
    # extra rows collapse map-side, so warm throughput is unchanged.
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(
        "doc_id",
        F.conv(
            F.translate(F.md5("tok"), "0123456789abcdef", "0101010101010101"),
            2,
            10,
        )
        .cast("bigint")
        .alias("tf"),
    )
    # md5 hex is 32 digits, so digit j lands at bit 31-j of tf
    # regardless of how many fingerprint bits are in use
    votes = (
        tok.select(
            "doc_id",
            "tf",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        )
        .groupBy("doc_id", "j")
        .agg(
            F.sum(F.expr("shiftright(tf, 31 - j) & 1")).alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    term = F.when(
        F.col("v") * 2 > F.col("n"), F.expr("shiftleft(1L, j)")
    ).otherwise(F.lit(0).cast("bigint"))
    return votes.groupBy("doc_id").agg(F.sum(term).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, hamming) with hamming <= max.

    EXACT under banding (pigeonhole): fingerprints differing in at
    most `bands - 1` bits must agree on at least one of `bands`
    equal-width bit-bands, so the band-bucket join loses no pair
    with hamming <= bands - 1. Default bands=4/max_hamming=3 keeps
    the guarantee tight. Candidates are verified with
    bit_count(xor) — JVM-side, codegen.
    """
    assert max_hamming <= bands - 1, "banding is only exact for hamming < bands"
    band_width = bits // bands
    mask = (1 << band_width) - 1
    fps = simhash_fingerprints(df, text_col, id_col, bits)
    # collapse to DISTINCT fingerprints before banding: every doc
    # sharing a fingerprint pairs at hamming 0 (within-group
    # expansion below), and cross-fingerprint pairs inherit their
    # groups' hamming — so the quadratic bucket expansion runs over
    # unique fingerprints, immune to duplicate-heavy corpora
    groups = fps.groupBy("simhash").agg(
        F.sort_array(F.collect_list("doc_id")).alias("__members")
    )
    # `groups` feeds five consumers (both self-join sides, two member
    # rejoins, within-group pairs). Spark's exchange reuse does NOT
    # unify them (broadcast vs shuffle exchanges canonicalize
    # differently), so without materialization the whole
    # token→md5→vote pipeline re-executes per consumer. persist() is
    # the one materialization primitive that stays fully lazy at plan
    # construction (localCheckpoint under AQE executes the upstream
    # shuffle stages immediately, even with eager=False); the cached
    # relation is |distinct fingerprints| rows — tiny relative to the
    # corpus it summarizes.
    groups = groups.persist()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    # candidate generation is a SKINNY self-join on (band, key) over
    # distinct fingerprints only — no member arrays in the Σk²
    # candidate stream, and the bit_count(xor) hamming filter runs
    # inside the codegen'd join stage, so the quadratic intermediate
    # collapses to surviving fp pairs before anything wide is
    # carried. (A collect_list + nested-transform expansion was
    # ~7× slower here: higher-order array lambdas evaluate
    # interpreted and each slice copies the bucket tail, O(k²)
    # struct copies per hot bucket.)
    buckets = groups.select(
        F.col("simhash").alias("fp"), F.explode(band_structs).alias("bk")
    ).select("fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = buckets.alias("a"), buckets.alias("b")
    fp_pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.fp") < F.col("b.fp"),
            ],
        )
        .select(
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
            F.col("a.band").alias("band"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
            .cast("bigint")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        # a pair agreeing on several bands would surface once per
        # agreeing band; instead of a dropDuplicates shuffle, keep the
        # pair only in its FIRST agreeing band — recomputable from the
        # two fingerprints with a handful of bit ops, so dedup is a
        # stateless map-side filter
        .where(
            F.col("band")
            == F.coalesce(
                *[
                    F.when(
                        F.shiftright(F.col("fp_a"), i * band_width)
                        .bitwiseAND(F.lit(mask))
                        == F.shiftright(F.col("fp_b"), i * band_width)
                        .bitwiseAND(F.lit(mask)),
                        F.lit(i),
                    )
                    for i in range(bands)
                ]
            )
        )
        .drop("band")
        # members rejoin touches only surviving pairs; `groups` is
        # |distinct fingerprints| rows, so AQE broadcasts it when
        # small and shuffles it when genuinely large
        .join(
            groups.select(
                F.col("simhash").alias("fp_a"), F.col("__members").alias("__ma")
            ),
            "fp_a",
        )
        .join(
            groups.select(
                F.col("simhash").alias("fp_b"), F.col("__members").alias("__mb")
            ),
            "fp_b",
        )
    )
    cart = F.flatten(
        F.transform(
            F.col("__ma"),
            lambda x: F.transform(
                F.col("__mb"),
                lambda y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        )
    )
    cross = fp_pairs.select("hamming", F.explode(cart).alias("p")).select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"), "hamming"
    )
    within_combos = F.flatten(
        F.transform(
            F.col("__members"),
            lambda x, i: F.transform(
                F.slice(F.col("__members"), i + 2, F.size(F.col("__members"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    within = (
        groups.where(F.size("__members") > 1)
        .select(F.explode(within_combos).alias("p"))
        .select(
            F.col("p.a").alias("doc_a"),
            F.col("p.b").alias("doc_b"),
            F.lit(0).cast("bigint").alias("hamming"),
        )
    )
    return cross.unionByName(within)


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_iter: int = 15,
    algorithm: str = "twostars",
) -> DataFrame:
    """Duplicate clusters: connected components over near-dup pairs.

    Pairs alone don't dedup a corpus — transitive groups do (A~B,
    B~C ⇒ {A,B,C} keep one). Edges are the exact Jaccard pairs at
    ``threshold``. Two interchangeable component algorithms (same
    output contract, twin-tested):

    - ``twostars`` (default): the alternating large-star/small-star
      edge contraction (Kiveris et al., "Connected Components in
      MapReduce and Beyond"), O(log n) rounds regardless of
      component diameter — the 100 TB path (long duplicate chains:
      mirror farms, template families) and measured faster than
      min-label at sf1 (19.4 vs 25.6 s) and sf10 (45.2 vs 57.2 s),
      so it is also the default at small scale.
    - ``minlabel`` (the oracle twin): every doc starts labeled with
      its own id and repeatedly takes the min label over itself and
      its neighbors. O(component diameter) rounds, one shuffle per
      round; kept for cross-validation against the recursive-CTE
      oracle and as the simpler reference formulation.

    Both raise RuntimeError if ``max_iter`` rounds pass without
    convergence rather than returning partially-propagated labels.

    Output: one row per doc — component_id (min doc id in the
    component; singletons map to themselves), which doubles as the
    keeper id.
    """
    pairs_full = ngram_jaccard_pairs(
        df, text_col, id_col, k, threshold, hash_shingles=True
    )
    pairs = pairs_full.select("doc_a", "doc_b")
    cached = list(getattr(pairs_full, "_cached_inputs", []))
    ids = df.select(F.col(id_col).alias("id"))
    if algorithm == "twostars":
        try:
            out = _components_twostars(ids, pairs, max_iter)
        except RuntimeError:
            # non-convergence must not leak the persisted pair inputs
            # (ADVICE r11)
            for c in cached:
                c.unpersist()
            raise
        out._cached_inputs = cached
        return out
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = ids.select("id", F.col("id").alias("lbl")).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        nb = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        new_labels = (
            labels.join(nb, labels.id == nb.src, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nb_lbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        for c in cached:  # ADVICE r11: no cache leak on the error path
            c.unpersist()
        raise RuntimeError(
            f"dedup_clusters(minlabel) did not converge in {max_iter} rounds;"
            " raise max_iter or use algorithm='twostars' (O(log n) rounds)"
        )
    out = labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("component_id")
    )
    out._cached_inputs = cached
    return out


def _components_twostars(ids: DataFrame, pairs: DataFrame, max_iter: int) -> DataFrame:
    """Connected components via alternating large-star/small-star.

    Edges are kept directed (hi, lo) with hi > lo. Per round:

    - large-star(u): over the symmetrized neighborhood, connect every
      strictly-larger neighbor v of u to m = min(Γ(u) ∪ {u}).
    - small-star(u): group edges by their larger endpoint u; with
      m = min of u's smaller neighbors, connect u and each smaller
      neighbor to m.

    Each op is one groupBy + one join; the edge set contracts toward
    per-component stars centered at the min node in O(log n) rounds
    (vs O(diameter) for label propagation). Convergence = the edge
    set is a min-rooted star forest: every hi appears in exactly ONE
    edge (each non-root node points at exactly one parent) and no
    lo is itself some edge's hi (every edge points directly at its
    component root — hi-uniqueness alone would accept an inverted
    star like {(2,0),(2,1)}, which still needs a round; the
    hypothesis union-find property test caught exactly that).
    Fixpoints of the alternation are exactly these min-rooted stars
    (Kiveris et al. §3; both star ops preserve connectivity and the
    hi > lo orientation, so a star forest's centers are the
    component minima), hence testing star-forest-ness directly (one
    isEmpty probe over two violation relations on the checkpointed
    edges) stops at the SAME edge set as the old count + exceptAll
    equality probe but without the extra contraction round the
    equality probe needed to observe an unchanged edge set (r11:
    one full round — 2 groupBys, 2 joins, 2 distincts, a
    checkpoint — saved per call across the 6 cluster-family
    queries; output bit-identical).
    """

    def _is_star_forest(e: DataFrame) -> bool:
        lo_is_parent = e.select(F.col("lo").alias("x")).join(
            e.select(F.col("hi").alias("x")), "x", "left_semi"
        )
        hi_multi = (
            e.groupBy("hi")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1)
            .select(F.col("hi").alias("x"))
        )
        return lo_is_parent.unionByName(hi_multi).isEmpty()

    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = _is_star_forest(edges)
    for _ in range(max_iter):
        if converged:
            break
        sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        # m = min(Γ(u) ∪ {u}); v > u ⇒ v > m, so output stays (hi, lo)
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star over directed (hi, lo): m = min smaller neighbor
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smins, "hi")
            .where(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(smins.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = small
        converged = _is_star_forest(edges)
    if not converged:
        raise RuntimeError(
            f"dedup_clusters(twostars) did not converge in {max_iter} rounds"
        )
    # fixpoint: every non-root node has exactly its (node, root) edge
    roots = edges.groupBy("hi").agg(F.min("lo").alias("component_id"))
    return ids.join(roots, ids.id == roots.hi, "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce("component_id", "id").alias("component_id"),
    )


def _trigram_hist64() -> "F.Column":
    """Arrow-batched per-doc byte-trigram bucket histogram (64
    buckets, int32 counts) — the q-gram prefilter's doc-side
    sketch. numpy-vectorized per doc: rolling 3-byte windows,
    multiplicative mix, bincount. Runs ONCE per doc below the pair
    shuffle (the `h` char-histogram contract)."""
    # NOTE: the eval type is pinned explicitly (SCALAR) instead of
    # via type hints — this module's `from __future__ import
    # annotations` stringifies hints, and pyspark's resolver can't
    # see a function-local `pd` to un-stringify them. The
    # deprecation warning is silenced at creation only.
    import warnings  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415
    from pyspark.sql.pandas.functions import (  # noqa: PLC0415
        PandasUDFType,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        return _trigram_kernel(pandas_udf, PandasUDFType, pd)


def _trigram_kernel(pandas_udf, PandasUDFType, pd):
    @pandas_udf("array<int>", PandasUDFType.SCALAR)
    def kernel(txt):
        import numpy as np  # noqa: PLC0415

        zero = np.zeros(64, dtype=np.int32)
        out = []
        for s in txt:
            if s is None:
                out.append(zero)
                continue
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
            if b.size < 3:
                out.append(zero)
                continue
            w = (
                b[:-2].astype(np.int64) * 65536
                + b[1:-1].astype(np.int64) * 256
                + b[2:]
            )
            h = (w * 2654435761) & 0xFFFFFFFF
            out.append(
                np.bincount((h >> 8) & 63, minlength=64).astype(np.int32)
            )
        return pd.Series(out)

    return kernel


def _editdist_base(
    docs: DataFrame,
    band_width: int,
    qgram: bool,
    id_col: str,
    text_col: str,
    lang_col: str,
    len_col: str,
) -> DataFrame:
    """Per-doc feature projection shared by the full and incremental
    editdist operators: id, lang, metadata + true lengths, length
    band, a-z char histogram (O(26) pair filter: every edit changes
    the char multiset by <= 2, so lev >= L1/2), and with ``qgram``
    the 64-bucket byte-trigram histogram + pure-ASCII flag. Computed
    ONCE per doc below the group shuffle.

    NULL text or NULL length rows are dropped here — matching the r6
    join shape, where null-comparison semantics excluded them silently.
    Without the filter they reach the numpy kernel as NaN and crash
    the whole task with an opaque TypeError (r7 ADVICE)."""
    docs = docs.where(
        F.col(text_col).isNotNull() & F.col(len_col).isNotNull()
    )
    hist = F.array(
        *[
            (
                F.length(F.col(text_col))
                - F.length(F.expr(f"replace({text_col}, '{c}', '')"))
            ).cast("int")
            for c in "abcdefghijklmnopqrstuvwxyz"
        ]
    )
    extra = []
    if qgram:
        extra = [
            _trigram_hist64()(F.col(text_col)).alias("h3"),
            # pure-ASCII flag: tightens the lossless L1 bound from
            # 12*max_dist to 6*max_dist when BOTH sides are ASCII
            # (a char edit then rewrites exactly one byte)
            (
                F.octet_length(F.col(text_col))
                == F.length(F.col(text_col))
            ).alias("ba"),
        ]
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lg"),
        F.col(len_col).alias("ln"),
        # true length, computed once per doc below the shuffle (the
        # len_col metadata could be stale; lev >= |true len diff|)
        F.length(F.col(text_col)).alias("tln"),
        F.floor(F.col(len_col) / band_width).alias("band"),
        hist.alias("h"),
        *extra,
    )


def _editdist_pair_kernel(max_dist: int, qgram: bool):
    """Factory for the blocked numpy pair-gate kernel shared by the
    full and incremental operators (see editdist_pairs' docstring
    for the measurement story): rows with side==0 are the group's
    OWN docs, side==1 its GUESTS; emits (lo, hi) for own-own (i<j)
    and own-guest pairs passing the lossless length/char/q-gram
    bounds."""
    char_bound = 2 * max_dist
    q_ascii, q_any = 6 * max_dist, 12 * max_dist

    def pair_gate(pdf):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        own_m = pdf["side"].to_numpy() == 0
        n0 = int(own_m.sum())
        empty = pd.DataFrame({"lo": pd.Series(dtype=pdf["id"].dtype),
                              "hi": pd.Series(dtype=pdf["id"].dtype)})
        if n0 == 0 or len(pdf) < 2:
            return empty
        pdf = pd.concat([pdf[own_m], pdf[~own_m]])
        ids = pdf["id"].to_numpy()
        ln = pdf["ln"].to_numpy(np.int64)
        tln = pdf["tln"].to_numpy(np.int64)
        # int32, NOT int16: a single char count past 32767 (~250 KB
        # of English text — reachable on real crawl docs) would wrap
        # negative and silently DROP a true pair, breaking the
        # lossless contract (r7 ADVICE). The tiled l1 accumulator
        # below is int32 already, so peak memory stays tile-bounded.
        H = np.stack([np.asarray(v, dtype=np.int32) for v in pdf["h"]])
        if qgram:
            H3 = np.stack(
                [np.asarray(v, dtype=np.int32) for v in pdf["h3"]]
            )
            ba = pdf["ba"].to_numpy(bool)
        n = len(pdf)
        jidx = np.arange(n)[None, :]
        lo_parts, hi_parts = [], []
        tile = 512
        for s0 in range(0, n0, tile):
            s1 = min(s0 + tile, n0)
            rows = slice(s0, s1)
            iidx = np.arange(s0, s1)[:, None]
            # candidate mask: own-own strictly upper-triangular,
            # own-guest always; both length lower bounds
            mask = (jidx > iidx) | (jidx >= n0)
            mask &= np.abs(ln[rows, None] - ln[None, :]) <= max_dist
            mask &= np.abs(tln[rows, None] - tln[None, :]) <= max_dist
            # char-histogram L1 (lev >= L1/2), densely vectorized:
            # 26 (tile x n) passes beat per-pair gathers on memory
            l1 = np.zeros((s1 - s0, n), dtype=np.int32)
            for k in range(H.shape[1]):
                l1 += np.abs(
                    H[rows, k].astype(np.int32)[:, None]
                    - H[None, :, k].astype(np.int32)
                )
            mask &= l1 <= char_bound
            ii, jj = np.nonzero(mask)
            if ii.size == 0:
                continue
            ii = ii + s0
            if qgram:
                # byte-trigram L1 on char survivors only (sparse
                # gather is cheap at this point)
                l1q = np.abs(
                    H3[ii].astype(np.int32) - H3[jj].astype(np.int32)
                ).sum(axis=1)
                bound = np.where(ba[ii] & ba[jj], q_ascii, q_any)
                keep = l1q <= bound
                ii, jj = ii[keep], jj[keep]
                if ii.size == 0:
                    continue
            a_ids, b_ids = ids[ii], ids[jj]
            lo_parts.append(np.minimum(a_ids, b_ids))
            hi_parts.append(np.maximum(a_ids, b_ids))
        if not lo_parts:
            return empty
        return pd.DataFrame(
            {
                "lo": np.concatenate(lo_parts),
                "hi": np.concatenate(hi_parts),
            }
        )

    return pair_gate


def _editdist_score(
    cand_ids: DataFrame,
    texts: DataFrame,
    max_dist: int,
    prefix: int,
) -> DataFrame:
    """Texts join back AFTER the histogram gates: only survivors
    (output pairs + near-misses the histograms can't separate) pay
    the text shuffle and any DP. Both DP gates are pure functions of
    the pair's texts, so running them after the pair relation is
    formed yields exactly the gate-before-distinct pair set — a
    lossless restructure at every scale. 3-arg levenshtein runs the
    banded O(threshold*len) DP and early-exits distant pairs
    (returns -1 past the threshold)."""
    with_texts = (
        cand_ids.join(texts, cand_ids["lo"] == texts["__tid"])
        .select("lo", "hi", F.col("__ttxt").alias("tl"))
        .join(texts, F.col("hi") == texts["__tid"])
        .select("lo", "hi", "tl", F.col("__ttxt").alias("th"))
    )
    return (
        with_texts.where(
            F.levenshtein(
                F.substring("tl", 1, prefix),
                F.substring("th", 1, prefix),
                threshold=max_dist,
            )
            >= 0
        )
        .select(
            "lo",
            "hi",
            F.levenshtein("tl", "th", threshold=max_dist).alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )


def editdist_pairs(
    docs: DataFrame,
    max_dist: int = 16,
    prefix: int = 80,
    band_width: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    len_col: str = "n_chars",
    max_band_docs: int | None = 2000,
    shuffle_parallelism: int | None = None,
    qgram_prefilter: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by Levenshtein distance, length-banded.

    Quadratic edit distance can never run all-pairs at scale, so
    candidates are blocked three ways before any DP runs:
    (1) equality on ``lang_col``; (2) length bands of ``band_width``
    chars — the right side replicates into its own and the previous
    band, so cross-boundary pairs meet exactly once without an OR
    join; (3) ``|len(a)-len(b)| <= max_dist``, a lower bound on the
    distance. Survivors pay a ``prefix``-capped DP (bounded cost per
    pair), and only prefix-candidates pay the full-text DP.

    Blocking is recall-lossy by design (a doc pair whose lengths
    differ by more than max_dist is provably not a match, but the
    prefix gate is heuristic); the same staging runs in the oracle
    twin, so parity is exact. Output: (lo, hi, dist) with lo < hi,
    dist = full-text Levenshtein <= max_dist.

    ``band_width`` is performance-only (smaller bands = fewer
    candidate pairs) as long as it stays >= max_dist, which keeps
    every len-diff-qualified pair within one band of its partner —
    the oracle twin may band differently and still agree. It
    therefore defaults to ``max_dist``, the tightest valid banding:
    candidate volume is quadratic in band population, and halving
    the band roughly halves the candidates (measured sf1: 51.4 s at
    width 32 -> 27.8 s at width 16, identical 13 822 output pairs).

    ``max_band_docs`` bounds per-(lang, band) GROUP cost — quadratic
    candidate mass AND the one-group-in-memory applyInPandas peak —
    by SALTED SUB-BLOCKING into
    s = max(ceil(own / cap), ceil(arrivals / (2·cap)))
    deterministic hash sub-blocks; ``arrivals`` is the group's own
    docs PLUS the adjacent band's guest replicas (counting only own
    docs let a hub-shaped neighbor band ride unbounded guest rows
    into one group, r8), and the 2·cap divisor keeps the uniform
    steady state (guests ≈ own, group peak already ~2·cap) at the
    exact same s — identical output — while pathological bands now
    split until a group holds ≤ ~2·cap rows. Pairs meet only within
    a sub-block — candidate mass per block drops from n² to
    ~n·max_band_docs while EVERY doc keeps ~max_band_docs comparison
    partners (an earlier revision dropped oversized blocks outright,
    which at sf10 excluded 87% of the corpus from dedup entirely).
    Within an oversized destination band ~1/s of true pairs survive
    — the standard salting recall trade; pair
    MinHash-LSH alongside to recover cross-sub-block duplicates. The
    default (2000) is far above every parity-scale block population
    (max 23 at sf0.01, 153 at sf0.1), so s == 1 everywhere there and
    the path is EXACT — the oracle twin needs no salting
    (pytest-asserted). ``None`` restores the exact uncapped path.

    ``qgram_prefilter`` (default on, r6) adds the classic q-gram
    filter of string-similarity joins in front of the DP gates: a
    64-bucket byte-trigram histogram per doc (Arrow kernel, once per
    doc below the shuffle), and per pair the EXACT bound
    "lev(a,b) <= d implies trigram-multiset L1 <= 12d (6d when both
    sides are pure ASCII)" — each char edit rewrites <= 4 bytes, so
    it removes <= 6 and adds <= 6 overlapping byte-trigrams, and
    bucket collisions only shrink the L1. The filter is therefore
    LOSSLESS at every scale (identical pairs pytest-pinned, and no
    oracle twin needed — implied by ``dist <= max_dist`` exactly
    like the char-histogram gate). Measured funnel at sf10
    (cap=2000): ~628M length-qualified candidates -> 43.6M past the
    char histogram -> 6.8M past the q-gram bound -> 165 277 pairs.

    **r7 execution shape — blocked numpy pair kernel.** The pair
    generation + histogram gates run in ONE ``applyInPandas`` per
    (lang, band, salt) group (the embedding_dedup/sparse_cosine
    blocked-tile pattern), NOT as a replicated self-join: measured
    at sf10, the bare pair join costs 6.9 s but ANY histogram-gate
    expression attached to it (zip_with fold, unrolled GetArrayItem
    sums, in the condition or a filter above) drops the stage out
    of effective codegen and pays interpreted µs/pair across ~10^9
    candidates — the r6 join shape cost 256.6 s, unrolled-sum
    variants >580 s, while the kernel runs the identical gates
    vectorized for the whole operator in 32.3 s (same 165 277
    pairs, same session, back-to-back). Only per-doc rows (~250 B)
    cross the Arrow boundary; surviving id pairs come back; texts
    join back for survivors only, and the prefix/full DP run after
    the (lo, hi) relation is pair-unique — own-own pairs emit once
    (i < j), own-guest (cross-band) once, so no global DISTINCT.
    A MinHash band pre-gate (the other candidate design) was
    REFUTED by measurement: in-block non-match pairs have median
    char-trigram Jaccard 0.54 vs ~0.72 at the distance threshold —
    any banding selective enough to cut pair mass also drops
    borderline true pairs, while the kernel is exact.

    ``shuffle_parallelism`` (default 4× the cluster's default
    parallelism) is the partition count the member relation is
    explicitly hash-partitioned to on the full (lang, band, salt)
    key, so a hot block's sub-block groups spread across tasks
    instead of landing in one (lang, band) partition. AQE never
    coalesces a user-specified repartition, so the count survives
    to runtime. Partition/assignment changes never change results —
    the kernel is a pure function of its group.
    """
    if band_width is None:
        band_width = max_dist
    if band_width < max_dist:
        raise ValueError(
            f"band_width ({band_width}) must be >= max_dist ({max_dist}):"
            " a qualifying pair could otherwise straddle 2+ bands and"
            " be missed"
        )
    nparts = shuffle_parallelism or (
        docs.sparkSession.sparkContext.defaultParallelism * 4
    )
    members = _editdist_members(
        docs, band_width, qgram_prefilter,
        id_col, text_col, lang_col, len_col, max_band_docs, nparts,
    )
    from pyspark.sql import types as T  # noqa: PLC0415

    id_type = docs.schema[id_col].dataType
    pair_schema = T.StructType(
        [T.StructField("lo", id_type), T.StructField("hi", id_type)]
    )
    pair_gate = _editdist_pair_kernel(max_dist, qgram_prefilter)
    cand_ids = members.groupBy("lg", "band", "salt").applyInPandas(
        pair_gate, schema=pair_schema
    )
    texts = docs.select(
        F.col(id_col).alias("__tid"), F.col(text_col).alias("__ttxt")
    )
    return _editdist_score(cand_ids, texts, max_dist, prefix)


def _editdist_members(
    docs: DataFrame,
    band_width: int,
    qgram_prefilter: bool,
    id_col: str,
    text_col: str,
    lang_col: str,
    len_col: str,
    max_band_docs: int | None,
    nparts: int,
) -> DataFrame:
    """The (lang, band, salt)-keyed member relation the pair kernel
    groups over: own docs (side 0) plus the adjacent band's guest
    replicas (side 1), salted by the destination band's ARRIVAL
    count. Factored out so the peak-group-size contract (one group
    == one in-memory pandas frame) is directly testable."""
    base = _editdist_base(
        docs, band_width, qgram_prefilter,
        id_col, text_col, lang_col, len_col,
    )
    d = base
    if max_band_docs is not None:
        if max_band_docs < 1:
            raise ValueError(
                f"max_band_docs ({max_band_docs}) must be >= 1 (or None"
                " for the exact uncapped path)"
            )
        # candidate volume grows quadratically with band population —
        # at corpus scale, oversized (lang, band) blocks must be
        # bounded or the join explodes no matter how cheap the
        # per-pair gate is. SALTED SUB-BLOCKING: a block splits into
        # s = max(ceil(own / cap), ceil(arrivals / (2·cap)))
        # hash-assigned sub-blocks and pairs only meet within a
        # sub-block — every doc keeps ~cap comparison partners and
        # quadratic mass per block drops from n² to ~n·cap.
        # ``arrivals`` counts EVERYTHING landing in the group — own
        # docs AND the adjacent band's guests (r8, r7 verdict ask
        # #9: an own-only count let a hub-shaped adjacent band ride
        # 100k+ guest rows into one applyInPandas group, unbounded
        # peak memory). The 2·cap arrivals divisor makes the
        # UNIFORM case (guests ≈ own, the r7 steady state whose
        # group peak was already ~2·cap) keep the exact same s —
        # and therefore identical output — while hub-shaped bands
        # now split until a group holds ≤ ~2·cap rows. (An earlier
        # revision DROPPED oversized blocks outright; at sf10 that
        # silently excluded 87% of the corpus — a recall cliff, not
        # a dial.) Approximation contract: within an oversized
        # destination band ~1/s of true pairs survive
        # (cross-sub-block pairs are lost — run MinHash alongside
        # for those); at parity scales every s == 1 and the path is
        # EXACT, so the oracle twin needs no salting
        # (pytest-asserted).
        own_pop = d.groupBy("lg", "band").agg(
            F.count(F.lit(1)).alias("__no")
        )
        guest_pop = (
            d.select("lg", (F.col("band") - 1).alias("band"))
            .groupBy("lg", "band")
            .agg(F.count(F.lit(1)).alias("__ng"))
        )
        pops = own_pop.join(guest_pop, ["lg", "band"], "left").select(
            "lg",
            "band",
            F.greatest(
                F.ceil(F.col("__no") / max_band_docs),
                F.ceil(
                    (F.col("__no") + F.coalesce(F.col("__ng"), F.lit(0)))
                    / (2 * max_band_docs)
                ),
            )
            .cast("int")
            .alias("__s"),
        )
        d = d.join(F.broadcast(pops), ["lg", "band"]).withColumn(
            "salt", F.pmod(F.xxhash64("id"), F.col("__s")).cast("int")
        )
    else:
        pops = None
        d = d.withColumn("salt", F.lit(0))
    # ---- r7 pair stage: blocked numpy kernel, not a pair join ----
    # Measured at sf10 (500k docs, ~10^9 salted candidate pairs):
    # the bare pair JOIN costs 6.9 s, but ANY histogram-gate
    # expression attached to it — zip_with fold, unrolled
    # GetArrayItem sums, in the join condition or a filter above —
    # drops the stage out of effective codegen and pays ~µs/pair
    # interpreted evaluation (the r6 shape: 256 s; unrolled-sum
    # variants: >580 s). The only fast per-pair evaluator at this
    # volume is vectorized numpy, so the pair generation + histogram
    # gates move into ONE applyInPandas kernel per (lang, band,
    # salt) group — the sanctioned embedding_dedup/sparse_cosine
    # blocked-tile pattern. Only per-DOC rows cross the Arrow
    # boundary (~250 B each); surviving id pairs come back. The
    # gates are the same lossless bounds as before, so output is
    # identical at every scale (pytest-pinned).
    #
    # Group membership reproduces the old replicated join exactly:
    # a group (lg, b, s) holds the block's OWN docs (salted by its
    # own s) plus GUEST rows — band b+1 docs salted by THIS block's
    # sub-block count (the old "replica into the previous band").
    # Own-own pairs emit once (i < j), own-guest once (cross-band
    # pairs meet only here), so no global DISTINCT is needed.
    qcols = ["h3", "ba"] if qgram_prefilter else []
    own = d.select(
        "lg", "band", "salt", F.lit(0).alias("side"),
        "id", "ln", "tln", "h", *qcols,
    )
    guest = base.withColumn("band", F.col("band") - 1)
    if pops is not None:
        guest = guest.join(F.broadcast(pops), ["lg", "band"]).withColumn(
            "salt", F.pmod(F.xxhash64("id"), F.col("__s")).cast("int")
        )
    else:
        guest = guest.withColumn("salt", F.lit(0))
    guest = guest.select(
        "lg", "band", "salt", F.lit(1).alias("side"),
        "id", "ln", "tln", "h", *qcols,
    )
    # the ONE explicit co-partitioning, on the FULL salted key, at
    # the members level (an earlier revision also repartitioned d
    # pre-union — Catalyst can't collapse the two exchanges across
    # the union/select, so the own side paid a redundant full
    # shuffle; r7 ADVICE). A plain (lg, band) partitioning would
    # satisfy the groupBy's clustering requirement as a key subset
    # and keep every sub-block of a hot block in one task (the sf10
    # tail) — and AQE never coalesces a user-specified repartition,
    # so nparts survives to runtime.
    return own.unionByName(guest).repartition(
        nparts, "lg", "band", "salt"
    )


def editdist_pairs_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    max_dist: int = 16,
    prefix: int = 80,
    band_width: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    len_col: str = "n_chars",
    max_band_docs: int | None = 2000,
    shuffle_parallelism: int | None = None,
    qgram_prefilter: bool = True,
) -> DataFrame:
    """The NEW near-dup pairs an ingestion batch introduces: every
    Levenshtein pair (dist <= ``max_dist``) with AT LEAST ONE batch
    doc — batch×batch and batch×corpus — WITHOUT re-pairing the
    existing corpus against itself. The
    :func:`line_dedup_incremental` contract applied to edit
    distance: at 100 TB the corpus self-pairs were already found
    when those docs arrived; each daily crawl only needs its own
    new pairs, so per-batch cost is batch-size × block-population,
    never corpus².

    Same blocking/gates/DP as :func:`editdist_pairs` (identical
    lossless bounds, the same blocked numpy kernel): groups are
    (lang, band, salt); a group's OWN rows are the batch docs of
    that block; its GUESTS are batch docs of band+1 (each
    cross-band batch pair meets exactly once) plus corpus docs of
    bands {band-1, band, band+1} (the corpus is never "own", so
    BOTH adjacent bands must be pulled in — the full operator
    covers the other direction by symmetry, this one cannot).
    Exactness: at parity scales (every block under
    ``max_band_docs`` ⇒ salt count 1) the result is EXACTLY the
    full operator's pairs restricted to lo∈batch ∨ hi∈batch
    (pytest-pinned, oracle-twinned); in the salted regime the
    sub-block partition differs from the full operator's for
    up-pulled corpus guests — the same ~1/s-survival approximation
    contract, drawn independently.

    Block populations (and therefore salts) come from the CURRENT
    corpus — batch ∪ index — so a hot block stays bounded as it
    grows. ``batch`` and ``corpus`` must be id-disjoint (dedupe a
    redelivered batch upstream; an id on both sides would pair with
    itself). Emits (lo, hi, dist), lo < hi, dist <= max_dist.
    """
    if band_width is None:
        band_width = max_dist
    if band_width < max_dist:
        raise ValueError(
            f"band_width ({band_width}) must be >= max_dist ({max_dist}):"
            " a qualifying pair could otherwise straddle 2+ bands and"
            " be missed"
        )
    from pyspark.sql import types as T  # noqa: PLC0415

    nparts = shuffle_parallelism or (
        batch.sparkSession.sparkContext.defaultParallelism * 4
    )
    b_base = _editdist_base(
        batch, band_width, qgram_prefilter,
        id_col, text_col, lang_col, len_col,
    )
    c_base = _editdist_base(
        corpus, band_width, qgram_prefilter,
        id_col, text_col, lang_col, len_col,
    )
    if max_band_docs is not None and max_band_docs < 1:
        raise ValueError(
            f"max_band_docs ({max_band_docs}) must be >= 1 (or None"
            " for the exact uncapped path)"
        )
    qcols = ["h3", "ba"] if qgram_prefilter else []
    cols = ["id", "ln", "tln", "h", *qcols]
    if max_band_docs is not None:
        # arrivals count, like the full operator (r8): a group at
        # destination band B holds batch docs of band B (own) plus
        # batch docs of band B+1 and corpus docs of bands B-1/B/B+1
        # (guests) — counting them all keeps hub-shaped neighbor
        # bands from riding unbounded guest rows into one group;
        # same s formula as the full operator (the 2·cap arrivals
        # divisor keeps the steady-state group peak at ~2·cap)
        own_pop = b_base.groupBy("lg", "band").agg(
            F.count(F.lit(1)).alias("__no")
        )
        garr = b_base.select("lg", (F.col("band") - 1).alias("band"))
        for shift in (-1, 0, 1):
            garr = garr.unionByName(
                c_base.select("lg", (F.col("band") + shift).alias("band"))
            )
        guest_pop = garr.groupBy("lg", "band").agg(
            F.count(F.lit(1)).alias("__ng")
        )
        pops = own_pop.join(guest_pop, ["lg", "band"], "left").select(
            "lg",
            "band",
            F.greatest(
                F.ceil(F.col("__no") / max_band_docs),
                F.ceil(
                    (F.col("__no") + F.coalesce(F.col("__ng"), F.lit(0)))
                    / (2 * max_band_docs)
                ),
            )
            .cast("int")
            .alias("__s"),
        )

        def salted(df: DataFrame, band_expr) -> DataFrame:
            out = df.withColumn("band", band_expr)
            return out.join(F.broadcast(pops), ["lg", "band"]).withColumn(
                "salt", F.pmod(F.xxhash64("id"), F.col("__s")).cast("int")
            )
    else:

        def salted(df: DataFrame, band_expr) -> DataFrame:
            return df.withColumn("band", band_expr).withColumn(
                "salt", F.lit(0)
            )

    own = salted(b_base, F.col("band")).select(
        "lg", "band", "salt", F.lit(0).alias("side"), *cols
    )
    guests = [salted(b_base, F.col("band") - 1)]
    for shift in (-1, 0, 1):
        guests.append(salted(c_base, F.col("band") + F.lit(shift)))
    guest = None
    for g in guests:
        g = g.select("lg", "band", "salt", F.lit(1).alias("side"), *cols)
        guest = g if guest is None else guest.unionByName(g)
    members = own.unionByName(guest).repartition(
        nparts, "lg", "band", "salt"
    )
    id_type = batch.schema[id_col].dataType
    pair_schema = T.StructType(
        [T.StructField("lo", id_type), T.StructField("hi", id_type)]
    )
    pair_gate = _editdist_pair_kernel(max_dist, qgram_prefilter)
    cand_ids = members.groupBy("lg", "band", "salt").applyInPandas(
        pair_gate, schema=pair_schema
    )
    texts = (
        batch.select(
            F.col(id_col).alias("__tid"), F.col(text_col).alias("__ttxt")
        )
        .unionByName(
            corpus.select(
                F.col(id_col).alias("__tid"),
                F.col(text_col).alias("__ttxt"),
            )
        )
    )
    return _editdist_score(cand_ids, texts, max_dist, prefix)


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    hash_shingles: bool = True,
    max_docs_per_shingle: int | None = None,
) -> DataFrame:
    """Directed shingle-containment pairs: C(a -> b) = |S_a ∩ S_b| / |S_a|.

    Jaccard misses asymmetric duplication -- a short doc wholly quoted
    inside a long one scores low on Jaccard but 1.0 on containment
    (Broder 1997's second resemblance measure). This is the relation
    behind subset-dup triage: quotes, excerpts, aggregator wrappers.

    Output: (doc_a, doc_b, n_common, containment) for every ORDERED
    pair with C(doc_a -> doc_b) >= threshold, doc_a != doc_b --
    i.e. doc_a is (mostly) contained in doc_b.

    Shape: one inverted-index pass computes unordered co-occurrence
    counts (explode -> groupBy(shingle) -> in-JVM pair expansion --
    the same 2-shuffle skeleton as :func:`ngram_jaccard_pairs`), then
    both directions are emitted and divided by the source doc's
    shingle count. Per-doc sizes join via a plain equi-join (AQE
    broadcasts it while it fits; at 100 TB the sizes relation is
    corpus-sized, so a broadcast must not be hard-coded). The
    ultra-frequent-shingle guard and the LSH-prefilter scale path
    are the same as Jaccard's.
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
    inter = (
        _expand_sorted_pairs(grouped)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    directed = inter.union(
        inter.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"), "n_common")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("__na"))
    return (
        directed.join(sa, "doc_a")
        .withColumn(
            "containment", F.col("n_common").cast("double") / F.col("__na")
        )
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_common", F.round("containment", 6).alias("containment"))
    )


def cluster_keep_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_iter: int = 15,
    algorithm: str = "twostars",
    components: DataFrame | None = None,
) -> DataFrame:
    """Near-dup clustering + best-document representative selection.

    :func:`dedup_clusters` answers "which docs are together";
    production dedup must also answer "which one survives". The
    keeper per component is the argmax of the composite quality
    score (ties broken by smaller doc_id -- fully deterministic),
    NOT the min-id: on real corpora the min-id doc is often the
    worst copy (truncated scrape, boilerplate wrapper).

    Output: one row per doc -- (doc_id, component_id,
    keeper_doc_id, kept) where kept=1 iff the doc is its
    component's keeper. Singletons keep themselves.

    Shape: components from the O(log n)-round two-stars contraction,
    quality from a pure-column projection, then ONE ordered window
    per component (first_value over the full frame) -- a single
    extra shuffle on component_id after clustering; no self-join.
    Component sizes are near-dup cluster sizes (bounded in practice;
    a pathological mega-cluster is already a problem upstream at the
    pairs stage, not here).
    """
    from pyspark.sql.window import Window

    from .textops import quality_score

    # a pipeline that already ran dedup_clusters passes it in via
    # ``components`` (doc_id, component_id) instead of re-deriving the
    # pair relation — the clustering is the expensive half
    comp = (
        components
        if components is not None
        else dedup_clusters(df, text_col, id_col, k, threshold, max_iter, algorithm)
    )
    qual = quality_score(df, text_col, id_col).select(
        F.col(id_col).alias("doc_id"), "quality"
    )
    scored = comp.join(qual, "doc_id")
    w = (
        Window.partitionBy("component_id")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = scored.select(
        "doc_id",
        "component_id",
        F.first("doc_id").over(w).alias("keeper_doc_id"),
        (F.col("doc_id") == F.first("doc_id").over(w)).cast("int").alias("kept"),
    )
    # propagate the clustering's persisted inputs so long-lived
    # callers can release them (ADVICE r11: wrappers that dropped the
    # attribute pinned a corpus-sized cache per call)
    out._cached_inputs = list(getattr(comp, "_cached_inputs", []))
    return out


def lsh_tuning_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Precision/recall of MinHash-LSH candidates against exact
    Jaccard-``threshold`` truth: ONE row — (n_candidates, n_true,
    tp, fp, fn, precision, recall).

    The S-curve math (P[collide] = 1-(1-s^r)^b) predicts a band
    config's behavior; this measures it on YOUR corpus, which is how
    (num_hashes, bands) actually get chosen before a 100 TB run: run
    the report on an affordable sample, then commit the config. fp
    is rerank waste (cost), fn is recall loss (missed dups) -- the
    two axes the banding trade-off moves.

    Truth is the exact inverted-index Jaccard relation, so the
    report itself is only for sample/parity scales -- exactly its
    purpose. The whole report is ONE lazy plan: a full-outer join of
    the two pair relations into a single global aggregate -- no
    driver-side counts during composition.
    """
    cand = minhash_lsh_pairs(df, text_col, id_col, k, num_hashes, bands).select(
        "doc_a", "doc_b", F.lit(1).alias("__c")
    )
    truth_full = ngram_jaccard_pairs(df, text_col, id_col, k, threshold)
    truth = truth_full.select("doc_a", "doc_b", F.lit(1).alias("__t"))
    both = cand.join(truth, ["doc_a", "doc_b"], "full_outer")
    n_cand = F.count("__c")
    n_true = F.count("__t")
    tp = F.count(F.when(F.col("__c").isNotNull() & F.col("__t").isNotNull(), 1))
    out = both.agg(
        n_cand.alias("n_candidates"),
        n_true.alias("n_true"),
        tp.alias("tp"),
        (n_cand - tp).alias("fp"),
        (n_true - tp).alias("fn"),
        F.round(tp.cast("double") / n_cand, 6).alias("precision"),
        F.round(tp.cast("double") / n_true, 6).alias("recall"),
    )
    # propagate the truth relation's persisted inputs (ADVICE r11)
    out._cached_inputs = list(getattr(truth_full, "_cached_inputs", []))
    return out


def span_dedup(
    docs: DataFrame,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = False,
) -> DataFrame:
    """C4-style cross-document span deduplication: split every doc
    into consecutive ``span_tokens``-token spans, keep only the
    FIRST corpus occurrence of each span text, and reassemble each
    doc from its surviving spans (C4 removed repeated three-sentence
    spans the same way — arXiv:1910.10683 §2.2; boilerplate,
    licenses, and mirrored passages disappear from every copy but
    the first).

    "First" is a total order — (doc_id, span_idx) lexicographic —
    so the survivor set is deterministic and engine-portable.

    Scale shape: one tokenize + map-only span explode (~n_tokens/k
    rows, no overlap so no row multiplication beyond 1/k), ONE
    shuffle on the span key for the first-occurrence window, one
    doc-keyed aggregate to reassemble. The default span key is the
    exact span text so the DuckDB twin is collisionlessly identical;
    ``hash_spans=True`` keys the window on ``xxhash64(span)``
    instead — 64-bit fixed-width shuffle rows (~8× narrower than
    8-token span strings), collisions over-delete one span in
    ~n²/2⁶⁴, the standard C4 trade and the 100 TB default
    (pytest pins both paths identical at test scale). No driver
    state, no self-join: the window does the global "seen before"
    in one pass.

    Emits (doc_id, n_spans, n_dropped, text_dedup).
    """
    from pyspark.sql.window import Window

    stride = span_tokens
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                starts,
                lambda s: F.struct(
                    (s / stride).cast("bigint").alias("span_idx"),
                    F.array_join(
                        F.slice(toks, s + 1, span_tokens), " "
                    ).alias("span_text"),
                ),
            )
        ).alias("sp"),
    ).select("doc_id", "sp.span_idx", "sp.span_text")
    key = (
        F.xxhash64("span_text") if hash_spans else F.col("span_text")
    )
    spans = spans.withColumn("__k", key)
    w = Window.partitionBy("__k").orderBy("doc_id", "span_idx")
    kept = spans.withColumn("__rn", F.row_number().over(w))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct("span_idx", "span_text"),
                            )
                        )
                    ),
                    lambda s: s["span_text"],
                ),
                " ",
            ).alias("text_dedup"),
        )
        .select("doc_id", "n_spans", "n_dropped", "text_dedup")
    )


def _doc_lines(
    docs: DataFrame,
    line_tokens: int | None,
    id_col: str,
    text_col: str,
    hash_lines: bool,
) -> tuple[DataFrame, str]:
    """(doc_id, line_idx, line_text, __k) explode shared by the
    line-dedup family; returns (lines, reassembly joiner)."""
    if line_tokens is None:
        parts = F.split(F.col(text_col), "\n")
        lines = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(parts).alias("line_idx", "line_text"),
        )
        joiner = "\n"
    else:
        stride = line_tokens
        toks = tokens(F.col(text_col))
        n = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
        lines = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.transform(
                    starts,
                    lambda s: F.struct(
                        (s / stride).cast("bigint").alias("line_idx"),
                        F.array_join(
                            F.slice(toks, s + 1, line_tokens), " "
                        ).alias("line_text"),
                    ),
                )
            ).alias("ln"),
        ).select("doc_id", "ln.line_idx", "ln.line_text")
        joiner = " "
    key = F.xxhash64("line_text") if hash_lines else F.col("line_text")
    return lines.withColumn("__k", key), joiner


def line_dedup(
    docs: DataFrame,
    min_docs: int = 5,
    line_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_lines: bool = False,
) -> DataFrame:
    """CCNet/MassiveText-style boilerplate LINE removal: drop every
    line that occurs in at least ``min_docs`` DISTINCT documents,
    from every document (headers, footers, nav bars, cookie banners
    — Wenzek et al. 2019 arXiv:1911.00359 §3.1 dedups at the
    paragraph level the same way; Gopher's MassiveText repeats it
    per line). Complements :func:`span_dedup` (which keeps the
    FIRST occurrence of any repeated span): frequency-threshold
    removal deletes boilerplate from ALL copies, including the
    first — the right call when the repeated text is noise, not
    content.

    ``line_tokens=None`` splits on newline — the real-corpus mode.
    The synthetic corpus is single-line, so the registry query uses
    ``line_tokens=k``: consecutive k-token windows stand in as
    "lines" (identical machinery, engine-portable segmentation
    mirrored in the SQL oracle).

    Scale shape: map-only line explode (no row multiplication
    beyond 1/k), ONE shuffle on the line key for the distinct-doc
    frequency count (map-side partial agg), one line-keyed join to
    mark boilerplate (AQE broadcasts the frequent-line set when it
    is small — it always is relative to the corpus: it holds only
    lines repeated ≥ min_docs times), one doc-keyed aggregate to
    reassemble. ``hash_lines=True`` keys the count and join on
    ``xxhash64(line)`` — fixed-width 8-byte shuffle rows, the
    100 TB default; collisions over-delete one line in ~n²/2⁶⁴
    (same trade as span_dedup's ``hash_spans``).

    Docs never vanish: a fully-boilerplate doc emits an empty
    ``text_clean``. Emits (doc_id, n_lines, n_removed, text_clean).
    """
    lines, joiner = _doc_lines(docs, line_tokens, id_col, text_col, hash_lines)
    boiler = (
        lines.groupBy("__k")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__k", F.lit(1).alias("__boiler"))
    )
    marked = lines.join(boiler, "__k", "left")
    return _reassemble_lines(marked, joiner)


def _reassemble_lines(marked: DataFrame, joiner: str) -> DataFrame:
    """Doc-keyed reassembly of surviving lines; one shuffle."""
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("__boiler").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct("line_idx", "line_text"),
                            )
                        )
                    ),
                    lambda s: s["line_text"],
                ),
                joiner,
            ).alias("text_clean"),
        )
        .select("doc_id", "n_lines", "n_removed", "text_clean")
    )


def line_freq_index(
    docs: DataFrame,
    line_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_lines: bool = False,
) -> DataFrame:
    """Line-frequency index for :func:`line_dedup_incremental`:
    (``__k`` line key, ``n_docs`` distinct-document count). Built
    once over the existing corpus, persisted, merged per batch with
    :func:`line_freq_merge` — the same build-once-probe-forever
    contract as ``minhash_band_index``. With ``hash_lines=True`` the
    index stores ONLY 8-byte keys (no line text) — at 100 TB the
    index is the distinct-line relation, orders of magnitude smaller
    than the corpus."""
    lines, _ = _doc_lines(docs, line_tokens, id_col, text_col, hash_lines)
    return lines.groupBy("__k").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )


def line_freq_merge(index_a: DataFrame, index_b: DataFrame) -> DataFrame:
    """Merge two line-frequency indexes by summing counts — exact
    when the underlying document sets are disjoint (the ingestion-
    batch contract; overlapping sets over-count shared lines)."""
    return (
        index_a.unionByName(index_b)
        .groupBy("__k")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )


def line_dedup_incremental(
    batch: DataFrame,
    index: DataFrame,
    min_docs: int = 5,
    line_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_lines: bool = False,
) -> DataFrame:
    """Incremental boilerplate-line removal: clean a NEW ingestion
    batch against the line frequencies of the EXISTING corpus plus
    the batch itself — the production shape of :func:`line_dedup` at
    100 TB, where re-exploding the whole corpus per daily crawl is
    impossible.

    A line is boilerplate when (index count + batch count) >=
    ``min_docs`` — exactly what full ``line_dedup`` over
    corpus ∪ batch would decide (pytest-pinned), because counts are
    additive over disjoint doc sets. Cost: the batch is exploded
    fresh (batch-sized); its distinct line keys probe the index via
    a key join (AQE broadcasts the batch side when it is small —
    the incremental_dedup_minhash shape); the existing corpus text
    is never re-read. Fold the batch into the index afterward with
    ``line_freq_merge(index, line_freq_index(batch, ...))``. The
    index MUST have been built with the same ``line_tokens`` and
    ``hash_lines`` as the probe — keys from mismatched settings
    simply never match (every line then looks novel), so pin both
    parameters wherever the index is persisted.

    Emits the cleaned BATCH docs only: (doc_id, n_lines, n_removed,
    text_clean).
    """
    lines, joiner = _doc_lines(batch, line_tokens, id_col, text_col, hash_lines)
    batch_counts = lines.groupBy("__k").agg(
        F.countDistinct("doc_id").alias("__nb")
    )
    combined = (
        batch_counts.join(
            index.select("__k", F.col("n_docs").alias("__ni")), "__k", "left"
        )
        .where(
            F.coalesce(F.col("__ni"), F.lit(0)) + F.col("__nb") >= min_docs
        )
        .select("__k", F.lit(1).alias("__boiler"))
    )
    marked = lines.join(combined, "__k", "left")
    return _reassemble_lines(marked, joiner)


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    unit: str = "doc",
    k: int = 3,
) -> DataFrame:
    """Pairwise content overlap between sources: for every unordered
    source pair, how many distinct content keys appear in BOTH, and
    the Jaccard of their key sets — the mirror-detection matrix
    (which crawl dumps are re-scrapes of each other) that decides
    which sources to drop wholesale before any per-doc dedup runs.

    ``unit="doc"`` keys on the whole-document
    md5(lower(trim(text))) hash of :func:`dedup_exact` (strict
    mirrors only); ``unit="shingle"`` keys on distinct word
    ``k``-grams — the containment-style signal that catches partial
    re-scrapes and survives boilerplate edits that break exact
    hashing. Either way the (key, source) projection is DISTINCT
    first — the self-join on the content key multiplies per-key
    source-list sizes (bounded by #sources, typically tens), never
    per-key doc counts; a key repeated a million times inside one
    crawl contributes one row. One distinct-shuffle, one hash-join
    on the content key, one #sources^2-bounded aggregate, and a
    broadcast of the per-source set sizes. Emits
    (source_a < source_b, n_shared, n_a, n_b, jaccard) with jaccard
    rounded to 6 decimals.
    """
    if unit == "doc":
        keyed = df.select(
            F.md5(F.lower(F.trim(F.col(text_col)))).alias("__h"),
            F.col(source_col).alias("__s"),
        )
    elif unit == "shingle":
        keyed = df.select(
            F.explode(shingles(tokens(F.col(text_col)), k)).alias("__h"),
            F.col(source_col).alias("__s"),
        )
    else:
        raise ValueError(f"unknown unit {unit!r} (want 'doc' or 'shingle')")
    from pyspark.sql.window import Window  # noqa: PLC0415

    # r7: the heavy (key, source) distinct relation is derived ONCE.
    # The previous formulation referenced it three times (sizes +
    # both self-join sides); Spark re-derives each reference — three
    # corpus explodes and distinct shuffles (measured sf1: 15.8 s
    # cold). Instead: per-key sorted source set (bounded by
    # #sources), then ONE map-side expansion emits pair rows AND
    # per-source size rows (as null-partner rows) through the SAME
    # count aggregate; sizes attach to pair rows via two windows
    # over the tiny (<= 2|S| + |S|^2)-row counts relation — bounded
    # partitions, never corpus-sized (measured sf1: 15.8 -> ~5 s).
    hs = keyed.distinct()
    ss = F.col("ss")
    pair_elems = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + 2, F.size(ss)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    null_s = F.lit(None).cast("string")
    size_a = F.transform(
        ss, lambda x: F.struct(x.alias("a"), null_s.alias("b"))
    )
    size_b = F.transform(
        ss, lambda x: F.struct(null_s.alias("a"), x.alias("b"))
    )
    counts = (
        hs.groupBy("__h")
        .agg(F.sort_array(F.collect_set("__s")).alias("ss"))
        .select(
            F.explode(F.concat(size_a, size_b, pair_elems)).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    return (
        counts.withColumn(
            "n_a", F.max(F.when(F.col("b").isNull(), F.col("n"))).over(w_a)
        )
        .withColumn(
            "n_b", F.max(F.when(F.col("a").isNull(), F.col("n"))).over(w_b)
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            F.col("n").alias("n_shared"),
            "n_a",
            "n_b",
            F.round(
                F.col("n")
                / (F.col("n_a") + F.col("n_b") - F.col("n")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def dedup_bow(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bag-of-words dedup: group docs whose sorted token multiset is
    identical — the near-dup class exact hashing misses (templated /
    shuffled boilerplate, reordered list pages) and shingle methods
    over-pay for (word order is exactly what BoW ignores).

    Key = md5 of the sorted token list (multiplicity kept: a doc
    repeating a word twice is NOT the doc saying it once); keeper =
    min id, same contract as :func:`dedup_exact`. One map-only
    projection (sort happens per row inside the codegen'd
    sort_array, never a shuffle) + one groupBy.
    """
    h = F.md5(F.array_join(F.sort_array(tokens(F.col(text_col))), " "))
    return (
        df.select(F.col(id_col), h.alias("bow_hash"))
        .groupBy("bow_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_doc_id"),
        )
    )


def dup_degree_report(
    pairs: DataFrame,
    top_k: int = 20,
) -> DataFrame:
    """Hub diagnostic over a candidate near-dup pair relation: each
    doc's degree (how many docs it pairs with) for the ``top_k``
    most-connected docs — the boilerplate detector (a nav page or
    licence stub pairs with EVERYTHING; clustering such hubs into
    components merges half the corpus, so you want them surfaced
    and special-cased BEFORE running connected components).

    Degree = symmetric count over the (doc_a < doc_b) pair relation
    (explode each pair into both endpoints — map-side, 2× pairs
    rows, never corpus-sized); top-k via sort-limit heaps, rank over
    the k survivors only. Emits (doc_id, degree, rank).
    """
    from pyspark.sql.window import Window

    ends = pairs.select(
        F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id")
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    top = deg.orderBy(F.col("degree").desc(), F.col("doc_id")).limit(top_k)
    w = Window.orderBy(F.col("degree").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "rank", "doc_id", "degree"
    )


def dup_weighting(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_iter: int = 15,
    components: DataFrame | None = None,
) -> DataFrame:
    """SOFT dedup: every doc kept, weighted 1/|near-dup cluster| —
    the alternative to hard dropping that several pretraining
    recipes prefer (a family of m near-copies contributes one doc's
    worth of expected gradient mass without discarding the phrasing
    variation cluster_keep_best would). Downstream, the weight
    feeds importance_sample / temperature mixing as a per-doc
    multiplier, or loss weighting directly.

    Composition: :func:`dedup_clusters` components (exact-Jaccard
    edges at ``threshold``, two-stars contraction) → one
    component-keyed size count → join back. The size groupBy and
    the join share the component_id exchange; singletons (their own
    component) get weight 1 by construction. The weight is ONE
    IEEE division of exact BIGINTs rounded to 6 decimals —
    engine-deterministic (the source_temperature_sample rate
    convention).

    Emits (doc_id, component_id, cluster_size, weight).

    A pipeline that already ran :func:`dedup_clusters` passes the
    (doc_id, component_id) relation via ``components`` instead of
    re-deriving the pair relation — the same pass-through contract
    as :func:`cluster_keep_best` and
    :func:`~.sampling.leakage_safe_split`, and the reason the
    composed ``dedup_pipeline`` pays the two-stars contraction once.
    """
    comp = (
        components
        if components is not None
        else dedup_clusters(
            df,
            text_col=text_col,
            id_col=id_col,
            k=k,
            threshold=threshold,
            max_iter=max_iter,
        )
    )
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return comp.join(sizes, "component_id").select(
        "doc_id",
        "component_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size").cast("double"), 6).alias(
            "weight"
        ),
    )


def exact_substring_spans(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Exact-substring duplicate spans, Lee et al. style (arXiv:
    2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): every OVERLAPPING ``k``-token window that occurs at
    least ``min_count`` times in the corpus (any doc, any offset —
    within-doc self-repetition counts) marks its positions
    duplicated, and per doc the duplicated window intervals merge
    into maximal contiguous ranges — the spans that paper trims
    before training (memorization-prone boilerplate, licenses,
    mirrored passages at arbitrary offsets, which span_dedup's
    NON-overlapping C4 grid misses when copies are shifted).

    The paper builds a suffix array; the relational equivalent is
    stride-1 shingles + one count aggregate + gaps-and-islands: a
    position is duplicated iff its shingle's corpus count >=
    min_count, and intervals [p, p+k) merge while the next start is
    <= the running coverage end (adjacent-or-overlapping — one
    contiguous duplicated range, the documented union semantics).

    Scale shape: the explode is ~n_tokens rows (stride 1 — the cost
    the algorithm IS), collapsed by ONE map-combined count on the
    shingle key; the join back is co-partitioned on that key (AQE
    reuses the exchange), and the island windows partition by doc.
    Default keys are exact shingle text (collisionless, twin-
    identical); ``hash_grams=True`` keys count+join on xxhash64 —
    8-byte shuffle rows, over-mark odds ~n²/2⁶⁴, the span_dedup
    100 TB trade (both paths pinned identical at test scale).

    Emits (doc_id, span_start, span_end, span_tokens) in token
    positions, end exclusive — the trim plan, not the mutation
    (callers slice text downstream; emitting positions keeps the
    relation narrow and the operator composable with chunkers).
    """
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(shingles(toks, k, distinct=False)).alias(
            "pos", "__gram"
        ),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        (
            F.xxhash64("__gram") if hash_grams else F.col("__gram")
        ).alias("__key"),
    )
    dup_keys = (
        g.groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_count)
        .select("__key")
    )
    d = g.join(dup_keys, "__key").select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    new_island = F.when(
        F.col("__prevmax").isNull()
        | (F.col("pos") > F.col("__prevmax") + k),
        F.lit(1),
    ).otherwise(F.lit(0))
    isl = (
        d.withColumn("__prevmax", F.max("pos").over(w_prev))
        .withColumn("__new", new_island)
        .withColumn("__island", F.sum("__new").over(w_run))
    )
    return (
        isl.groupBy("doc_id", "__island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + k).cast("bigint").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start"))
            .cast("bigint")
            .alias("span_tokens"),
        )
    )
