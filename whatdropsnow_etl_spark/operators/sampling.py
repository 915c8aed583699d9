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
    banded = (
        df
        # empty/NULL text has an UNDEFINED quality (its ratios divide
        # by zero): left in, the NULL score would land in the TOP
        # band (F.least skips NULLs → band n-1) and empty docs could
        # fill the best-quality stratum; they are excluded instead
        .where(F.length(F.lower(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.round(q, 6).alias("quality"),
            F.least(
                F.floor(q * n_bands).cast("bigint"), F.lit(n_bands - 1)
            ).alias("band"),
        )
    )
    w = Window.partitionBy("band").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        banded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_per_band)
        .select(id_col, "band", "quality")
    )


def _rate_hex(rate: float) -> str:
    """The 8-hex-char threshold whose lexicographic compare against
    substr(md5(id), 1, 8) keeps exactly `rate` of a uniform hash.
    String compare of lowercase hex == numeric compare, and behaves
    identically in every engine — no hex parsing required."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    if rate >= 1.0:
        # 'g' sorts after every 8-hex-char string, so `frac < 'g'` is
        # always true — a capped threshold of 'ffffffff' would drop
        # the ~1-in-4.3B docs whose md5 prefix is exactly that even
        # at a 100% keep rate
        return "g"
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def source_mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic Bernoulli mixing: keep each doc with its
    source's target rate — how training mixtures are rebalanced
    (upweight curated sources, downsample crawl).

    Membership is a pure per-row predicate on md5(id) vs a per-source
    hex threshold: no shuffle, no window, no RNG state — the sample
    is reproducible across engines/runs/partitionings, and the SAME
    doc stays in or out as the corpus grows (stable under append,
    unlike fraction-of-partition sampling). Pushed down to the scan
    where the source column allows row-group skipping.
    """
    frac = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    rate = None
    for src, r in sorted(weights.items()):
        cond = F.col(source_col) == src
        branch = F.lit(_rate_hex(r))
        rate = F.when(cond, branch) if rate is None else rate.when(cond, branch)
    rate = F.lit(_rate_hex(default_rate)) if rate is None else rate.otherwise(
        F.lit(_rate_hex(default_rate))
    )
    return df.where(frac < rate).select(id_col, source_col)


def source_temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    target_rows: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-rebalanced corpus mixing: sample so the kept mix
    follows p(source) ∝ n_source^alpha — the standard multilingual /
    multi-source re-weighting (alpha=1 keeps raw proportions,
    alpha→0 approaches uniform-over-sources; XLM-R-style pipelines
    use alpha≈0.3-0.7 so head sources stop drowning the tail).

    Fully distributed, no driver collect: ONE group-count of the
    source column (#sources rows), normalization over that tiny
    relation (an unpartitioned window over a source-count-bounded
    frame), per-source keep rate
    ``q_s = min(1, N · p_s / n_s)`` with ``N`` = ``target_rows`` or
    the corpus size, then a BROADCAST join of the #sources-row rate
    table back onto the corpus and the same md5-vs-hex-threshold
    Bernoulli predicate as source_mix_sample — per-row, shuffle-free
    over the corpus, append-stable, identical across engines.

    Rates cap at 1: tail sources are never replicated (epoch-level
    upsampling is a training-loop concern; this operator decides
    membership). ``q_s`` is rounded to 6 decimals before the hex
    threshold so both engine twins quantize identically (the raw
    rate mixes pow/sum floating point whose last ulp is
    engine-order-dependent).

    Emits (doc_id, source, keep_rate DOUBLE).
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    w_all = Window.partitionBy()
    counts = df.groupBy(F.col(source_col)).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    rates = (
        counts.withColumn("__na", F.pow("__n", F.lit(float(alpha))))
        .withColumn("__z", F.sum("__na").over(w_all))
        .withColumn(
            # NOT "__N": Spark resolves column names case-insensitively
            # by default, so "__N" would silently REPLACE "__n"
            "__budget",
            F.lit(float(target_rows))
            if target_rows is not None
            else F.sum("__n").over(w_all),
        )
        .select(
            source_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("__budget")
                    * (F.col("__na") / F.col("__z"))
                    / F.col("__n"),
                ),
                6,
            ).alias("keep_rate"),
        )
    )
    # rate 1.0 (head sources hit the cap) must keep EVERYTHING: 'g'
    # sorts after any 8-hex prefix (the _rate_hex convention), where
    # a capped 'ffffffff' would drop md5-prefix-'ffffffff' docs
    thr = F.when(F.col("keep_rate") >= 1.0, F.lit("g")).otherwise(
        F.lower(
            F.lpad(
                F.conv(
                    F.least(
                        F.round(F.col("keep_rate") * F.lit(2.0**32)),
                        F.lit(2.0**32 - 1),
                    ).cast("bigint").cast("string"),
                    10,
                    16,
                ),
                8,
                "0",
            )
        )
    )
    frac = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    # NULL-safe join: the groupBy above counts a NULL-source group
    # into the budget/normalizer, so a null-rejecting equi-join would
    # silently drop those docs while still spending their mass —
    # the sample would undershoot target_rows with no warning
    rt = F.broadcast(
        rates.withColumn("__thr", thr).withColumnRenamed(
            source_col, "__src"
        )
    )
    return (
        df.select(id_col, source_col)
        .join(rt, F.col(source_col).eqNullSafe(F.col("__src")))
        .where(frac < F.col("__thr"))
        .select(id_col, source_col, "keep_rate")
    )


def temperature_upsample(
    df: DataFrame,
    alpha: float = 0.5,
    target_rows: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Epoch-level temperature resampling WITH replication — the
    other half of source_temperature_sample, whose rates cap at 1
    and never duplicate. When building an actual training EPOCH at
    mix p(source) ∝ n^alpha, tail sources need rates ABOVE 1:
    each doc emits ``floor(q_s)`` whole copies plus one more iff
    ``md5(id) < frac(q_s)`` (the hex-threshold Bernoulli), so the
    expected per-source row count is exactly ``n_s · q_s`` and the
    epoch totals ``target_rows`` (default: corpus size) in
    expectation.

    Same distributed shape as the capped sampler: one source-count
    aggregate, a #sources-row rate table, broadcast join, then a
    map-side sequence-explode — the corpus never shuffles, copies
    materialize lazily in the scan projection. Deterministic and
    append-stable (a doc's copy count depends only on its id and
    its source's rate). Emits (id, source, copy BIGINT) with copy
    in 1..n_copies — downstream shuffles see distinct (id, copy)
    rows, so replicated docs spread across partitions instead of
    hot-spotting one.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    w_all = Window.partitionBy()
    counts = df.groupBy(F.col(source_col)).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    rates = (
        counts.withColumn("__na", F.pow("__n", F.lit(float(alpha))))
        .withColumn("__z", F.sum("__na").over(w_all))
        .withColumn(
            "__budget",
            F.lit(float(target_rows))
            if target_rows is not None
            else F.sum("__n").over(w_all),
        )
        .select(
            source_col,
            F.round(
                F.col("__budget") * (F.col("__na") / F.col("__z")) / F.col("__n"),
                6,
            ).alias("__q"),
        )
    )
    frac = F.col("__q") - F.floor(F.col("__q"))
    thr = F.lower(
        F.lpad(
            F.conv(
                F.least(
                    F.round(frac * F.lit(2.0**32)), F.lit(2.0**32 - 1)
                ).cast("bigint").cast("string"),
                10,
                16,
            ),
            8,
            "0",
        )
    )
    rates = rates.select(
        source_col,
        F.floor(F.col("__q")).cast("bigint").alias("__base"),
        thr.alias("__thr"),
    )
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    n_copies = F.col("__base") + (h < F.col("__thr")).cast("bigint")
    # NULL-safe join — the source_temperature_sample rationale
    rates = rates.withColumnRenamed(source_col, "__src")
    return (
        df.select(id_col, source_col)
        .join(
            F.broadcast(rates),
            F.col(source_col).eqNullSafe(F.col("__src")),
        )
        .withColumn("__copies", n_copies)
        .where(F.col("__copies") >= 1)
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__copies"))).alias(
                "copy"
            ),
        )
    )


def fixed_size_sample(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Exactly-n deterministic uniform sample: the reservoir-sampling
    use case without reservoir state.

    Order by md5(id) (uncorrelated with content or insertion order)
    and take the first n. Spark compiles sort-limit to TakeOrdered:
    each partition keeps an n-row heap and only heads travel to the
    final merge -- no global sort, no RNG state, no per-partition
    quota bookkeeping; reruns and engine twins pick the identical
    sample. For n large enough to strain a single merge, draw
    per-stratum with :func:`source_mix_sample` rates instead.
    """
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy(F.col("__h"), F.col(id_col))
        .limit(n)
        .select(id_col, *extra_cols)
    )


def leakage_safe_split(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    components: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_iter: int = 15,
    algorithm: str = "twostars",
) -> DataFrame:
    """Leakage-safe train/val/test split: assign whole NEAR-DUP
    COMPONENTS to splits, never individual docs — a doc-level random
    split puts one copy of a duplicated passage in train and its
    twin in test, silently inflating eval (the classic contamination
    bug dedup pipelines exist to prevent; splitting by component
    makes it structurally impossible).

    Components come from :func:`~.dedup.dedup_clusters` (two-stars
    contraction — the 100 TB path) or are passed in precomputed,
    like :func:`~.dedup.cluster_keep_best`. Assignment hashes the
    COMPONENT id through the same md5-hex-threshold trick as
    source_mix_sample: cumulative thresholds over ``ratios`` in
    insertion order, last split takes the remainder. Deterministic,
    shuffle-free past clustering, append-stable: appending docs that
    join no existing component moves NOTHING (component labels and
    hashes are untouched), while a new edge that merges two
    components re-splits exactly those docs together under the
    surviving min label — they may land in a different split, which
    is the correct behavior (the merged component IS one leakage
    class now). Pinned by
    tests/test_llm_ops.py::test_leakage_safe_split_append_stability.

    Emits (doc_id, component_id, split).
    """
    from .dedup import dedup_clusters

    if ratios is None:
        ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(ratios)
    if len(names) < 2:
        raise ValueError("need at least 2 splits")
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {total}")
    comp = (
        components
        if components is not None
        else dedup_clusters(docs, text_col, id_col, k, threshold, max_iter, algorithm)
    )
    u = F.substring(F.md5(F.col("component_id").cast("string")), 1, 8)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += ratios[name]
        branch = F.when(u < F.lit(_rate_hex(cum)), F.lit(name))
        expr = branch if expr is None else expr.when(
            u < F.lit(_rate_hex(cum)), F.lit(name)
        )
    expr = expr.otherwise(F.lit(names[-1]))
    return comp.select("doc_id", "component_id", expr.alias("split"))


def quota_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exactly-``n_per_group`` deterministic sample PER GROUP — the
    per-source quota mode of mix building (cap every source at n
    docs regardless of its raw share; a group smaller than the quota
    contributes everything it has).

    Same md5(id) selection rule as fixed_size_sample, but the cut is
    a SALTED two-phase window instead of one window per group — a
    plain ``Window.partitionBy(group)`` ranks each group in a single
    task, and with the typical handful of sources a 100 TB corpus
    would funnel through ~5 tasks. Phase 1 ranks within
    ``(group, xxhash64(id) % salt_buckets)`` sub-groups — each
    bounded to its local top-``n`` by the md5 order, shrinking every
    group to at most ``salt_buckets * n`` rows while fanning the
    heavy scan across ``groups x salt_buckets`` parallel tasks.
    Phase 2 re-ranks the survivors per group with the SAME
    ``(md5(id), id)`` order and keeps ``n``. The global per-group
    top-n is preserved exactly: every globally-selected row is in
    some salt bucket and is, a fortiori, within that bucket's local
    top-n — so the output is bit-identical to the single-window
    form (pinned by tests/test_sampling_ops.py). Deterministic,
    append-stable per group (a new doc displaces at most one old
    pick in ITS group), engine-twin-exact: the DuckDB oracle stays
    the straightforward one-window QUALIFY.
    """
    # thin wrapper over the factored-out primitive (windows.group_topk
    # IS this algorithm generalized to any total order) — one copy of
    # the salted two-phase invariant to maintain, bit-identical output
    from .windows import group_topk

    order_cols = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    return group_topk(
        df.select(F.col(id_col), F.col(group_col)),
        [group_col],
        order_cols,
        n_per_group,
        id_col,
        salt_buckets=salt_buckets,
    ).select(id_col, group_col)


def balanced_shards(
    df: DataFrame,
    n_shards: int = 8,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-balanced shard assignment: write the corpus into
    ``n_shards`` output shards whose total weight (token/char
    counts) is near-equal — the packing step before a training run,
    where uneven shards turn into straggler data-loader workers.

    Snake (boustrophedon) assignment over the weight-descending
    rank: row r goes to shard ``r % 2k`` if that is < k else
    ``2k-1 - r % 2k``, so each double-round deals every shard one
    heavier and one lighter doc; per-shard totals differ by at most
    a few times the largest single weight, independent of corpus
    size.

    The global rank itself is computed WITHOUT a global sort: the
    order key is ``(weight DESC, md5-bucket, id)``, so rank =
    histogram offset + local rank. Phase 1 builds the
    (weight, bucket) count histogram — a model-sized relation
    (distinct weights x 256 fixed md5-prefix buckets) whose
    running-sum window is trivially cheap; phase 2 ranks rows WITHIN
    each (weight, bucket) group — parallel across groups, each group
    ~1/(distinct_weights*256) of the corpus. No corpus-sized
    single-task window anywhere (the quota_sample lesson). (An
    earlier ``rank_buckets`` knob was dead — the 2-hex-char prefix
    hardcodes 256 — so it was removed rather than left lying.) The DuckDB oracle is
    the naive one-window ROW_NUMBER over the identical order key.
    Deterministic; emits (doc_id, weight, shard).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    w = F.col(weight_col).cast("bigint")
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    rows = df.select(
        F.col(id_col), w.alias("__w"), bucket.alias("__b")
    )
    hist = rows.groupBy("__w", "__b").agg(F.count(F.lit(1)).alias("__n"))
    w_hist = (
        Window.orderBy(F.col("__w").desc(), F.col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        "__w",
        "__b",
        F.coalesce(F.sum("__n").over(w_hist), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__w", "__b").orderBy(F.col(id_col))
    period = 2 * n_shards
    ranked = (
        rows.join(F.broadcast(offsets), ["__w", "__b"])
        .withColumn("__r", F.col("__off") + F.row_number().over(w_local) - 1)
    )
    pos = F.pmod(F.col("__r"), F.lit(period))
    shard = F.when(pos < n_shards, pos).otherwise(F.lit(period - 1) - pos)
    return ranked.select(
        F.col(id_col),
        F.col("__w").alias("weight"),
        shard.cast("bigint").alias("shard"),
    )


def importance_sample(
    df: DataFrame,
    target_frac: float = 0.2,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weight-proportional Bernoulli sampling: keep each doc with
    probability proportional to its weight (token count, quality
    score), scaled so the expected sample is ``target_frac`` of the
    corpus — the token-budget-aware downsampling a mixing pipeline
    uses when docs differ 100x in length and a uniform doc-level
    sample would mis-state the TOKEN mix.

    Per-doc keep rate ``p_i = min(1, f * N * w_i / W)`` (N docs,
    total weight W) rounded to 6 decimals so both engine twins
    quantize identically, then the same md5-hex-threshold predicate
    as source_mix_sample — except the threshold is a computed
    COLUMN, not a literal. One scalar aggregate broadcast back via
    crossJoin; membership is then a map-only predicate: no shuffle
    of the corpus, deterministic, append-stable up to the (N, W)
    rescale. Emits (doc_id, weight, keep_rate).
    """
    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac {target_frac} outside (0, 1]")
    w = F.col(weight_col).cast("double")
    stats = df.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(w).alias("__tw"),
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(target_frac)) * F.col("__n") * w / F.col("__tw"),
        ),
        6,
    )
    # same 'g' escape as source_temperature_sample: heavy docs whose
    # rate caps at 1.0 must never lose the md5-prefix-'ffffffff' row
    thr = F.when(F.col("__rate") >= 1.0, F.lit("g")).otherwise(
        F.lower(
            F.lpad(
                F.conv(
                    F.least(
                        F.round(F.col("__rate") * F.lit(2.0**32)),
                        F.lit(2.0**32 - 1),
                    )
                    .cast("bigint")
                    .cast("string"),
                    10,
                    16,
                ),
                8,
                "0",
            )
        )
    )
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__rate", rate)
        .where(h < thr)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("weight"),
            F.col("__rate").alias("keep_rate"),
        )
    )


def priority_sample(
    df: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Priority sampling (Duffield/Lund/Thorup, JACM '07): a
    weighted WITHOUT-replacement sample of exactly ``k`` rows with
    unbiased subset-sum estimation properties — the principled way
    to keep "k docs, long ones more likely" when Bernoulli rates
    (importance_sample) would give a random-sized sample.

    Priority = weight / u with u ∈ (0,1] derived from md5(id) — so
    the sample is deterministic, append-stable in distribution, and
    engine-twin exact: both engines build the same doubles from the
    same integer hash bits and IEEE division agrees bit-for-bit.
    Selection is a sort-limit on priority (TakeOrdered per-partition
    heaps — no global sort, the fixed_size_sample machinery with a
    weighted key). Emits (doc_id, weight, priority) with priority
    rounded to 6 for display; selection uses the unrounded value
    with an id tiebreak.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(2.0**32)
    prio = F.col(weight_col).cast("double") / u
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("weight"),
            prio.alias("__p"),
        )
        .orderBy(F.col("__p").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "weight", F.round("__p", 6).alias("priority"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    k: int = 100,
) -> DataFrame:
    """DSIR-style importance scores in whole bits (Xie et al.,
    NeurIPS'23 "Data Selection for Language Models via Importance
    Resampling"): score every raw-pool document by how much more
    likely its hashed-unigram bag is under the TARGET domain's
    unigram distribution than under the raw pool's, and keep the k
    best — the standard recipe for carving a Wikipedia-like (or
    code-like, or medical-like) slice out of a web crawl before
    training.

    No reference twin — the reference (397 LoC ETL) has no corpus
    statistics; extends SURVEY §2.3's sampling/selection family.

    The paper's score is Σ_f c_doc[f]·(log θ_target[f] − log
    θ_raw[f]) with add-one smoothing. Here each per-feature
    log-ratio is quantized to WHOLE BITS via exact integer shifts
    (floor(log2((c_t[f]+1)/(c_r[f]+1))) and the Laplace normalizer
    floor(log2((n_r+B)/(n_t+B))), the bigram_surprisal /
    heldout_perplexity determinism argument: libm log differs by
    ulps across engines, integer bit-lengths don't), so the score
    is a BIGINT and the ranking is bit-deterministic. Per-feature
    flooring is the documented quantization — it is NOT the floor
    of the paper's float sum, it is reproducible everywhere.

    Scale shape: one explode+groupBy(doc, bucket) term-frequency
    pass (map-side combined), the two feature-count relations
    collapse to ≤n_buckets rows each and JOIN AS BROADCASTS onto
    the bucket spine, the normalizer is a 1-row broadcast cross
    (the Q11 scalar-subquery pattern), and the global top-k is a
    sort-limit (TakeOrdered — never a global window) with the rank
    assigned by a window over the k-row result. The target relation
    is a domain SAMPLE by construction (the paper uses ~1e5 target
    docs); the raw pool streams through two aggregates.

    Output: (rank 1..k, doc_id, n_tokens, score_bits) ranked by
    (score_bits DESC, doc_id).
    """
    from ..functions.text import tokens
    from .corpus import signed_floor_log2_ratio

    def bucketed(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        ).where(F.col("__tok") != "")
        h = F.md5(F.col("__tok"))
        return toks.select(
            "__id",
            F.pmod(
                F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
                F.lit(n_buckets),
            ).alias("bucket"),
        )

    raw_b = bucketed(docs)
    tgt_b = bucketed(target)
    tf = raw_b.groupBy("__id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    c_raw = raw_b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_r")
    )
    c_tgt = tgt_b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    )
    spine = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    stats = (
        spine.join(F.broadcast(c_tgt), "bucket", "left")
        .join(F.broadcast(c_raw), "bucket", "left")
        .select(
            "bucket",
            (F.coalesce("c_t", F.lit(0)) + 1).alias("__a"),
            (F.coalesce("c_r", F.lit(0)) + 1).alias("__r"),
        )
    )
    bits = stats.select(
        "bucket",
        signed_floor_log2_ratio(F.col("__a"), F.col("__r")).alias("__bits"),
    )
    # Laplace normalizer from the SAME stats relation (totals are
    # Σ(c+1) − B == Σc, so n_r + B == Σ__r): one 1-row broadcast
    norm = stats.agg(
        signed_floor_log2_ratio(
            F.sum("__r").cast("bigint"), F.sum("__a").cast("bigint")
        ).alias("__norm")
    )
    scored = (
        tf.join(F.broadcast(bits), "bucket")
        .groupBy("__id")
        .agg(
            F.sum(F.col("tf") * F.col("__bits")).cast("bigint").alias("__fb"),
            F.sum("tf").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(norm))
        .select(
            F.col("__id"),
            "n_tokens",
            (F.col("__fb") + F.col("n_tokens") * F.col("__norm"))
            .cast("bigint")
            .alias("score_bits"),
        )
    )
    top = scored.orderBy(F.col("score_bits").desc(), F.col("__id")).limit(k)
    w = Window.partitionBy().orderBy(
        F.col("score_bits").desc(), F.col("__id")
    )
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col("__id").alias(id_col),
        "n_tokens",
        "score_bits",
    )
