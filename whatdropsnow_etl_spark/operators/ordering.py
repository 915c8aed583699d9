"""Deterministic training-order operators: epoch shuffle and
source interleaving.

A training run consumes the corpus in a specific order, and that
order is part of the experiment: it must be reproducible bit-for-bit
(resume from a checkpoint, re-run an ablation) and statistically
"shuffled" (no long same-source runs that make gradients stale).
Both operators here derive the order from content-independent
hashes, so every engine, every run, and every cluster layout
produces the identical ordering — the same determinism contract as
the sampling family (sampling.py).

Scale pattern shared by both: a global rank is NEVER computed with a
corpus-wide single-partition window. The order key is an md5 hash,
so its 2-hex-char PREFIX partitions the key space into 256 buckets
that the full-key sort already visits in prefix order. rank =
(running count of earlier buckets) + (rank within own bucket):
phase 1 builds the per-(group, bucket) count histogram — a
model-sized relation — and phase 2 ranks only within (group,
bucket), parallel across groups x 256 buckets. This is the
balanced_shards rank trick (sampling.py:405) applied to hash-ordered
ranks; the DuckDB oracle twin stays the naive one-window ROW_NUMBER
over the identical (key, id) order, which proves the decomposition
exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _join_nullsafe(
    left: DataFrame, right: DataFrame, cols: list[str]
) -> DataFrame:
    """Inner equi-join on ``cols`` that matches NULL keys to NULL
    keys. The plain using-join these rank decompositions previously
    used silently drops NULL-group rows, while the window twins
    (PARTITION BY) keep a NULL partition — a latent divergence.
    EqualNullSafe is a hash-joinable key, so broadcast hints on
    ``right`` survive. Duplicated right-side key columns are
    renamed before the join and dropped after."""
    renamed = right
    for c in cols:
        renamed = renamed.withColumnRenamed(c, f"__r_{c}")
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    return left.join(renamed, cond).drop(*[f"__r_{c}" for c in cols])


def _bucketed_rank(
    rows: DataFrame, group_cols: list[str], key: str, id_col: str
) -> DataFrame:
    """rank of each row within its group under (key, id) order,
    without a per-group single-task window.

    ``key`` must be an md5-style hex string column so its first two
    characters are a prefix whose lexicographic order agrees with
    the full key's. Adds column ``__rank`` (1-based bigint).
    """
    bucket = F.substring(F.col(key), 1, 2).alias("__bkt")
    rows = rows.withColumn("__bkt", bucket).persist()
    # ^ r10 perf (PERF.md r9 backlog): the bucketed relation feeds
    # the histogram aggregate AND the join-back — Catalyst does not
    # dedupe subplans, so every consumer (epoch_shuffle 10.7 s,
    # interleave_sources 9.3 s at sf1, balanced_shards,
    # training_order_spine) re-ran the whole upstream lineage twice.
    # Lazy persist (the rank_correlation precedent, 28.1 -> 5.2 s).
    gcols = [F.col(c) for c in group_cols]
    hist = rows.groupBy(*gcols, "__bkt").agg(F.count(F.lit(1)).alias("__n"))
    w_hist = (
        Window.partitionBy(*gcols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        *gcols,
        "__bkt",
        F.coalesce(F.sum("__n").over(w_hist), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy(*gcols, "__bkt").orderBy(
        F.col(key), F.col(id_col)
    )
    return (
        _join_nullsafe(rows, F.broadcast(offsets), group_cols + ["__bkt"])
        .withColumn(
            "__rank", (F.col("__off") + F.row_number().over(w_local))
        )
        .drop("__bkt", "__off")
    )


def epoch_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seed-keyed epoch shuffle with shard assignment:
    (id, shard, pos) such that reading shard 0 pos 1..k, shard 1
    pos 1..k, ... visits the corpus in a pseudo-random order that is
    a pure function of (seed, id).

    Each epoch passes a new ``seed`` for a fresh permutation;
    resuming mid-epoch is just "skip to (shard, pos)". The order key
    is ``md5(seed || ':' || id)``; the shard is the low bits of the
    numeric form of the SAME hash (independent of the ordering,
    which uses the full value). Positions within a shard come from
    the prefix-bucket histogram rank (module docstring) — no
    corpus/n_shards-sized sort task: at production scale pick
    n_shards in the thousands AND the rank stays (shard x 256)-way
    parallel regardless.

    Output: (id, shard bigint, pos bigint), pos 1-based per shard.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_shards),
    )
    rows = df.select(
        F.col(id_col), key.alias("__key"), shard.alias("shard")
    )
    ranked = _bucketed_rank(rows, ["shard"], "__key", id_col)
    return ranked.select(
        id_col, F.col("shard"), F.col("__rank").cast("bigint").alias("pos")
    )


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Proportional deterministic source interleave: assign every
    row an ``interleave_key`` double such that reading the corpus in
    key order mixes all sources at their corpus-wide rates from the
    very first batch — every prefix of the ordering holds ~its fair
    share of each source (within one row per source).

    Classic stride scheduling: row r of n_s rows in source s gets
    key (r - 0.5) / n_s, spreading each source uniformly over (0,1).
    A 90%-web/10%-code corpus then yields ~9 web docs between
    consecutive code docs instead of the head-of-corpus clumping a
    plain hash shuffle gives small sources. Within a source the
    order is the usual deterministic md5(id) permutation.

    The per-source rank uses the prefix-bucket histogram trick
    (module docstring) — sources are few and huge at 100 TB, exactly
    the shape where a naive per-source window collapses to one task
    per source (the quota_sample lesson, sampling.py:360). The key
    arithmetic is two IEEE double ops on exact integers, so both
    engines emit bit-identical keys.

    Output: (id, source, src_rank bigint, interleave_key double).
    """
    h = F.md5(F.col(id_col).cast("string"))
    rows = df.select(F.col(id_col), F.col(source_col), h.alias("__key"))
    ranked = _bucketed_rank(rows, [source_col], "__key", id_col)
    counts = (
        rows.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_src"))
    )
    out = ranked.join(F.broadcast(counts), source_col)
    key = (F.col("__rank").cast("double") - F.lit(0.5)) / F.col(
        "__n_src"
    ).cast("double")
    return out.select(
        F.col(id_col),
        F.col(source_col),
        F.col("__rank").cast("bigint").alias("src_rank"),
        key.alias("interleave_key"),
    )


def _boundary_expr(n_buckets: int, arr_col: str, n_col: str):
    """n_buckets-1 type-1 sample-quantile boundaries as ONE array
    Column, from a 1-row (sorted sample array, sample count)
    aggregate — the shared sample-sort bucketing primitive
    (percentile_rank and rank_correlation both cut on it)."""
    return F.array(
        *[
            F.when(
                F.col(n_col) > 0,
                F.element_at(
                    arr_col,
                    (
                        F.floor(F.lit(i / n_buckets) * (F.col(n_col) - 1))
                        + 1
                    ).cast("int"),
                ),
            )
            for i in range(1, n_buckets)
        ]
    )


def _bucket_of(bounds_col: str, value_col: str):
    """bucket(v) = #{boundaries <= v} via a broadcast array filter —
    map-only; equal values always share a bucket (<= rule), so ties
    never span buckets and rank decompositions stay exact."""
    return F.size(
        F.filter(F.col(bounds_col), lambda b: b <= F.col(value_col))
    )


def percentile_rank(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    sample_k: int = 1024,
) -> DataFrame:
    """Exact percentile rank of a numeric column, globally or per
    group — the feature-normalization pass behind curriculum
    ordering, per-source quality cutoffs ("keep the top 20% of each
    crawl"), and rank features for ranking models.

    pct_rank = (rank - 1) / (n - 1) over the total order
    (value, id) — the SQL PERCENT_RANK convention with the repo's
    deterministic id tiebreak, so the answer is a pure function of
    the data.

    Scale shape — the SAMPLE-SORT rank: a per-group window would
    put each group in one task (the quota_sample lesson), and the
    md5-prefix trick (module docstring) doesn't apply because the
    order key here is a VALUE with unknown distribution. Instead
    the value space is partitioned by boundaries taken from a
    deterministic bottom-k-by-md5(id) sample (the
    quantile_bucketize contract): bucket(v) = #{boundaries <= v}
    via a broadcast array_filter (map-only), so each bucket holds
    ~n/n_buckets rows REGARDLESS of the value distribution, up to
    sample-rank error. Ranks then decompose exactly as
    (running count of earlier buckets) + (rank within own bucket):
    the histogram is (groups x buckets)-sized, and the only
    windows run over it and over (group, bucket) sub-partitions.
    Equal values always share a bucket (<= rule), so cross-bucket
    order is strict and the decomposition is exact — pinned in
    pytest against the naive single window. Caveat: a group whose
    values are ALL equal collapses into one (group, bucket) task —
    ties are unsplittable under a value order (the id tiebreak
    inside a tie region has no value boundary to cut on); heavy-tie
    columns should rank a composite (value, secondary) instead.

    Output: (id, [group], value, pct_rank double); single-row
    groups emit 0.0.
    """
    gcols = [group_col] if group_col else []
    rows = df.select(
        F.col(id_col), *gcols, F.col(value_col).alias("__v")
    ).where(F.col("__v").isNotNull())
    # boundaries from the deterministic global sample: bottom-k rows
    # by md5(id), type-1 quantiles at i/n_buckets
    samp = (
        rows.select("__v", F.md5(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h", "__v")
        .limit(sample_k)
    )
    arr = samp.agg(
        F.array_sort(F.collect_list("__v")).alias("__arr"),
        F.count(F.lit(1)).alias("__n"),
    )
    bounds = arr.select(
        _boundary_expr(n_buckets, "__arr", "__n").alias("__bnds")
    )
    bucketed = rows.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col),
        *gcols,
        F.col("__v"),
        _bucket_of("__bnds", "__v").alias("__bkt"),
    )
    hist = bucketed.groupBy(*gcols, "__bkt").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*[F.col(c) for c in gcols])
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*[F.col(c) for c in gcols])
    offsets = hist.select(
        *gcols,
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_tot).alias("__n_grp"),
    )
    w_local = Window.partitionBy(
        *[F.col(c) for c in gcols], F.col("__bkt")
    ).orderBy("__v", id_col)
    ranked = _join_nullsafe(
        bucketed, F.broadcast(offsets), gcols + ["__bkt"]
    ).withColumn("__rank", F.col("__off") + F.row_number().over(w_local))
    return ranked.select(
        F.col(id_col),
        *gcols,
        F.col("__v").alias(value_col),
        F.when(
            F.col("__n_grp") > 1,
            (F.col("__rank") - 1).cast("double")
            / (F.col("__n_grp") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
    )


def _rank_from_buckets(bucketed: DataFrame, gcols: list[str]) -> DataFrame:
    """Doubled tie-average rank from a pre-bucketed
    (gcols…, __id, __v, __bkt) relation as an exact BIGINT:
    ar2(v) = 2·min_rank(v) + tie_count(v) − 1 (doubling keeps the
    half-integer average exact). rank = per-group bucket offset +
    within-(group, bucket) rank at VALUE grain — ties collapse
    before any window runs, and no corpus- or group-wide
    single-partition window exists (the percentile_rank
    decomposition). Emits (gcols…, __id, __ar2)."""
    vals = bucketed.groupBy(*gcols, "__bkt", "__v").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*[F.col(c) for c in gcols])
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = vals.groupBy(*gcols, "__bkt").agg(F.sum("__cnt").alias("__bc"))
    offsets = hist.select(
        *gcols,
        "__bkt",
        F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).alias("__off"),
    )
    w_less = (
        Window.partitionBy(*[F.col(c) for c in gcols], F.col("__bkt"))
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked_vals = (
        vals.withColumn(
            "__less", F.coalesce(F.sum("__cnt").over(w_less), F.lit(0))
        )
        .transform(
            lambda d: _join_nullsafe(
                d, F.broadcast(offsets), gcols + ["__bkt"]
            )
        )
        .select(
            *gcols,
            "__bkt",
            "__v",
            (
                2 * (F.col("__off") + F.col("__less"))
                + F.col("__cnt")
                + 1
            ).cast("bigint").alias("__ar2"),
        )
    )
    return _join_nullsafe(
        bucketed, ranked_vals, gcols + ["__bkt", "__v"]
    ).select(*gcols, "__id", "__ar2")


def rank_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    n_buckets: int = 64,
    sample_k: int = 1024,
) -> DataFrame:
    """Exact Spearman rank correlation between two numeric columns —
    the scorer-swap validation a curation pipeline runs before
    replacing a quality model: if the new scorer rank-orders the
    corpus like the old one (rho ≈ 1), downstream cutoffs and mixes
    are preserved; a drop says the swap re-curates the dataset.
    With ``group_col``, one rho per group — the per-source drift
    monitor ("which domains would the new scorer re-curate?").

    Tie handling is EXACT: Spearman-with-ties is Pearson over
    tie-averaged ranks, so each side's doubled average rank (an
    exact BIGINT — doubling keeps half-integer tie averages exact)
    feeds exact DECIMAL(38) moment sums (n, Σx, Σy, Σxx, Σyy, Σxy;
    exact to ~1e9 rows since ar2 ≤ 2n), and
    rho = (nΣxy − ΣxΣy) / (sqrt(nΣxx − Σx²) · sqrt(nΣyy − Σy²))
    is three correctly-rounded casts, two IEEE-correctly-rounded
    sqrts, one multiply and one divide — bit-identical across
    engines (the exact_avg contract extended by sqrt, which IEEE 754
    requires correctly rounded).

    Scale shape: ONE deterministic bottom-k-by-md5(id) sample pass
    yields BOTH sides' bucket boundaries (the shared
    percentile_rank sample-sort primitives _boundary_expr /
    _bucket_of), one map-only cross against the 1-row boundary pair
    buckets both columns, and each side's ranks decompose via
    _rank_from_buckets (per-group bucket offsets + VALUE-grain
    within-bucket windows — ties collapse before any window, no
    corpus- or group-wide single-partition window). The two rank
    relations join back on (group, id) and reduce to a groups-sized
    moment aggregate. The DuckDB oracle twin is the naive
    single-sort RANK() formulation, which proves the decomposition
    exact.

    Emits one row per group (ONE row when ungrouped):
    (group?, n_rows, rho). Rows with a NULL on either side are
    dropped (pairwise-complete convention); rho is NULL for a group
    with a constant side (zero rank variance).
    """
    gcols = [group_col] if group_col else []
    rows = df.select(
        *gcols,
        F.col(id_col).alias("__id"),
        F.col(x_col).alias("__vx"),
        F.col(y_col).alias("__vy"),
    ).where(F.col("__vx").isNotNull() & F.col("__vy").isNotNull())
    samp = (
        rows.select(
            "__vx", "__vy", F.md5(F.col("__id").cast("string")).alias("__h")
        )
        .orderBy("__h", "__vx", "__vy")
        .limit(sample_k)
    )
    arr = samp.agg(
        F.array_sort(F.collect_list("__vx")).alias("__ax"),
        F.array_sort(F.collect_list("__vy")).alias("__ay"),
        F.count(F.lit(1)).alias("__n"),
    )
    bounds = arr.select(
        _boundary_expr(n_buckets, "__ax", "__n").alias("__bx"),
        _boundary_expr(n_buckets, "__ay", "__n").alias("__by"),
    )
    bucketed = rows.crossJoin(F.broadcast(bounds)).select(
        *gcols,
        "__id",
        "__vx",
        "__vy",
        _bucket_of("__bx", "__vx").alias("__bktx"),
        _bucket_of("__by", "__vy").alias("__bkty"),
    ).persist()
    # ^ r9 perf: the two rank decompositions below reference this
    # relation ~8 times (vals/hist/offsets/join-back per side), and
    # Catalyst does NOT dedupe common subplans — each reference
    # re-ran the WHOLE upstream lineage (at sf1 the registry input
    # re-tokenized 500k documents eight times: 28.1 s; cached it is
    # computed once per execution — the classifier.py feature-matrix
    # precedent, lazy persist so no job runs at plan-build time).
    # The relation is narrow (id + 2 values + 2 bucket ints).
    rx = _rank_from_buckets(
        bucketed.select(
            *gcols,
            "__id",
            F.col("__vx").alias("__v"),
            F.col("__bktx").alias("__bkt"),
        ),
        gcols,
    ).withColumnRenamed("__ar2", "__x")
    ry = _rank_from_buckets(
        bucketed.select(
            *gcols,
            "__id",
            F.col("__vy").alias("__v"),
            F.col("__bkty").alias("__bkt"),
        ),
        gcols,
    ).withColumnRenamed("__ar2", "__y")
    j = rx.join(ry, gcols + ["__id"])
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = j.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("__x")).alias("sx"),
        F.sum(dec("__y")).alias("sy"),
        F.sum(dec("__x") * dec("__x")).alias("sxx"),
        F.sum(dec("__y") * dec("__y")).alias("syy"),
        F.sum(dec("__x") * dec("__y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        *gcols,
        F.col("n").cast("bigint").alias("n_rows"),
        F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        ).alias("rho"),
    )


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    group_col: str | None = None,
    scale: int = 1000000,
) -> DataFrame:
    """Two-objective Pareto frontier (skyline) per group: keep every
    row NOT dominated by another row on (x, y) — j dominates i when
    x_j >= x_i AND y_j >= y_i with at least one strict. The
    multi-objective curation primitive ("quality vs novelty",
    "quality vs length") behind any keep-the-efficient-set policy:
    a scalar weighted score forces one trade-off, the frontier
    keeps every non-dominated trade-off for downstream mixing.

    No reference twin — the reference (397 LoC ETL) has no
    selection logic; extends SURVEY §2.3's ordering family.

    Never the O(n²) dominance join: both objectives quantize to
    integer ``scale``-ths (the distribution_shift_report convention,
    engine-identical), the input collapses to the per-(group, x)
    max-y histogram in ONE map-combined aggregate, and a row
    survives iff y == max{y | same x} AND y > max{y | strictly
    larger x} — the second max is a cumulative window over the
    x-DISTINCT histogram ordered descending, so window input is
    histogram-sized, never raw rows. Equal (x, y) points do not
    dominate each other (no strict coordinate): all co-located
    frontier copies survive, deterministically.

    Output: (group?, id_col, x, y) — the surviving rows with their
    quantized objectives.
    """
    gcols = [group_col] if group_col is not None else []
    q = df.select(
        *gcols,
        F.col(id_col),
        F.round(F.col(x_col) * scale, 0).cast("long").alias("x"),
        F.round(F.col(y_col) * scale, 0).cast("long").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    hx = q.groupBy(*gcols, "x").agg(F.max("y").alias("__my"))
    w_gt = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep_x = (
        hx.withColumn("__best_gt", F.max("__my").over(w_gt))
        .where(
            F.col("__best_gt").isNull()
            | (F.col("__my") > F.col("__best_gt"))
        )
        .select(*gcols, "x", F.col("__my").alias("y"))
    )
    return q.join(keep_x, [*gcols, "x", "y"]).select(
        *gcols, id_col, "x", "y"
    )
