"""Exact per-group quantiles via window-rank selection.

Distributed selection without collecting: rank every value inside
its group (one hash-partition shuffle + in-partition sort), then
pick the type-1 quantile ranks with a conditional MAX aggregate.
Both the ranking and the rank arithmetic are integer/IEEE-exact, so
the result is bitwise reproducible across engines — unlike
interpolated percentiles, where ``lower + frac*(upper-lower)`` vs
``(1-frac)*lower + frac*upper`` differ by an ulp between
implementations.

Scale: the window sorts each group inside its partition — fine
while a single group's rows fit an executor (events-by-type at
100 TB: salt-pre-aggregate first or switch to approx_percentile,
whose t-digest is mergeable map-side; this operator is the exact
twin). Values are ranked as integer cents so ties and comparisons
carry no float ambiguity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Type-1 (lower) quantiles of ``value_col`` per group.

    Output: group cols + one ``p{NN}_cents`` BIGINT per requested
    quantile, where cents = ROUND(value * scale). Rank of quantile
    p over n rows is ``floor(p*(n-1)) + 1`` — the value AT that
    rank, never an interpolation.
    """
    cents = F.round(F.col(value_col) * scale, 0).cast("long").alias("__cents")
    order = [F.col("__cents")]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w_rank = Window.partitionBy(*group_cols).orderBy(*order)
    w_grp = Window.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, cents, *( [tiebreak_col] if tiebreak_col else [] ))
        # NULL values are not ranked: NULLS-FIRST ordering would
        # shift every quantile down and let p_low land ON a NULL
        # (the _bottom_k_cents convention — quantiles are over the
        # REAL values; both twins filter identically)
        .where(F.col("__cents").isNotNull())
        .withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("__n", F.count(F.lit(1)).over(w_grp))
    )

    def pick(p: float) -> Column:
        target = (F.floor(F.lit(p) * (F.col("__n") - 1)) + 1).cast("long")
        label = f"p{str(p).replace('0.', '').ljust(2, '0')}_cents"
        return F.max(
            F.when(F.col("__rn") == target, F.col("__cents"))
        ).alias(label)

    return ranked.groupBy(*group_cols).agg(*[pick(p) for p in ps])


def _bottom_k_cents(
    df: DataFrame, value_col: str, id_col: str, k: int, scale: int
) -> DataFrame:
    """Deterministic bottom-k-by-md5(id) sample of NON-NULL integer
    cents, as one (`__arr` sorted-ascending, `__n`) aggregate row —
    the shared sampling kernel of sampled_quantiles and
    quantile_bucketize. NULL values are excluded BEFORE the cut
    (collect_list drops NULLs but a count would not, and the two
    diverging is exactly the off-by-NULL boundary drift a twin pair
    can't afford); both consumers' oracles filter identically."""
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    sample = (
        df.select(
            cents.alias("__c"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col),
        )
        .where(F.col("__c").isNotNull())
        .orderBy(F.col("__h"), F.col(id_col))
        .limit(k)
    )
    return sample.agg(
        F.sort_array(F.collect_list("__c")).alias("__arr"),
        F.count(F.lit(1)).alias("__n"),
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 1024,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    scale: int = 100,
) -> DataFrame:
    """Quantile ESTIMATES from a deterministic uniform sample — the
    sketch-shaped companion to exact_group_quantiles for the global
    (one-group) case, where the exact operator's full window sort is
    the thing you're avoiding at 100 TB.

    The sample is the k rows with the SMALLEST md5(id) — the same
    bottom-k-by-hash trick as fixed_size_sample, so it is a uniform
    k-subset that is deterministic, append-stable (a new row evicts
    at most one sampled row), and engine-exact: both twins pick the
    identical rows, unlike RNG sampling or t-digest internals.
    Spark executes it as a distributed sort-limit (per-partition
    top-k heaps merged on one k-bounded reducer — no full sort, no
    full shuffle), then takes type-1 ranks over the k survivors
    exactly like the exact operator.

    Standard uniform-sample bound: each estimated quantile's TRUE
    rank lies within O(sqrt(p(1-p)/k)) of p w.h.p. (~±1.6% at
    k=1024, p=0.5) — pinned against exact_group_quantiles in pytest.
    Values rank as integer cents (ROUND(value*scale)) so both
    engines compare identically.

    Emits one row per requested p: (p DOUBLE, est_cents BIGINT,
    n_sample BIGINT).
    """
    arr = _bottom_k_cents(df, value_col, id_col, k, scale).select(
        "__arr", F.col("__n").alias("n_sample")
    )
    qs = F.array(*[F.lit(float(p)) for p in ps])
    return (
        arr.select(F.explode(qs).alias("p"), "__arr", "n_sample")
        .select(
            "p",
            # empty-input guard: n=0 would index element_at(arr, 0),
            # an error under ANSI; NULL estimate mirrors the SQL
            # twin's out-of-range arr[0]
            F.when(
                F.col("n_sample") > 0,
                F.element_at(
                    "__arr",
                    (F.floor(F.col("p") * (F.col("n_sample") - 1)) + 1).cast(
                        "int"
                    ),
                ),
            ).alias("est_cents"),
            "n_sample",
        )
    )


def winsorize_report(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    scale: int = 100,
) -> DataFrame:
    """Winsorization pre-flight: per group, the exact type-1
    [p_low, p_high] clip bounds and how many rows fall outside them
    — the report you read before clipping a metric column (how much
    signal would winsorizing destroy, per event type), without
    materializing a clipped copy of the corpus.

    Bounds come from :func:`exact_group_quantiles` (engine-exact
    integer-cents rank selection); the count pass then re-scans the
    input once with the bounds joined back BROADCAST (the bounds
    relation is #groups-sized) — one window shuffle + one broadcast
    scan, nothing corpus-sized moves twice. Emits per group:
    (lo_cents, hi_cents, n_total, n_low, n_high, clipped_share)
    with the share rounded to 6 decimals.
    """
    bounds = exact_group_quantiles(
        df, group_cols, value_col, ps=(p_low, p_high), scale=scale
    )
    lo_label = f"p{str(p_low).replace('0.', '').ljust(2, '0')}_cents"
    hi_label = f"p{str(p_high).replace('0.', '').ljust(2, '0')}_cents"
    bounds = bounds.select(
        *group_cols,
        F.col(lo_label).alias("lo_cents"),
        F.col(hi_label).alias("hi_cents"),
    )
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    counted = (
        df.select(*group_cols, cents.alias("__c"))
        # NULL values can never be clipped, so counting them in
        # n_total silently deflated clipped_share; the quantile
        # bounds above exclude them too (one consistent population)
        .where(cents.isNotNull())
        .join(F.broadcast(bounds), list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.max("lo_cents").alias("lo_cents"),
            F.max("hi_cents").alias("hi_cents"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("__c") < F.col("lo_cents")).cast("bigint")).alias("n_low"),
            F.sum((F.col("__c") > F.col("hi_cents")).cast("bigint")).alias("n_high"),
        )
    )
    return counted.select(
        *group_cols,
        "lo_cents",
        "hi_cents",
        "n_total",
        "n_low",
        "n_high",
        F.round(
            (F.col("n_low") + F.col("n_high")) / F.col("n_total").cast("double"), 6
        ).alias("clipped_share"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    ps: Sequence[float] = (0.5, 0.9),
    scale: int = 100,
) -> DataFrame:
    """Exact WEIGHTED type-1 quantiles per group: the smallest value
    whose cumulative weight reaches ``p * W`` — "the doc length at
    which half the corpus TOKENS sit" is a weighted median of
    lengths, not a row median (a handful of book-length docs carry
    most of the mass; the unweighted p50 wildly understates where
    tokens live).

    Same distributed shape as exact_group_quantiles: per-group
    window sort on integer cents with an exact BIGINT running
    weight, then a conditional-MIN rank selection — integer
    arithmetic end to end (the target ``ceil(p*W)`` is computed on
    integer weights), bitwise engine-portable. Emits group cols +
    one ``p{NN}_cents`` BIGINT per quantile.
    """
    cents = F.round(F.col(value_col) * scale, 0).cast("long").alias("__cents")
    wgt = F.col(weight_col).cast("long").alias("__w")
    w_rank = Window.partitionBy(*group_cols).orderBy(
        F.col("__cents")
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_grp = Window.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, cents, wgt)
        # a NULL value (or weight) carries no locatable mass: left
        # in, NULLS-FIRST ordering would add its weight to every
        # row's cumulative sum and drag the selected quantile toward
        # smaller values — filter both (the exact_group_quantiles
        # convention; both twins agree)
        .where(F.col("__cents").isNotNull() & F.col("__w").isNotNull())
        .withColumn("__cw", F.sum("__w").over(w_rank))
        .withColumn("__tw", F.sum("__w").over(w_grp))
    )

    def pick(p: float):
        # smallest cents with cumweight >= ceil(p * W): integer
        # target = floor(p*W) + (1 if frac else 0) == -floor(-p*W)
        target = -F.floor(F.lit(-p) * F.col("__tw"))
        label = f"p{str(p).replace('0.', '').ljust(2, '0')}_cents"
        return F.min(
            F.when(F.col("__cw") >= target, F.col("__cents"))
        ).alias(label)

    return ranked.groupBy(*group_cols).agg(*[pick(p) for p in ps])


def quantile_bucketize(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int = 8,
    k: int = 1024,
    scale: int = 100,
) -> DataFrame:
    """Equi-depth feature binning with sample-derived boundaries —
    Spark ML's QuantileDiscretizer re-expressed engine-exact (no
    approx_percentile internals, no RNG), for bucketing a numeric
    feature before training.

    An exact equi-depth cut needs a global rank (one total-order
    sort of the corpus); production discretizers instead take
    quantile boundaries from a sample and assign bins with a
    broadcast comparison — that is this operator. The sample is the
    k rows with smallest md5(id) (the same deterministic bottom-k
    trick as sampled_quantiles: a distributed sort-limit, per-
    partition top-k heaps, never a full shuffle), boundaries are
    type-1 quantiles at p=i/n_bins of that sample, and every row's
    bin is ``#{boundaries <= value}`` computed by a broadcast
    array_filter — map-only over the corpus, no global sort
    anywhere. Bin populations are then equi-depth up to the
    standard O(sqrt(p(1-p)/k)) sample-rank error, pinned in pytest.

    Everything compares in integer cents, and the boundary ranks
    are integer arithmetic, so Spark and the SQL twin pick
    identical boundaries and identical bins. Output: one row per
    non-empty bin (bin_id, lo_cents, hi_cents, n) — lo/hi are the
    observed min/max cents in the bin, n the population.
    """
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    arr = _bottom_k_cents(df, value_col, id_col, k, scale)
    # empty-input guard: n=0 would index element_at(arr, 0), an
    # error under ANSI; NULL boundaries + the NULL-row filter below
    # make the empty corpus produce an empty report in both twins
    bounds = arr.select(
        F.array(
            *[
                F.when(
                    F.col("__n") > 0,
                    F.element_at(
                        "__arr",
                        (
                            F.floor(F.lit(i / n_bins) * (F.col("__n") - 1)) + 1
                        ).cast("int"),
                    ),
                )
                for i in range(1, n_bins)
            ]
        ).alias("__bnds")
    )
    assigned = (
        df.select(cents.alias("__c"))
        # NULL values carry no bin (a NULL comparison would silently
        # land them in bin 0) — excluded here AND from the sample
        .where(F.col("__c").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.size(
                F.filter(F.col("__bnds"), lambda b: b <= F.col("__c"))
            ).cast("bigint").alias("bin_id"),
            "__c",
        )
    )
    return assigned.groupBy("bin_id").agg(
        F.min("__c").alias("lo_cents"),
        F.max("__c").alias("hi_cents"),
        F.count(F.lit(1)).alias("n"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = 5,
    scale: int = 100,
) -> DataFrame:
    """The per-ROW half of ``events.numeric_outliers``' median/MAD
    fences — the report says HOW MANY rows fall outside each group's
    robust fence; this emits WHICH rows, the relation a quarantine /
    review queue actually consumes (the winsorize_report →
    winsorize_apply pairing convention applied to outlier
    screening). Defaults match the report's fences (k=5, integer
    cents) so report.n_outliers == count(apply rows) per group.

    No reference twin — extends SURVEY §2.2's integrity family.

    Exactness: values quantize to integer ``scale``-ths; the group
    median and the MAD (lo-median of |x − med|) are exact type-1
    rank picks through :func:`exact_group_quantiles` — actual data
    values, never interpolations — and the flag compares integers
    (dev > k·mad, the two-sided fence |x−med| > k·mad in one
    compare), so the decision is bit-deterministic across engines
    and partitionings. ``k`` is a plain integer multiple of the RAW
    MAD (no 1.4826 normal-consistency constant — that would put a
    float product in the compare). Degeneracy is inherited from MAD
    itself: a group where >= half the values equal the median has
    MAD 0 and every deviating row flags — the correct robust answer
    for a constant-heavy column, documented not hidden.

    Scale shape: two exact_group_quantiles passes (each one
    group-partitioned rank window — the module's documented
    single-group-per-task caveat applies; swap the sample-sort
    decomposition at extreme group sizes) and two #groups-sized
    broadcast joins (null-safe on the group keys, the
    winsorize_apply convention). Flag filter is map-only.

    Output: flagged rows only — (id, group_cols..., value_fp,
    med_fp, mad_fp, dev_fp), all BIGINT in scale-ths.
    """
    med = exact_group_quantiles(
        df, group_cols, value_col, ps=(0.5,), scale=scale
    ).select(
        *[F.col(c).alias(f"__m_{c}") for c in group_cols],
        F.col("p50_cents").alias("__med"),
    )
    cond_m = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__m_{c}"))
        cond_m = eq if cond_m is None else cond_m & eq
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    devs = (
        df.select(F.col(id_col), *group_cols, cents.alias("__c"))
        .where(F.col("__c").isNotNull())
        .join(F.broadcast(med), cond_m)
        .select(
            id_col,
            *group_cols,
            "__c",
            F.abs(F.col("__c") - F.col("__med")).alias("__dev"),
            "__med",
        )
        .persist()
    )
    # ^ r10 perf (PERF.md r9 backlog): the deviation relation feeds
    # the MAD quantile pass AND the final flag join — without the
    # lazy persist each reference re-ran the source scan + median
    # pass (the numeric_outliers shape, rank_correlation precedent).
    mad = exact_group_quantiles(
        devs, group_cols, "__dev", ps=(0.5,), scale=1
    ).select(
        *[F.col(c).alias(f"__d_{c}") for c in group_cols],
        F.col("p50_cents").alias("__mad"),
    )
    cond_d = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__d_{c}"))
        cond_d = eq if cond_d is None else cond_d & eq
    return (
        devs.join(F.broadcast(mad), cond_d)
        .where(F.col("__dev") > F.lit(k) * F.col("__mad"))
        .select(
            id_col,
            *group_cols,
            F.col("__c").alias("value_fp"),
            F.col("__med").alias("med_fp"),
            F.col("__mad").alias("mad_fp"),
            F.col("__dev").alias("dev_fp"),
        )
    )


def winsorize_apply(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    scale: int = 100,
) -> DataFrame:
    """Apply the winsorization :func:`winsorize_report` previews:
    clip each row's value to its group's exact type-1
    [p_low, p_high] bounds — the actual outlier-taming transform
    before a metric feeds a mean/regression/normalization stage.

    Same bound machinery (integer-cents rank selection,
    engine-exact), bounds joined back BROADCAST (#groups-sized),
    then a map-only clamp: cents' = LEAST(GREATEST(c, lo), hi).
    The clipped value is returned in cents (BIGINT) — dividing back
    to a float display unit is the caller's display-time choice (the
    exact-integer eval contract). NULL values pass through unclipped
    and unflagged (no mass to clip; the report excludes them too).

    The bounds join is NULL-SAFE on the group keys:
    ``exact_group_quantiles``' groupBy computes bounds for a NULL
    group, and a plain using-join would silently leave that group's
    rows unclipped (the same divergence ``ordering._join_nullsafe``
    fixes for the rank decompositions). The oracle twin mirrors with
    ``IS NOT DISTINCT FROM``.

    Emits (id, group_cols..., cents, cents_clipped, was_clipped).
    """
    bounds = exact_group_quantiles(
        df, group_cols, value_col, ps=(p_low, p_high), scale=scale
    )
    lo_label = f"p{str(p_low).replace('0.', '').ljust(2, '0')}_cents"
    hi_label = f"p{str(p_high).replace('0.', '').ljust(2, '0')}_cents"
    bounds = bounds.select(
        *[F.col(c).alias(f"__b_{c}") for c in group_cols],
        F.col(lo_label).alias("__lo"),
        F.col(hi_label).alias("__hi"),
    )
    cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__b_{c}"))
        cond = eq if cond is None else cond & eq
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    clipped = F.least(F.greatest(F.col("__c"), F.col("__lo")), F.col("__hi"))
    return (
        df.select(F.col(id_col), *group_cols, cents.alias("__c"))
        .join(F.broadcast(bounds), cond, "left")
        .select(
            id_col,
            *group_cols,
            F.col("__c").alias("cents"),
            F.when(F.col("__c").isNotNull(), clipped)
            .cast("bigint")
            .alias("cents_clipped"),
            F.when(
                F.col("__c").isNotNull(), F.col("__c") != clipped
            )
            .otherwise(F.lit(False))
            .alias("was_clipped"),
        )
    )
