"""Mergeable sketch aggregates for 100 TB count-distinct.

HyperLogLog implemented entirely in JVM-side Column expressions:
xxhash64 -> low-p-bits register index, remaining bits' leading-zero
rank, groupBy MAX per register, harmonic-mean estimate. Registers
combine with MAX, so the aggregate is map-side combinable and
shuffles at most ``groups * 2^p`` tiny rows regardless of input
size — the whole point at scale, where COUNT(DISTINCT) shuffles
every distinct value.

Spark's built-in approx_count_distinct is the same algorithm; this
exists to (a) expose the REGISTERS as a reusable/persistable
relation (sketches can be unioned across days, then re-estimated —
the pattern a training-data pipeline needs for incremental corpus
stats), and (b) pin a deterministic hash (xxhash64 seed 42) so
estimates are bit-stable across engines and runs.

No DuckDB oracle twin: the estimate depends on the hash function,
which DuckDB does not expose. Accuracy is pinned by a pytest
against exact counts (expected relative error ~1.04/sqrt(2^p)).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HLL register relation: (group, __reg, __rho).

    2^p registers; rho = leading-zero rank of the top 64-p hash
    bits. Mergeable: UNION register relations from different data
    slices and re-aggregate MAX(__rho) before estimating.
    """
    m = 1 << p
    h = F.xxhash64(F.col(col).cast("string"), F.lit(42))
    # low p bits -> register index (two's-complement & works for
    # negative hashes); remaining 64-p bits -> rank of first 1-bit
    rest = F.shiftrightunsigned(h, p)
    rho = F.when(rest == 0, F.lit(65 - p)).otherwise(
        F.lit(64 - p) - F.floor(F.log2(rest))
    )
    reg = df.select(
        *group_cols,
        h.bitwiseAND(F.lit(m - 1)).alias("__reg"),
        rho.cast("int").alias("__rho"),
    )
    return reg.groupBy(*group_cols, "__reg").agg(F.max("__rho").alias("__rho"))


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Sequence[str],
    p: int = 12,
) -> DataFrame:
    """Finish an HLL estimate from a (possibly merged) register
    relation — the second half of hll_count_distinct, split out so
    incrementally-maintained register stores (e.g. a streaming
    foreachBatch MAX-merge, or per-day register snapshots unioned)
    estimate without rescanning any raw data."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("__rho"))).alias("__z_used"),
        F.count(F.lit(1)).alias("__v"),
    )
    zeros = F.lit(m) - F.col("__v")
    z = F.col("__z_used") + zeros.cast("double")  # empty register => 2^0
    raw = F.lit(alpha * m * m) / z
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return est.select(
        *group_cols,
        F.round(corrected, 0).cast("long").alias("approx_distinct"),
    )


def hll_merge_rollup(
    regs: DataFrame,
    group_cols: Sequence[str],
    p: int = 12,
) -> DataFrame:
    """Merge per-slice HLL register relations up to ``group_cols``
    and estimate — the fixed-size (2^p rows per slice, ever) twin of
    ``kmv_merge_rollup`` for pipelines that prefer bounded register
    storage over KMV's set-operation support. MAX(__rho) per
    register position IS the HLL merge, so the merged estimate is
    bit-identical to sketching the union directly (pytest-pinned);
    rollups compose day → month → year without rescanning raw data.
    Input: union of ``hll_registers`` outputs keyed by group + slice
    columns. Emits (group_cols…, approx_distinct)."""
    merged = regs.groupBy(*group_cols, "__reg").agg(
        F.max("__rho").alias("__rho")
    )
    return hll_estimate_from_registers(merged, group_cols, p)


def hll_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    p: int = 12,
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per group via HLL(2^p).

    Output: group cols + approx_distinct BIGINT. Standard error
    ~1.04/sqrt(2^p) (p=12 -> ~1.6%). Small-range correction
    (linear counting) applies below 2.5*m when empty registers
    remain, which covers every group at test scale.
    """
    regs = hll_registers(df, group_cols, col, p)
    return hll_estimate_from_registers(regs, group_cols, p)


def hll_error_bound(p: int = 12) -> float:
    """Expected relative standard error for 2^p registers."""
    return 1.04 / math.sqrt(1 << p)


def cms_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-min sketch registers: (group, row, bucket, cnt).

    ``depth`` independent hash rows of ``width`` counters; an item
    adds 1 to one counter per row. Registers merge by SUM — map-side
    combinable, shuffle bounded by groups * depth * width regardless
    of input size. The mergeable twin of hll_registers for
    FREQUENCY (how often) rather than CARDINALITY (how many
    distinct).
    """
    rows = df.select(
        *group_cols,
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("__row"),
        F.col(col).cast("string").alias("__item"),
    ).select(
        *group_cols,
        "__row",
        F.pmod(F.xxhash64("__item", F.col("__row")), F.lit(width)).alias(
            "__bucket"
        ),
    )
    return rows.groupBy(*group_cols, "__row", "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )


def cms_estimate_counts(
    df: DataFrame,
    items: DataFrame,
    group_cols: Sequence[str],
    col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Estimate each candidate item's frequency from the sketch.

    est = MIN over the depth rows of the item's counter — a classic
    one-sided estimator: never below the true count, above it by at
    most ~2N/width with probability 1 - (1/2)^depth. The candidate
    set joins the register relation on (group, row, bucket): with
    registers persisted, estimating never rescans the raw data —
    the point of a sketch at 100 TB.
    """
    regs = cms_registers(df, group_cols, col, depth, width)
    cand = items.select(
        *group_cols,
        F.col(col).cast("string").alias("__item"),
    ).distinct()
    probes = cand.select(
        *group_cols,
        "__item",
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("__row"),
    ).withColumn(
        "__bucket",
        F.pmod(F.xxhash64("__item", F.col("__row")), F.lit(width)),
    )
    joined = probes.join(regs, [*group_cols, "__row", "__bucket"], "left")
    return (
        joined.groupBy(*group_cols, "__item")
        .agg(F.min(F.coalesce("__cnt", F.lit(0))).alias("est_count"))
        .select(
            *group_cols,
            F.col("__item").alias(col),
            F.col("est_count").cast("long").alias("est_count"),
        )
    )


def kmv_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values sketch: the k smallest normalized hashes per
    group — (group, __u DOUBLE) rows, at most k per group.

    Mergeable by construction: UNION register relations from any
    data slices and re-take the k smallest (what this function's
    groupBy+window does) — the result is identical to sketching the
    combined data. Unlike HLL registers it also supports SET
    estimates: the union of two KMV sets (re-truncated to k)
    estimates |A ∪ B|, and with |A|, |B| in hand, inclusion-
    exclusion gives the intersection — the overlap-analysis tool a
    corpus pipeline wants when comparing crawls.
    """
    from pyspark.sql.window import Window

    u = (
        F.shiftrightunsigned(
            F.xxhash64(F.col(col).cast("string"), F.lit(42)), 1
        ).cast("double")
        / F.lit(float(1 << 63))
    )
    hashes = (
        df.select(*group_cols, u.alias("__u"))
        .groupBy(*group_cols, "__u")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    w = Window.partitionBy(*group_cols).orderBy("__u")
    return (
        hashes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*group_cols, "__u", "__rn")
    )


def kmv_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    k: int = 256,
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per group from a KMV sketch.

    If the group holds fewer than k distinct hashes the count is
    exact (the sketch IS the distinct set); otherwise the k-th
    smallest normalized hash u_k estimates density: (k-1)/u_k,
    relative error ~1/sqrt(k-2) (~6% at k=256).
    """
    regs = kmv_registers(df, group_cols, col, k)
    return _kmv_estimate(regs, group_cols, k)


def _kmv_estimate(
    regs: DataFrame,
    group_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Shared estimator over a ranked KMV register relation
    (__u, __rn): exact count below k, (k-1)/u_k at the cap — the
    single place the estimate formula lives, used by both the direct
    sketch and the merge rollup."""
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.when(F.col("__rn") == k, F.col("__u"))).alias("__uk"),
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__uk"))
    return agg.select(
        *group_cols,
        F.round(est, 0).cast("long").alias("approx_distinct"),
    )


def kmv_merge_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """Merge per-slice KMV register relations up to ``group_cols`` and
    estimate distincts — the incremental COUNT(DISTINCT) pattern a
    100 TB pipeline actually runs: sketch each day/partition ONCE as
    it lands (``kmv_registers`` keyed by group + slice columns),
    persist the tiny register table (≤ k rows per slice), and answer
    "distinct users this month/quarter/ever" by merging sketches —
    the raw corpus is never rescanned.

    Merge = distinct hashes per group across slices, re-take the k
    smallest. Because KMV registers are hash VALUES (not register
    positions), the merged sketch is BIT-IDENTICAL to sketching the
    union directly (pytest-pinned), so estimates never degrade with
    the number of merge levels — rollups compose: day → month →
    year each from the previous level's sketches.

    Scale shape: the input is already sketch-sized (≤ slices × k
    rows per group), so the dedup groupBy and the per-group rank
    window move model-sized data only — the window's single task per
    group sees at most slices × k rows by construction, never the
    corpus. Same estimator as ``kmv_count_distinct``: exact below k
    (the sketch IS the distinct hash set), (k-1)/u_k beyond.

    Emits (group_cols…, approx_distinct).
    """
    from pyspark.sql.window import Window

    merged = (
        sketches.select(*group_cols, "__u")
        .groupBy(*group_cols, "__u")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    w = Window.partitionBy(*group_cols).orderBy("__u")
    regs = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    return _kmv_estimate(regs, group_cols, k)


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimates between groups from ONE pass of
    KMV sketches — the crawl-overlap question ("how many users does
    `view` share with `purchase`? how much of crawl B is already in
    crawl A?") answered at sketch size instead of a value-keyed
    self-join of the corpus: |A ∪ B| from the merged re-truncated
    registers (the kmv_merge_rollup merge — bit-identical to
    sketching the union), |A ∩ B| by inclusion-exclusion, Jaccard as
    the display ratio. THE capability KMV has over HLL-style
    position sketches (registers are hash VALUES, so set algebra
    composes; see kmv_registers).

    No reference twin — extends SURVEY §2.3's sketch family.

    Exactness contract (the kmv_distinct_users convention): below k
    distinct values the sketch IS the distinct hash set, every
    estimate is an exact BIGINT, and the COUNT(DISTINCT) oracle is a
    true twin; past k the same code degrades to the (k-1)/u_k
    estimator (error ~1/sqrt(k-2)) — the gate pins the exact regime,
    the estimator is the documented 100-TB path. Inclusion-exclusion
    intersections clamp at 0 (estimator noise can push them
    negative past k).

    Scale shape: ONE corpus pass builds the per-group registers
    (persisted — singles, the pair spine and both union sides
    re-reference them); everything downstream is sketch-sized
    (pairs × k rows), the pair spine a bounded-categorical broadcast
    grid (the vocab_jaccard shape). Register windows partition on
    the group/pair key with ≤ slices×k rows per task by
    construction.

    Output: (group_a, group_b, est_a, est_b, est_union,
    est_intersection, jaccard) for every group_a < group_b pair,
    jaccard rounded 6dp.
    """
    from pyspark.sql.window import Window

    regs = kmv_registers(df, [group_col], col, k).persist()
    singles = _kmv_estimate(regs, [group_col], k)
    groups = regs.select(F.col(group_col).alias("__g")).distinct()
    spine = groups.select(F.col("__g").alias("group_a")).join(
        F.broadcast(groups.select(F.col("__g").alias("group_b"))),
        F.col("group_a") < F.col("group_b"),
    )
    side_a = regs.select(
        F.col(group_col).alias("group_a"), "__u"
    ).join(F.broadcast(spine), "group_a")
    side_b = regs.select(
        F.col(group_col).alias("group_b"), "__u"
    ).join(F.broadcast(spine), "group_b")
    merged = (
        side_a.select("group_a", "group_b", "__u")
        .unionByName(side_b.select("group_a", "group_b", "__u"))
        .groupBy("group_a", "group_b", "__u")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("__u")
    pair_regs = merged.withColumn(
        "__rn", F.row_number().over(w)
    ).where(F.col("__rn") <= k)
    uni = _kmv_estimate(pair_regs, ["group_a", "group_b"], k).select(
        "group_a",
        "group_b",
        F.col("approx_distinct").alias("est_union"),
    )
    ea = singles.select(
        F.col(group_col).alias("group_a"),
        F.col("approx_distinct").alias("est_a"),
    )
    eb = singles.select(
        F.col(group_col).alias("group_b"),
        F.col("approx_distinct").alias("est_b"),
    )
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
        F.lit(0).cast("long"),
    )
    out = (
        uni.join(F.broadcast(ea), "group_a")
        .join(F.broadcast(eb), "group_b")
        .select(
            "group_a",
            "group_b",
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_intersection"),
            F.when(
                F.col("est_union") > 0,
                F.round(
                    inter.cast("double") / F.col("est_union").cast("double"),
                    6,
                ),
            ).alias("jaccard"),
        )
    )
    out._cached_inputs = [regs]
    return out
