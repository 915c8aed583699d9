"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (on by default in session.py) handles most
shuffle-join skew at runtime; these explicit knobs cover the cases
AQE can't see: a groupBy whose reduce-side hot key melts one task,
and broadcast-ineligible joins against a skewed key column.

Salts are DETERMINISTIC (hash of the row's other columns), so plans
stay reproducible run to run — output equality with the unsalted
plan is what the tests assert, and what makes these safe drop-in
rewrites at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _salt(df: DataFrame, n_salts: int) -> Column:
    # hash every column → stable pseudo-random spread; pmod keeps it
    # non-negative
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_groupby_sum(
    df: DataFrame,
    keys: Sequence[str],
    agg_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate for skewed group keys.

    Phase 1 groups by (keys..., salt) — the hot key's rows spread
    over ``n_salts`` reduce tasks; phase 2 combines the partials by
    the real keys (tiny input: n_groups × n_salts rows). Only
    algebraic aggregates compose this way; callers pass the phase-1
    expressions and the same column names are re-summed in phase 2.

    Equivalent to ``df.groupBy(keys).agg(...)`` — Spark's map-side
    partial aggregation already does this implicitly when upstream
    partitioning is random, but NOT when the data arrives already
    clustered by the hot key (e.g. read from key-partitioned files),
    which is exactly when the explicit salt matters.
    """
    phase1 = (
        df.withColumn("__salt", _salt(df, n_salts))
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in agg_cols]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot join keys and ``other`` is
    too large to broadcast: the skewed side gets a deterministic salt
    column, the other side is replicated ``n_salts`` times (explode),
    and the join key becomes (on..., salt) — the hot key's rows now
    land on ``n_salts`` different reducers.

    Output is row-identical to ``skewed.join(other, on, how)``;
    replication multiplies the other side's shuffle volume by
    n_salts, so size n_salts to the skew factor, not higher.
    """
    on = list(on)
    salted = skewed.withColumn("__salt", _salt(skewed, n_salts))
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_join_hotkeys(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    hot_threshold: int = 100_000,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join that salts ONLY the hot keys.

    ``salted_join`` replicates the entire other side ``n_salts``
    times — correct but n_salts× the shuffle. At 100 TB the skew is
    almost always a handful of keys, so: count the skewed side's
    keys once (an aggregate relation, no driver action), mark keys
    above ``hot_threshold`` hot, and route rows — cold keys take the
    plain co-partitioned join, hot keys take the salted join with
    the other side replicated only for those keys (hot-key set ×
    n_salts rows, usually broadcastable). Union of the two paths is
    row-identical to the plain inner join.

    The hot-key relation is computed from data stats at plan time —
    the same move AQE's skew-join makes at runtime, exposed as an
    explicit operator for the cases AQE can't rewrite (e.g. the join
    feeds a co-grouped aggregate, or the engine's split thresholds
    don't trigger).
    """
    on = list(on)
    counts = skewed.groupBy(*on).agg(F.count(F.lit(1)).alias("__kc"))
    hot = counts.where(F.col("__kc") > hot_threshold).select(*on)

    sk_tag = skewed.join(F.broadcast(hot), on, "left_semi")
    sk_cold = skewed.join(F.broadcast(hot), on, "left_anti")
    ot_hot = other.join(F.broadcast(hot), on, "left_semi")
    ot_cold = other.join(F.broadcast(hot), on, "left_anti")

    cold = sk_cold.join(ot_cold, on)
    salted = sk_tag.withColumn("__salt", _salt(sk_tag, n_salts))
    replicated = ot_hot.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    hot_joined = salted.join(replicated, [*on, "__salt"]).drop("__salt")
    return cold.unionByName(hot_joined)


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Hot-key diagnostic: the top-``top_k`` keys by row count with
    rank, corpus share, and cumulative share.

    The relation every salting/bucketing decision reads first — it
    answers "is this join/groupBy key skewed, and how many keys do I
    have to treat specially". Shape: one key-partitioned count (the
    only corpus-sized shuffle), then a sort-limit (per-partition
    heaps) cuts to top_k BEFORE any window runs, so the ranking
    window's single partition is top_k-bounded at any scale. The
    cumulative share of rank i only involves rows ranked above i,
    so computing it after the cut is exact.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__tot"))
    top = counts.orderBy(F.col("n").desc(), F.col(key_col)).limit(top_k)
    w = Window.orderBy(F.col("n").desc(), F.col(key_col))
    return (
        top.join(F.broadcast(total))
        .select(
            F.col(key_col),
            F.col("n"),
            F.row_number().over(w).cast("bigint").alias("rnk"),
            F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias("share"),
            F.round(
                F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.col("__tot"),
                6,
            ).alias("cum_share"),
        )
    )


def join_cardinality_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight join diagnostic: the top-``top_k`` keys by
    PREDICTED join output (n_left × n_right) — the "why is this join
    producing 100× its inputs" answer, computed before the join runs.

    A key appearing n times on each side emits n² rows; one hot key
    can dominate the entire output (and land on one task). This
    report reads both sides ONCE as key-counts — two aggregates
    whose results are key-cardinality-sized, never data-sized — then
    inner-joins the two count relations and sort-limits to top_k
    (per-partition heaps, no global sort). What to do with a hot row
    is the existing toolkit: salted_join_hotkeys for the join,
    pre-aggregation when semantics allow, or an explicit filter.

    Output: (join_key, n_left, n_right, n_pairs), ``n_pairs``
    descending with the key as tiebreaker.
    """
    lc = left.groupBy(F.col(left_key).alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(right_key).alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    return (
        lc.join(rc, "join_key")
        .select(
            "join_key",
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).alias("n_pairs"),
        )
        .orderBy(F.col("n_pairs").desc(), F.col("join_key"))
        .limit(top_k)
    )
