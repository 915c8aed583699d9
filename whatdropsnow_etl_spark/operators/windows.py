"""Window operators: top-n per group, moving average, sessionize.

Scale rules (SURVEY §6): every window partitions by a
high-cardinality key (user_id, brand) — never a global unpartitioned
window. Money/value aggregation inside frames is decimal-exact
(functions.money) so results are order- and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

from ..functions.money import dec


def topn_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    n: int = 3,
) -> DataFrame:
    """rank() <= n per group, descending on ``order_col``.

    rank (not row_number) keeps reference RANK semantics
    (sql.py:8); the tiebreak makes output deterministic anyway.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col)
    )
    return (
        df.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .where(F.col("rnk") <= n)
    )


def moving_avg(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    preceding: int = 3,
) -> DataFrame:
    """Per-partition ordered moving average over the last
    ``preceding``+1 rows (ROWS BETWEEN n PRECEDING AND CURRENT)."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-preceding, 0)
    )
    mov = F.sum(dec(value_col)).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return df.withColumn("mov_avg", mov)


def sessionize(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    gap: str = "30 MINUTES",
) -> DataFrame:
    """Gap-based sessionization: lag + cumulative-sum session ids,
    then one row per session (start/end in epoch micros, counts,
    decimal-exact value sum).

    Timestamps are emitted as epoch-micros BIGINT so results are
    engine- and timezone-portable.
    """
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(partition_col).orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__new", is_new)
        .withColumn("session_seq", F.sum("__new").over(wcum).cast("bigint"))
        .groupBy(partition_col, "session_seq")
        .agg(
            ts_micros(F.min(ts_col)).alias("session_start_us"),
            ts_micros(F.max(ts_col)).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(value_col)).cast("double").alias("sum_value"),
        )
    )


def group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    id_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """General top-``k`` per group by an arbitrary total order —
    quota_sample's salted two-phase cut factored out for any order
    key (quota_sample is this with the md5(id) order; topn_per_group
    is the plain-window form for high-cardinality groups).

    Phase 1 ranks within (group, xxhash64(id) % salt_buckets)
    sub-groups and keeps each bucket's local top-k (every globally
    top-k row is, a fortiori, in its own bucket's top-k), shrinking
    each group to <= salt_buckets * k rows while fanning the heavy
    scan across groups x buckets tasks; phase 2 re-ranks the
    survivors per group under the SAME order. Bit-identical to the
    single-window form (pinned in pytest) — use this whenever the
    group count is small relative to the cluster (the
    one-task-per-group window trap).

    ``order_cols`` must be a TOTAL order (append ``id_col`` as the
    last key if the caller's order can tie). Keeps all input
    columns; adds ``rank_in_group`` (1-based bigint).
    """
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    gcols = [F.col(c) for c in group_cols]
    w_salted = Window.partitionBy(*gcols, salt).orderBy(*order_cols)
    w_group = Window.partitionBy(*gcols).orderBy(*order_cols)
    return (
        df.withColumn("__srn", F.row_number().over(w_salted))
        .where(F.col("__srn") <= k)
        .withColumn("rank_in_group", F.row_number().over(w_group).cast("bigint"))
        .where(F.col("rank_in_group") <= k)
        .drop("__srn")
    )
