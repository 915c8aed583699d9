"""Window operators: top-n per group, moving average, sessionize.

Scale rules (SURVEY §6): every window partitions by a
high-cardinality key (user_id, brand) — never a global unpartitioned
window. Money/value aggregation inside frames is decimal-exact
(functions.money) so results are order- and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
