"""Streaming interevent/burstiness maintenance: fold per-user gap
moments, ask cv + Goh–Barabási burstiness per trigger.

The gauge-maintenance pattern (streaming/fano.py, ks_drift.py,
auc.py) applied to the per-user inter-event-time screen: the
per-user tuple (first_ts, last_ts, n_gaps, Σd, Σd²) is an exact
MONOID — two time-adjacent segments combine by adding the moments
plus ONE bridging gap (next.first − prev.last) — so a foreachBatch
sink folds each micro-batch's compacted per-user summary into a
persisted state relation (O(users), never raw history), and the
per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.events.interevent_from_moments`
over the folded state: the SAME code path the batch operator runs,
so batch-folded == full-relation EXACTLY (pytest-pinned over a
3-way split, the streaming-twin contract every incremental module
here keeps).

Ordering contract: exactness requires per-user in-order delivery
ACROSS batches (the transitions-stream approximation — within a
batch the lag window sorts (ts, event_id) itself); an event landing
in a later batch than its successor contributes a stream-order gap.

At 100 TB the state is one 5-number row per ever-seen user and each
fold is one map-combined per-user aggregate plus a user-keyed
full-outer join of two state-sized relations; the report reads only
the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import ts_micros
from ..operators.events import interevent_from_moments

_DEC = "decimal(38,0)"


def batch_gap_moments(
    batch: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One micro-batch's compacted per-user gap summary: (user,
    first_ts_us, last_ts_us, n_gaps, sum_dt_us, ss DECIMAL(38,0)).
    Single-event users emit a zero-moment row (first == last) so the
    fold can bridge them. NULL user/ts rows are excluded (the batch
    operator's contract)."""
    w = Window.partitionBy("__u").orderBy("__t", "__id")
    rows = (
        batch.select(
            F.col(user_col).alias("__u"),
            ts_micros(F.col(ts_col)).alias("__t"),
            F.col(id_col).alias("__id"),
        )
        .where(F.col("__u").isNotNull() & F.col("__t").isNotNull())
        .withColumn("__dt", F.col("__t") - F.lag("__t").over(w))
    )
    return rows.groupBy(F.col("__u").alias(user_col)).agg(
        F.min("__t").cast("bigint").alias("first_ts_us"),
        F.max("__t").cast("bigint").alias("last_ts_us"),
        F.count("__dt").cast("bigint").alias("n_gaps"),
        F.coalesce(F.sum("__dt"), F.lit(0)).cast("bigint").alias("sum_dt_us"),
        F.coalesce(
            F.sum(F.col("__dt").cast(_DEC) * F.col("__dt").cast(_DEC)),
            F.lit(0),
        )
        .cast(_DEC)
        .alias("ss"),
    )


def fold_gap_moments(
    prev: DataFrame | None,
    cur: DataFrame,
    user_col: str = "user_id",
) -> DataFrame:
    """Fold one batch summary into the persisted per-user state.
    ``prev`` is None on the first batch. Where a user appears on
    both sides, the two segments combine with ONE bridging gap
    cur.first − prev.last (counted, summed and squared exactly);
    one-sided users pass through."""
    if prev is None:
        return cur
    p = prev.select(
        F.col(user_col).alias("__u"),
        *[F.col(c).alias(f"p_{c}") for c in
          ("first_ts_us", "last_ts_us", "n_gaps", "sum_dt_us", "ss")],
    )
    c = cur.select(
        F.col(user_col).alias("__u"),
        *[F.col(col).alias(f"c_{col}") for col in
          ("first_ts_us", "last_ts_us", "n_gaps", "sum_dt_us", "ss")],
    )
    both = F.col("p_last_ts_us").isNotNull() & F.col(
        "c_first_ts_us"
    ).isNotNull()
    bridge = F.col("c_first_ts_us") - F.col("p_last_ts_us")
    z = F.lit(0).cast("bigint")
    zd = F.lit(0).cast(_DEC)
    return p.join(c, "__u", "full_outer").select(
        F.col("__u").alias(user_col),
        F.coalesce("p_first_ts_us", "c_first_ts_us")
        .cast("bigint")
        .alias("first_ts_us"),
        F.coalesce("c_last_ts_us", "p_last_ts_us")
        .cast("bigint")
        .alias("last_ts_us"),
        (
            F.coalesce("p_n_gaps", z)
            + F.coalesce("c_n_gaps", z)
            + F.when(both, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_gaps"),
        (
            F.coalesce("p_sum_dt_us", z)
            + F.coalesce("c_sum_dt_us", z)
            + F.when(both, bridge).otherwise(z)
        )
        .cast("bigint")
        .alias("sum_dt_us"),
        (
            F.coalesce("p_ss", zd)
            + F.coalesce("c_ss", zd)
            + F.when(both, bridge.cast(_DEC) * bridge.cast(_DEC)).otherwise(
                zd
            )
        )
        .cast(_DEC)
        .alias("ss"),
    )


def interevent_report(
    state: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """cv + burstiness over the folded state — delegates to the
    batch operator's post-moments half, so the streamed report is
    bit-identical to interevent_stats over the full relation."""
    return interevent_from_moments(
        state.select(user_col, "n_gaps", "sum_dt_us", "ss"),
        user_col=user_col,
        ss_col="ss",
    )
