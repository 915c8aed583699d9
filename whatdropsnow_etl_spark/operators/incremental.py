"""Incremental re-run filtering.

Reference parity: etl.py:14-20 ``filter_out_recently_added`` — a
Python set-difference of candidate ids minus ids updated within the
last day. Spark-first: a LEFT ANTI join, which Catalyst executes as
a broadcast anti join when the "recent" side is small (it is, by
construction: it's one day of updates).

Scale: no driver-side sets; both sides stay distributed. The recent
side is aggregated to distinct keys before the join, so the anti
join probe is minimal.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_out_recently_added(
    candidates: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    recent_interval: str = "12 HOURS",
) -> DataFrame:
    """Distinct candidate keys minus keys seen in ``history`` within
    ``recent_interval`` of history's max timestamp.

    The cutoff is data-derived (max ts − interval) so replays are
    deterministic, unlike the reference's wall-clock ``utcnow``.
    """
    cutoff = history.agg(
        F.expr(f"max({ts_col}) - INTERVAL {recent_interval}").alias("__cutoff")
    )
    recent = (
        history.join(F.broadcast(cutoff))
        .where(F.col(ts_col) > F.col("__cutoff"))
        .select(*keys)
        .distinct()
    )
    return candidates.select(*keys).distinct().join(recent, list(keys), "left_anti")


def rollup_state(
    df: DataFrame, keys: Sequence[str], value_col: str = "value"
) -> DataFrame:
    """Mergeable per-key aggregate state: (keys..., __n, __sum_dec,
    __min, __max).

    The incremental-OLAP building block: every component is a
    commutative monoid (count/sum add, min/max take extrema), so
    states built over disjoint slices merge into exactly the state
    of the union — a 100 TB rollup is maintained by aggregating only
    each new partition and folding it in, never rescanning history.
    The sum is decimal-exact (`functions/money.py`), which is what
    makes the merge ASSOCIATIVE in practice: double sums would drift
    with merge order.
    """
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(12,2)")).alias("__sum_dec"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
    )


def merge_rollup_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold any number of rollup states into one (union + re-reduce:
    one key-partitioned shuffle over state-sized — not corpus-sized —
    relations)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("__n").alias("__n"),
        F.sum("__sum_dec").alias("__sum_dec"),
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
    )


def rollup_report(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Present a rollup state: n / sum / avg / min / max per key.
    avg divides the exact decimal sum (as double) by the exact count,
    so it is bit-identical on any engine."""
    sum_d = F.col("__sum_dec").cast("double")
    return state.select(
        *keys,
        F.col("__n").alias("n_events"),
        sum_d.alias("sum_value"),
        (sum_d / F.col("__n")).alias("avg_value"),
        F.col("__min").alias("min_value"),
        F.col("__max").alias("max_value"),
    )


def incremental_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental view maintenance for an inner-join view
    V = A ⋈ B: given the old slices and this batch's deltas, emit
    exactly the NEW rows of the view,

        ΔV  =  ΔA ⋈ B  ∪all  A ⋈ ΔB  ∪all  ΔA ⋈ ΔB

    — the algebraic identity that lets a 100 TB joined view advance
    per batch without ever re-running the history×history join (the
    one term deliberately absent is A ⋈ B). The three delta terms
    each have one delta-sized side, so Catalyst broadcasts it when
    small and hash-joins on ``on`` otherwise; histories are touched
    only as probe sides (bucket/pre-partition them on ``on`` and the
    exchange is free). Union is multiset (unionByName), matching the
    EXCEPT ALL semantics of the recompute diff the pytest pins:
    delta == full_join(A∪ΔA, B∪ΔB) minus full_join(A, B), row
    multiplicities included, assuming old/delta slices are disjoint
    (append-only deltas; updates/deletes are cdc_apply's job
    upstream).
    """
    keys = list(on)
    d1 = a_delta.join(b_old, keys)
    d2 = a_old.join(b_delta, keys)
    d3 = a_delta.join(b_delta, keys)
    return d1.unionByName(d2).unionByName(d3)
