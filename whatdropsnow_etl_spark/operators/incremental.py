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
