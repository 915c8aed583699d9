"""Structured Streaming deduplication.

Streaming twin of operators.dedup/upsert semantics (reference
parity: db.py upsert's one-row-per-key contract applied to a live
feed, SURVEY §2.4): drop repeated event_ids as they arrive.

``dropDuplicatesWithinWatermark`` keeps dedup state only for keys
newer than the watermark — the property that makes an always-on
stream's state finite (plain dropDuplicates on a stream grows state
forever). State is hash-partitioned by key across executors, so a
1000-executor cluster dedups 100 TB/day with per-executor state
bounded by (keys within watermark horizon) / executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-seen-wins streaming dedup on ``key_cols``.

    Late duplicates arriving within ``watermark`` of the max seen
    event time are dropped; older-than-watermark state is evicted.
    On a batch DataFrame this degrades to plain dropDuplicates —
    same rows, no state — so batch backfill and live stream agree.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    # batch fallback must be DETERMINISTIC: plain dropDuplicates
    # keeps an arbitrary row per key (whichever a task saw first),
    # so a backfill could disagree with the live stream on payload
    # columns when duplicate sends differ — keep the earliest by
    # (ts, remaining columns) instead
    from ..operators.upsert import latest_wins

    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in events.columns if c not in key_cols
        and c != ts_col
    ]
    return latest_wins(events, list(key_cols), order)
