"""Custom stateful streaming operator: gap-based sessionization.

Streaming twin of operators.windows.sessionize (SURVEY §2.4
"stateful sessionize"): events that arrive within `gap` of the
previous event for the same user extend that user's open session;
a larger gap closes it. Spark has no built-in streaming session
operator with arbitrary per-session aggregates, so this uses
``applyInPandasWithState`` — per-key state in the state store,
Arrow-batched user code, event-time timeouts to flush idle
sessions once the watermark passes session_end + gap.

Scale: state is one small tuple per *open* session (not per event),
hash-partitioned by user_id across executors; watermark timeouts
bound its lifetime. 100 TB/day of events with ~100 M concurrent
users is ~GBs of state per executor at 1000 executors.

Emitted rows are CLOSED sessions only (append mode): session_seq
counts closed sessions per user, so output matches the batch
sessionize numbering for every session the stream has finished.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

OUTPUT_SCHEMA = (
    "user_id bigint, session_seq bigint, session_start_us bigint,"
    " session_end_us bigint, n_events bigint, sum_value double"
)
# (session_start_us, last_ts_us, n_events, sum_value, closed_so_far)
STATE_SCHEMA = "start bigint, last bigint, n bigint, sv double, seq bigint"

_US = 1_000_000


def _close(user_id: int, st: tuple, seq: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_seq": seq,
        "session_start_us": st[0],
        "session_end_us": st[1],
        "n_events": st[2],
        "sum_value": st[3],
    }


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap sessionization over a streaming events DataFrame."""
    n, unit = gap.split()
    # case-insensitive: the batch twin's own default is '30 MINUTES'
    # (any INTERVAL casing), and a lowercase-only lookup raised
    # KeyError at query construction for it
    gap_us = int(n) * {"seconds": 1, "minutes": 60, "hours": 3600}[
        unit.lower().rstrip("s") + "s"
    ] * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            st = state.get
            # keep a closed-session TOMBSTONE (n=0) carrying the seq
            # counter instead of state.remove(): dropping the state
            # would restart the next session of this user at seq 1,
            # colliding with an already-emitted row. One tuple per
            # ever-seen user is the price of stable numbering.
            state.update((0, 0, 0, 0.0, st[4] + 1))
            yield pd.DataFrame([_close(user_id, st, st[4] + 1)])
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts_us")
        st = state.get if state.exists else None
        closed: list[dict[str, Any]] = []
        seq = st[4] if st else 0
        # n == 0 marks a tombstone: counter survives, no open session
        cur = (st[0], st[1], st[2], st[3]) if st and st[2] > 0 else None
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            # NULL value arrives as NaN: the batch twin's F.sum skips
            # NULLs, so a poisoned NaN sum_value would diverge
            v = 0.0 if pd.isna(value) else float(value)
            if cur is None:
                cur = (ts_us, ts_us, 1, v)
            elif ts_us - cur[1] > gap_us:
                seq += 1
                closed.append(_close(user_id, cur, seq))
                cur = (ts_us, ts_us, 1, v)
            else:
                # cross-batch late event (ts <= stored last): merge
                # via min-start / max-last so the session END never
                # moves BACKWARD (that made the timeout fire early
                # and session_end regress); an event older than the
                # open session merges into it rather than
                # resurrecting a closed one — the documented
                # stream-order divergence from the batch twin
                cur = (
                    min(cur[0], ts_us),
                    max(cur[1], ts_us),
                    cur[2] + 1,
                    cur[3] + v,
                )
        state.update((cur[0], cur[1], cur[2], cur[3], seq))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    prepared = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("bigint").alias("user_id"),
            F.col(ts_col).alias("ts"),
            ts_micros(F.col(ts_col)).alias("ts_us"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
