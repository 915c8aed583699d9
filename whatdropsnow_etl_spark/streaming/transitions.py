"""Custom stateful streaming operator: per-user event transitions.

Streaming twin of operators.events.event_transitions: emit one
record per consecutive-event (prev_type -> next_type) pair in each
user's stream, maintaining only the user's LAST event as state.
Spark's built-in streaming ops can't express lag() across
micro-batches, so this uses ``applyInPandasWithState``: the state
store carries one (last_type, last_ts_us, last_event_id) tuple per
user; each batch sorts its rows per user, chains them off the
stored last event, and emits the transition records (append mode).
Downstream, a windowed groupBy over (prev_type, next_type) — a
separate ordinary streaming aggregate — yields the live Markov
matrix; this operator's job is exactly the lag.

Scale: state is ONE small tuple per ever-seen user, hash-partitioned
by user_id across executors — the same footprint contract as the
sessionizer's tombstones. No timeout is registered: last-event state
never becomes safe to drop while the user can still produce events
(dropping it would mis-emit the next event as transition-less); TTL
policy belongs to the platform's state-store retention, not the
operator.

Ordering contract: rows within a micro-batch are sorted
(ts, event_id) before chaining, so intra-batch disorder is
corrected; an event arriving in a LATER batch than its successor
produces stream-order transitions (the standard streaming
approximation — exactness requires per-user in-order delivery
across batches, which the batch twin's test pins).

BREAKING STATE MIGRATION (r5): STATE_SCHEMA shrank from
(last_type, last_ts, last_id) to just ``last_type`` (the dropped
fields were never read back). ``applyInPandasWithState`` stores
state by position, so a query restarted from a checkpoint written
under the old 3-field schema will fail or misread state — discard
the old checkpoint directory (fresh checkpoint) when upgrading
across this change. The same applies to ``streaming/paths.py``,
which made the same shrink in the same release.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

OUTPUT_SCHEMA = (
    "user_id bigint, prev_type string, next_type string, ts_us bigint"
)
# just the last type: a stored (ts, id) pair was never read back
# (cross-batch disorder follows stream order by contract), so it
# was two bigints of state-store bloat per ever-seen user
STATE_SCHEMA = "last_type string"


def transition_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user consecutive-event transition records over a stream."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts_us", "event_id"])
        prev = state.get if state.exists else None
        out: list[dict] = []
        for ts_us, etype in zip(rows["ts_us"], rows["event_type"]):
            if prev is not None:
                out.append(
                    {
                        "user_id": user_id,
                        "prev_type": prev[0],
                        "next_type": str(etype),
                        "ts_us": int(ts_us),
                    }
                )
            prev = (str(etype),)
        state.update(prev)
        if out:
            yield pd.DataFrame(out)

    prepared = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("bigint").alias("user_id"),
            ts_micros(F.col(ts_col)).alias("ts_us"),
            F.col(id_col).cast("bigint").alias("event_id"),
            F.col(type_col).cast("string").alias("event_type"),
        )
        # NULL ts/id rows cannot be sequenced; int(NaN) would
        # crash-loop the query on checkpoint replay
        .where(F.col("ts_us").isNotNull() & F.col("event_id").isNotNull())
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
