"""Custom stateful streaming operator: live last-N user history.

Streaming twin of operators.events.user_event_sequences — the
feature-store maintenance job that keeps every user's "last N
actions" sequence current as events arrive (sequential recommenders
read this feature at serving time; batch retraining reads the same
relation from the latest-wins sink).

Built-in streaming ops can't express "bounded ordered suffix per
key" (a window over unbounded history), so the suffix IS the state:
``applyInPandasWithState`` appends each micro-batch's rows (sorted
(ts, id) within the batch — the transition_stream/path_stream
ordering contract) onto the stored sequence, trims to the last N,
and emits ONE updated record per user per batch touched. Downstream
the record stream feeds a latest-wins upsert (streaming/upsert.py)
keyed on user_id — together they are the live materialized view of
the batch operator.

Scale: state is one <=N-token string per ever-seen user,
hash-partitioned by user_id; emission volume is touched-users per
batch, not events. Rows with a NULL ts or id are dropped before the
stateful op (un-sequenceable; a poison row would otherwise
crash-loop the query on replay). Cross-batch disorder follows stream order (the
single-batch test pins exactness for in-order delivery; the
multi-batch test pins the order-insensitive invariants).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, seq string, ts_us bigint"


def history_stream(
    events: DataFrame,
    max_len: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user last-``max_len`` event-type sequence, re-emitted
    (one record per touched user) every micro-batch.

    Output: (user_id, n_events = len(kept window), seq oldest-first,
    ts_us of the newest event) — matching
    operators.events.user_event_sequences column-for-column plus the
    recency stamp the upsert sink keys on.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    # state separator is \x1f, NOT the space the display format uses:
    # a space-joined state round-trip would split a multi-word event
    # type ('add to cart') into three tokens on restore, inflating
    # n_events and mis-trimming the kept window
    state_schema = "seq string"
    _SEP = "\x1f"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        if state.exists:
            (seq_str,) = state.get
            seq = seq_str.split(_SEP) if seq_str else []
        else:
            seq = []
        last_ts = 0
        for ts_us, etype in zip(rows["ts_us"], rows["event_type"]):
            seq.append(str(etype))
            last_ts = int(ts_us)
        seq = seq[-max_len:]
        state.update((_SEP.join(seq),))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": len(seq),
                    "seq": " ".join(seq),
                    "ts_us": last_ts,
                }
            ]
        )

    prepared = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("bigint").alias("user_id"),
            ts_micros(F.col(ts_col)).alias("ts_us"),
            F.col(id_col).cast("bigint").alias("event_id"),
            F.col(type_col).cast("string").alias("event_type"),
        )
        # NULL ts/id rows cannot be sequenced and int(NaN) would
        # crash-loop the query on checkpoint replay — drop them
        .where(F.col("ts_us").isNotNull() & F.col("event_id").isNotNull())
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
