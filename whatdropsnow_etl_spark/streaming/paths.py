"""Custom stateful streaming operator: per-user length-k event paths.

Streaming twin of operators.events.top_event_paths' window stage:
emit one record per COMPLETED length-``k`` run of consecutive events
in each user's stream. Spark's built-in streaming ops can't express
a k-wide lead() across micro-batches, so this generalizes
transition_stream's one-tuple state to the last ``k-1`` event types:
``applyInPandasWithState`` chains each batch's rows (sorted
(ts, id) within the batch) off the stored suffix and emits the
full path string whenever the window fills. Downstream, an ordinary
streaming groupBy over ``path`` yields the live top-paths board —
this operator's job is exactly the window.

Scale: state is ONE (k-1)-string tuple per ever-seen user,
hash-partitioned by user_id — the transition_stream footprint
contract times a constant. Same ordering contract too: intra-batch
disorder is corrected by the sort; cross-batch disorder follows
stream order (the batch twin's test pins exactness for in-order
delivery). Rows with a NULL ts or id are dropped before the
stateful op (they cannot be sequenced; left in, one poison row
would crash-loop the query on replay). The ``watermark`` is applied
to the source for engine bookkeeping, but with NoTimeout state
never expires — unbounded per-user retention is this operator's
documented footprint, the price of "paths across any gap".

BREAKING STATE MIGRATION (r5): STATE_SCHEMA dropped its unread
(last_ts, last_id) fields. State is stored positionally, so a
restart from a pre-change checkpoint will fail or misread state —
use a fresh checkpoint directory when upgrading across this change
(see streaming/transitions.py, same shrink, same release).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

OUTPUT_SCHEMA = "user_id bigint, path string, ts_us bigint"


def path_stream(
    events: DataFrame,
    k: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user completed length-``k`` path records over a stream.

    Emits (user_id, path 'a > b > c', ts_us of the completing
    event) — one record per window the batch twin would count.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    state_schema = ", ".join(f"t{i} string" for i in range(k - 1))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts_us", "event_id"])
        if state.exists:
            st = state.get
            # a None in the suffix means the window hasn't filled yet
            suffix = [s for s in st[: k - 1] if s is not None]
        else:
            suffix = []
        out: list[dict] = []
        for ts_us, etype in zip(rows["ts_us"], rows["event_type"]):
            suffix.append(str(etype))
            if len(suffix) >= k:
                out.append(
                    {
                        "user_id": user_id,
                        "path": " > ".join(suffix[-k:]),
                        "ts_us": int(ts_us),
                    }
                )
                suffix = suffix[-(k - 1):]
        padded = suffix[-(k - 1):]
        padded = [None] * ((k - 1) - len(padded)) + padded
        state.update(tuple(padded))
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
        # a NULL ts/id row would reach the pandas fn as NaN and
        # int(NaN) would crash the micro-batch — and a checkpoint
        # restart replays the same offsets, so one poison row
        # crash-loops the query forever; un-sequenceable rows are
        # dropped instead (documented)
        .where(F.col("ts_us").isNotNull() & F.col("event_id").isNotNull())
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
