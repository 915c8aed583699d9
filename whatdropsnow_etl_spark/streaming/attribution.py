"""Custom stateful streaming operator: live last-touch attribution.

Streaming twin of ``operators.events.last_touch_attribution``: the
batch op's ``last(..., ignorenulls)`` window can't cross
micro-batches, so this keeps each user's most recent NON-conversion
(touch_type, ts) as ``applyInPandasWithState`` state — the same
one-small-tuple-per-user footprint contract as the sessionizer and
``transition_stream``. Each conversion row emits one credited record
(its touch type if the touch is within ``within_days``, else
``'direct'``); a downstream ordinary streaming groupBy over
``touch_type`` yields the live attribution board.

Scale: state is one tuple per ever-seen user, hash-partitioned by
``user_id``; no per-user history is retained (last-touch needs only
the last touch — linear/multi-touch models would need bounded
per-user touch lists instead). No timeout is registered: a user's
last touch stays creditable for ``within_days``, and after that the
record self-expires SEMANTICALLY (the window check fails, crediting
'direct') — so dropping state early could only mis-credit, never
help; platform state-store retention handles the physical TTL.

Ordering contract: rows within a micro-batch sort on (ts, event_id)
before chaining, matching the batch twin's total order; cross-batch
disorder follows the standard streaming approximation the batch
twin's test pins (exactness requires per-user in-order delivery).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

OUTPUT_SCHEMA = (
    "user_id bigint, touch_type string, ts_us bigint, value double"
)
STATE_SCHEMA = "touch_type string, touch_ts_us bigint"


def attribution_stream(
    events: DataFrame,
    conversion: str = "purchase",
    within_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """One credited record per conversion event, as they stream in."""
    within_us = within_days * 86_400_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts_us", "event_id"])
        touch = state.get if state.exists else None
        out: list[dict] = []
        for ts_us, etype, value in zip(
            rows["ts_us"], rows["event_type"], rows["value"]
        ):
            if str(etype) != conversion:
                touch = (str(etype), int(ts_us))
                continue
            credited = "direct"
            if touch is not None and touch[1] >= int(ts_us) - within_us:
                credited = touch[0]
            # a NULL conversion value arrives here as NaN; the batch
            # twin's F.sum skips NULLs, so emit 0.0 (not NaN, which
            # would poison the downstream total_value aggregate)
            out.append(
                {
                    "user_id": user_id,
                    "touch_type": credited,
                    "ts_us": int(ts_us),
                    "value": 0.0 if pd.isna(value) else float(value),
                }
            )
        if touch is not None:
            state.update(touch)
        if out:
            yield pd.DataFrame(out)

    prepared = events.withWatermark(ts_col, watermark).where(
        F.col(ts_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(user_col).cast("bigint").alias("user_id"),
        ts_micros(F.col(ts_col)).alias("ts_us"),
        F.col(id_col).cast("bigint").alias("event_id"),
        F.col(type_col).cast("string").alias("event_type"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
