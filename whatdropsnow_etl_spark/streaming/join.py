"""Structured Streaming: watermarked stream-stream interval join.

Event correlation across two unbounded streams — "purchase within N
minutes of a view", impression↔click attribution, request↔response
pairing. Unlike stream-static enrichment (`enrich.py`) BOTH sides
are unbounded, so Spark must buffer join state; the two ingredients
that keep that state finite are:

- watermarks on both event-time columns (how late data may arrive),
- a time-range join condition bounding how far the two sides can be
  apart (``max_span``).

Together they let the engine evict a buffered row as soon as no
future match can exist: per-key state is O(rows inside
watermark + span), independent of stream length. A stream-stream
join WITHOUT a time bound grows state forever — Spark allows it for
inner joins but it is a production outage deferred; this operator
makes the bound mandatory.

At 100 TB/day both streams shuffle on the join key once per
micro-batch (state is key-partitioned); skewed hot keys salt the
same way batch joins do.

Reference parity: the reference lands event rows into Postgres and
correlates offline (etl.py:21-45); this is the same correlation
expressed online.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_span: str = "10 minutes",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Inner-join ``right`` rows that occur within
    (left.ts, left.ts + max_span] for the same ``key``.

    Right-side columns are prefixed ``r_`` (both sides usually share
    a schema). Works identically on batch DataFrames — watermarks
    are a no-op there — which is how the equivalence test pins the
    streaming result to the batch twin.
    """
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    lw = left.withWatermark(left_ts, watermark)
    rw = r.withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (rw[f"r_{right_ts}"] > lw[left_ts])
        & (rw[f"r_{right_ts}"] <= lw[left_ts] + F.expr(f"INTERVAL {max_span}"))
    )
    return lw.join(rw, cond, "inner")
