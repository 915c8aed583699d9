"""Structured Streaming: stream-static enrichment join.

The canonical "decorate the event stream with dimensions" pattern:
the static side is a plain batch DataFrame; Spark re-plans it into
every micro-batch (so a dimension refreshed between batches is
picked up at the next trigger) and, under the broadcast threshold,
ships it to executors without shuffling the stream. Unlike
stream-stream joins there is no join state to watermark: each
micro-batch joins complete rows against the full static side —
state cost is zero, which is why enrichment dims should stay
stream-STATIC even when the fact side is unbounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a (streaming) fact DataFrame with a static dimension.

    ``broadcast_dim`` pins the hint for small dims — at 100 TB/day
    of stream the dimension must never force a per-batch shuffle of
    the fact side. Works identically on batch input, which is how
    the parity test pins it.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
