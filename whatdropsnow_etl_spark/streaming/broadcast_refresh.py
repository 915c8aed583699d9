"""Structured Streaming: broadcast-state refresh enrichment.

`enrich.py` joins each micro-batch against a static DataFrame that
Spark RE-PLANS every trigger — correct, but the dimension source is
re-read per batch (a JDBC dim re-queries the database, an object-store
parquet dim re-lists and re-scans every few seconds). For a
slowly-changing dimension that is wasteful at exactly the rate the
stream triggers.

The refresh pattern here is the standard fix: materialize ONE snapshot
of the dimension (persist + count), broadcast that snapshot into every
micro-batch join, and re-load it only every N batches (or when the
caller's staleness predicate fires). Between refreshes the dim costs
nothing — the persisted snapshot is already on the executors and the
broadcast is reused. The trade is bounded staleness: dimension updates
become visible at most ``refresh_every_batches`` triggers late, which
is the contract slowly-changing dimensions already accept.

No reference twin (the reference is batch-only); this closes SURVEY
§7's last r3+ streaming candidate. Pinned by
tests/test_streaming.py::test_broadcast_refresh_* — enriched stream
rows equal the batch join twin of the dim version visible at their
micro-batch, and the loader runs exactly ceil(n_batches / N) times.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RefreshingBroadcastDim:
    """A dimension snapshot that re-loads every N micro-batches.

    ``loader`` returns a fresh dimension DataFrame (a table read, a
    JDBC pull, a computed aggregate — anything). ``get()`` hands back
    the current persisted snapshot, re-running the loader only when
    ``refresh_every_batches`` batches have consumed it. The snapshot
    is materialized eagerly (persist + count) so per-batch reuse
    never re-evaluates the loader's lineage.

    Driver-side state (the streaming query's foreachBatch callbacks
    run on the driver); executors only ever see the broadcast of the
    persisted snapshot. ``n_refreshes`` counts loader runs — the
    unit tests' staleness observable.
    """

    def __init__(
        self,
        loader: Callable[[], DataFrame],
        refresh_every_batches: int = 10,
    ) -> None:
        if refresh_every_batches < 1:
            raise ValueError("refresh_every_batches must be >= 1")
        self._loader = loader
        self._every = refresh_every_batches
        self._snapshot: DataFrame | None = None
        self._batches_served = 0
        self.n_refreshes = 0

    def get(self) -> DataFrame:
        if self._snapshot is None or self._batches_served >= self._every:
            if self._snapshot is not None:
                self._snapshot.unpersist()
            snap = self._loader().persist()
            snap.count()  # materialize once; every batch reuses the cache
            self._snapshot = snap
            self._batches_served = 0
            self.n_refreshes += 1
        self._batches_served += 1
        return self._snapshot

    def close(self) -> None:
        if self._snapshot is not None:
            self._snapshot.unpersist()
            self._snapshot = None


def enrich_foreach_batch(
    dim: RefreshingBroadcastDim,
    on: Sequence[str] | str,
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` handler joining each micro-batch against the
    refreshing dimension's current broadcast snapshot and handing the
    enriched batch to ``sink``. Wire it up as::

        stream.writeStream.foreachBatch(
            enrich_foreach_batch(dim, on=["user_id"], sink=write_fn)
        )
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        sink(batch_df.join(F.broadcast(dim.get()), on=on, how=how), epoch_id)

    return handle
