"""Exactly-once streaming append through the manifest-committed
table: foreachBatch writer whose unit of publish is an atomic
manifest version, idempotent under micro-batch redelivery.

Structured Streaming's foreachBatch is at-least-once: after a crash
between "side effect done" and "offsets committed", the SAME batch
(same ``batch_id``) is delivered again. The drift sink solves this
with marker files; here the manifest IS the marker — each committed
version records its batch id in the manifest ``meta``, and a
redelivered batch whose id already appears in the ledger is skipped
before any write happens. Combined with the manifest's atomic
rename, the table transitions are exactly: one new full-snapshot
version per distinct batch, never a partial batch, never a double
append.

The ledger is scoped to an ``app_id`` (the Delta ``txn appId``
pattern): foreachBatch ids are monotone only WITHIN one checkpoint,
so a NEW checkpoint pointed at an existing table restarts at batch
0 — with an unscoped ``batch_id <= max`` test every batch would be
silently discarded until the id overtook the old stream's max
(silent data loss). Scoping the max to the writing stream's
identity makes a fresh checkpoint a fresh ledger: pass a stable
``app_id`` per logical stream (e.g. the checkpoint location) and
redelivery within the stream stays a no-op while a new stream
starts clean. Legacy tables whose meta carries no ``ledger_app_id``
fall back to the unscoped test but log loudly on every skip.
The ledger holds ONE (app_id, max) pair — the latest writer's —
so two streams interleaving commits into one table would reset each
other's scoped max; that is outside the manifest's single-writer-
per-table contract (enforced per version via O_EXCL) anyway.

Readers see every version as a complete table snapshot (append mode
carries the previous file list forward), so a downstream batch job
can pin a version while the stream keeps committing — the
batch/stream isolation Delta calls snapshot isolation, built from
the same two primitives (file-list manifests + atomic pointer
swap).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

from ..sinks.manifest import commit_write, committed_meta, latest_meta

_DEFAULT_APP_ID = "default"


def _max_committed_batch_id(path: str, app_id: str) -> int:
    """O(1) idempotence ledger: the cumulative ``max_batch_id`` the
    sinks record in every manifest's meta, scoped to the writing
    stream's ``app_id``. foreachBatch ids are monotone within a
    checkpoint and only the most recent batch is ever redelivered,
    so ``batch_id <= max`` IS the committed test for the SAME
    stream — without rescanning every retained manifest per batch
    (O(V²) over a stream's life) and robust to ``vacuum`` dropping
    old manifests (the latest one always survives). A different
    ``app_id`` in the ledger (new checkpoint over an existing
    table) resets the view to -1 so batch 0 of the new stream
    commits instead of being silently discarded. Tables written
    before these fields existed fall back to the full ledger scan
    once, with a loud warning when that unscoped test skips."""
    m = latest_meta(path)
    if m is None:
        return -1
    if "max_batch_id" in m:
        if m.get("ledger_app_id", _DEFAULT_APP_ID) != app_id:
            return -1  # another stream's ledger — fresh start
        return int(m["max_batch_id"])
    # legacy table (pre-ledger meta): unscoped scan, loud skips
    ids = [
        x["batch_id"] for x in committed_meta(path) if "batch_id" in x
    ]
    return max(ids) if ids else -1


def _skip(path: str, app_id: str, batch_id: int) -> bool:
    mx = _max_committed_batch_id(path, app_id)
    if batch_id > mx:
        return False
    m = latest_meta(path) or {}
    if "ledger_app_id" not in m:
        warnings.warn(
            f"manifest_sink: skipping batch {batch_id} at {path} via "
            f"the UNSCOPED legacy ledger (max={mx}). If this is a new "
            "checkpoint over an existing table this is data loss — "
            "pass a distinct app_id.",
            stacklevel=3,
        )
    return True


class ManifestStreamSink:
    """``stream.writeStream.foreachBatch(ManifestStreamSink(path,
    app_id=<stable per logical stream, e.g. checkpoint dir>))``."""

    def __init__(self, path: str, app_id: str = _DEFAULT_APP_ID):
        self.path = path
        self.app_id = app_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if _skip(self.path, self.app_id, batch_id):
            return  # redelivery of an already-published batch
        commit_write(
            batch_df,
            self.path,
            mode="append",
            meta={
                "batch_id": batch_id,
                "max_batch_id": batch_id,
                "ledger_app_id": self.app_id,
            },
        )


class ManifestMergeStreamSink:
    """Exactly-once streaming UPSERT into the manifest table —
    ``stream.writeStream.foreachBatch(ManifestMergeStreamSink(path,
    keys, order_col))``: each micro-batch MERGEs (latest-wins by
    ``order_col``, ties to the batch) into the current snapshot and
    publishes the result as one new atomic version. The streaming
    CDC-apply shape: a keyed change stream materialized as a
    queryable, time-travelable table.

    Same idempotence ledger as the append sink (app-scoped batch id
    in manifest meta; a redelivered batch is skipped before any
    work) — and because each version is the FULL merged snapshot,
    skipping a redelivered batch leaves the table exactly as the
    first delivery did: replay-safe without tombstones or dedup
    reads.

    Scale: per batch, one key-partitioned window over
    (snapshot ∪ batch) — the same exchange any MERGE needs — plus
    the full-snapshot rewrite that is the manifest sink's contract.
    For high-frequency small batches at 100 TB, land via the append
    sink and merge on a cadence (the compaction trade); this sink
    is the low-latency always-queryable end of that dial.
    """

    def __init__(
        self,
        path: str,
        keys: list[str],
        order_col: str,
        app_id: str = _DEFAULT_APP_ID,
    ):
        self.path = path
        self.keys = keys
        self.order_col = order_col
        self.app_id = app_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..sinks.manifest import merge_write

        if _skip(self.path, self.app_id, batch_id):
            return
        merge_write(
            batch_df,
            self.path,
            keys=self.keys,
            order_col=self.order_col,
            meta={
                "batch_id": batch_id,
                "max_batch_id": batch_id,
                "ledger_app_id": self.app_id,
            },
        )
