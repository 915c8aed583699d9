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

Readers see every version as a complete table snapshot (append mode
carries the previous file list forward), so a downstream batch job
can pin a version while the stream keeps committing — the
batch/stream isolation Delta calls snapshot isolation, built from
the same two primitives (file-list manifests + atomic pointer
swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sinks.manifest import commit_write, committed_meta, latest_meta


def _max_committed_batch_id(path: str) -> int:
    """O(1) idempotence ledger: the cumulative ``max_batch_id`` the
    sinks record in every manifest's meta. foreachBatch ids are
    monotone within a checkpoint and only the most recent batch is
    ever redelivered, so ``batch_id <= max`` IS the committed test —
    without rescanning every retained manifest per batch (O(V²) over
    a stream's life) and robust to ``vacuum`` dropping old manifests
    (the latest one always survives). Tables written before this
    field existed (or with interleaved manual commits) fall back to
    the full ledger scan once."""
    m = latest_meta(path)
    if m is None:
        return -1
    if "max_batch_id" in m:
        return int(m["max_batch_id"])
    ids = [
        x["batch_id"] for x in committed_meta(path) if "batch_id" in x
    ]
    return max(ids) if ids else -1


class ManifestStreamSink:
    """``stream.writeStream.foreachBatch(ManifestStreamSink(path))``."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _max_committed_batch_id(self.path):
            return  # redelivery of an already-published batch
        commit_write(
            batch_df,
            self.path,
            mode="append",
            meta={"batch_id": batch_id, "max_batch_id": batch_id},
        )


class ManifestMergeStreamSink:
    """Exactly-once streaming UPSERT into the manifest table —
    ``stream.writeStream.foreachBatch(ManifestMergeStreamSink(path,
    keys, order_col))``: each micro-batch MERGEs (latest-wins by
    ``order_col``, ties to the batch) into the current snapshot and
    publishes the result as one new atomic version. The streaming
    CDC-apply shape: a keyed change stream materialized as a
    queryable, time-travelable table.

    Same idempotence ledger as the append sink (batch id in
    manifest meta; a redelivered batch is skipped before any work) —
    and because each version is the FULL merged snapshot, skipping a
    redelivered batch leaves the table exactly as the first
    delivery did: replay-safe without tombstones or dedup reads.

    Scale: per batch, one key-partitioned window over
    (snapshot ∪ batch) — the same exchange any MERGE needs — plus
    the full-snapshot rewrite that is the manifest sink's contract.
    For high-frequency small batches at 100 TB, land via the append
    sink and merge on a cadence (the compaction trade); this sink
    is the low-latency always-queryable end of that dial.
    """

    def __init__(self, path: str, keys: list[str], order_col: str):
        self.path = path
        self.keys = keys
        self.order_col = order_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..sinks.manifest import merge_write

        if batch_id <= _max_committed_batch_id(self.path):
            return
        merge_write(
            batch_df,
            self.path,
            keys=self.keys,
            order_col=self.order_col,
            meta={"batch_id": batch_id, "max_batch_id": batch_id},
        )
