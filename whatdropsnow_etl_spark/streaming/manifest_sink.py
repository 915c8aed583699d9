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

from ..sinks.manifest import commit_write, committed_meta


class ManifestStreamSink:
    """``stream.writeStream.foreachBatch(ManifestStreamSink(path))``."""

    def __init__(self, path: str):
        self.path = path

    def _committed_batch_ids(self) -> set[int]:
        return {
            m["batch_id"] for m in committed_meta(self.path) if "batch_id" in m
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed_batch_ids():
            return  # redelivery of an already-published batch
        commit_write(
            batch_df, self.path, mode="append", meta={"batch_id": batch_id}
        )
