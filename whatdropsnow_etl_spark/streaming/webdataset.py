"""Exactly-once streaming WebDataset shard writer.

The batch sink (sinks/webdataset.py) packs a corpus into training
tar shards; a live ingestion pipeline wants the same layout to GROW
as micro-batches land — without a redelivered batch duplicating
samples (foreachBatch is at-least-once). The unit of publish here is
one BATCH DIRECTORY: each distinct ``batch_id`` writes its shards
under ``batch-{id:08d}/`` through the batch sink (so per-directory
determinism, member grouping and the manifest file are inherited),
then commits by creating a ``_COMMITTED`` marker with O_EXCL — the
drift-gate marker pattern. A redelivered batch whose marker exists
skips before any write; a crash BETWEEN shard write and marker
leaves an uncommitted directory that the redelivery simply
overwrites — the batch sink's tars are a pure function of the data
(zeroed tar metadata, id-sorted members), so the rewrite produces
the identical bytes and the commit point stays atomic.

Readers list COMMITTED batch directories only (marker present) —
a loader never sees a torn batch. Shard count per batch is the
writer's choice; loaders shuffle across the union of shards, so
many-small-batches vs few-big-batches is a packing knob, not a
semantics change (compact cold batches offline with the batch sink
if the shard census matters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sinks.webdataset import read_webdataset_shards, write_webdataset_shards


class StreamingWebDatasetSink:
    """foreachBatch callable: exactly-once tar shard publication."""

    def __init__(
        self,
        out_dir: str,
        n_shards: int = 4,
        id_col: str = "doc_id",
        payload_col: str = "payload",
        ext: str = "bin",
        meta_cols: tuple[str, ...] = (),
        seed: int = 42,
    ):
        self.out_dir = out_dir
        self.kw = dict(
            n_shards=n_shards,
            id_col=id_col,
            payload_col=payload_col,
            ext=ext,
            meta_cols=meta_cols,
            seed=seed,
        )

    def batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"batch-{int(batch_id):08d}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        bdir = self.batch_dir(batch_id)
        marker = os.path.join(bdir, "_COMMITTED")
        if os.path.exists(marker):
            return  # at-least-once redelivery: already published
        write_webdataset_shards(batch_df, bdir, **self.kw)
        with open(marker, "x") as f:  # O_EXCL: the atomic commit point
            f.write("")


def read_webdataset_stream_output(
    spark: SparkSession, out_dir: str, ext: str = "bin"
) -> DataFrame:
    """Union of every COMMITTED batch directory's shards — an
    uncommitted (torn) directory is invisible. Returns the batch
    sink reader's (doc_id, payload, meta) shape plus ``batch_id``."""
    from functools import reduce

    from pyspark.sql import functions as F

    parts = []
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        bdir = os.path.join(out_dir, name)
        if not name.startswith("batch-"):
            continue
        if not os.path.exists(os.path.join(bdir, "_COMMITTED")):
            continue
        parts.append(
            read_webdataset_shards(spark, bdir, ext=ext).withColumn(
                "batch_id", F.lit(int(name.split("-")[1])).cast("bigint")
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "doc_id bigint, payload binary, meta string, batch_id bigint"
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
