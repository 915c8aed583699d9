"""Streaming boilerplate-line removal against a growing
line-frequency index.

The streaming twin of ``operators.line_dedup_incremental``: each
micro-batch of documents is cleaned against the persisted line
frequencies of everything ingested before it PLUS the batch's own
counts (exactly what a full ``line_dedup`` over corpus-so-far ∪
batch decides for those docs — counts are additive over disjoint
doc sets), the cleaned docs land in an output directory, and the
batch's own line counts fold into the store so later batches — and
later restarts — see them. State is the INDEX RELATION (distinct
line keys × counts), not document text: the corpus is never
re-exploded. The ``minhash_band_index`` / streaming-HLL
persist-registers-not-data pattern applied to exact line counts.

At-least-once handling: foreachBatch can redeliver a batch after
its store append landed. Counts can't be deduplicated row-wise like
the minhash twin's (doc_id, band) bucket rows, so every stored
count row carries its ``batch_id`` and the read path collapses
replays with a per-(key, batch) MAX before summing across batches —
a redelivered append is byte-identical per (key, batch), so the
fold stays exact. The clean path additionally EXCLUDES the current
batch_id when loading the index, so a replay is judged against
exactly the index the first delivery saw (not one polluted by its
own landed counts) — the replayed cleaned rows are byte-identical
to the originals, and "dedupe downstream on doc_id" picks a
deterministic winner. Duplicated rows can still exist in out_dir
(dedupe downstream, or land in the manifest sink for exactly-once).

Prefix semantics, stated plainly: batch i is judged against counts
from batches 1..i only. A line that crosses ``min_docs`` in a LATER
batch is removed from that batch onward, never retroactively — the
inherent contract of single-pass streaming dedup (the batch twin
re-run over the full corpus is the retroactive version).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import line_dedup_incremental, line_freq_index


def load_line_index(
    spark, store_dir: str, exclude_batch_id: int | None = None
) -> DataFrame:
    """Replay-safe fold of the persisted per-batch count relations:
    MAX per (key, batch) collapses redelivered appends, SUM across
    batches is the corpus-so-far frequency. ``exclude_batch_id``
    drops one batch's rows before the fold — the clean path passes
    the CURRENT batch id so a redelivered batch is judged against
    exactly the index the first delivery saw (its own landed counts
    would otherwise double-count its lines and make the replayed
    ``text_clean``/``n_removed`` diverge from the original)."""
    raw = spark.read.parquet(store_dir)
    if exclude_batch_id is not None:
        raw = raw.where(F.col("batch_id") != F.lit(exclude_batch_id))
    return (
        raw.groupBy("__k", "batch_id")
        .agg(F.max("n_docs").alias("n_docs"))
        .groupBy("__k")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )


def clean_and_grow_line_index(
    store_dir: str,
    out_dir: str,
    min_docs: int = 5,
    line_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_lines: bool = False,
):
    """A ``foreachBatch`` function: clean the batch against the
    store (plus its own counts), append the cleaned docs, then fold
    the batch's line counts in. ``line_tokens`` and ``hash_lines``
    are pinned into the store's keys — probe and build must agree
    (the line_dedup_incremental contract)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            if os.path.isdir(store_dir):
                index = load_line_index(
                    spark, store_dir, exclude_batch_id=batch_id
                )
            else:
                index = spark.createDataFrame(
                    [], "__k bigint, n_docs bigint"
                ) if hash_lines else spark.createDataFrame(
                    [], "__k string, n_docs bigint"
                )
            cleaned = line_dedup_incremental(
                batch_df,
                index,
                min_docs=min_docs,
                line_tokens=line_tokens,
                id_col=id_col,
                text_col=text_col,
                hash_lines=hash_lines,
            ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            cleaned.write.mode("append").format("parquet").save(out_dir)
            counts = line_freq_index(
                batch_df,
                line_tokens=line_tokens,
                id_col=id_col,
                text_col=text_col,
                hash_lines=hash_lines,
            ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            counts.write.mode("append").format("parquet").save(store_dir)
        finally:
            batch_df.unpersist()

    return apply
