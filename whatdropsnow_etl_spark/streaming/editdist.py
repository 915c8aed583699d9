"""Streaming edit-distance near-dup maintenance against a growing
document store.

The streaming twin of ``operators.editdist_pairs_incremental`` —
the third member of the incremental-maintenance triple (MinHash
band probe ``incremental_dedup.py``, line-frequency index
``line_dedup.py``, and now Levenshtein pairs): each micro-batch of
documents is paired against everything ingested BEFORE it plus
itself (batch×batch + batch×store, never store×store), the new
pairs land in an output directory, and the batch's docs fold into
the store so later batches — and later restarts — see them.

Coverage invariant (pytest-pinned): the UNION of per-batch new-pair
outputs over any micro-batch split equals the full
``editdist_pairs`` relation over the whole corpus, each pair
emitted exactly once — because a pair (a, b) with a arriving no
later than b is exactly "a in store (or same batch), b in batch"
at b's batch. This is what makes the per-batch cost
batch×block-population while the discovered relation converges to
the full quadratic-blocked answer.

State is the DOCUMENT relation restricted to the pairing columns
(id, text, lang, length) — unlike the line/minhash twins the final
DP needs the matched partner's text, so the store carries it; per
batch only the candidate partners' texts are read back (the
incremental operator's text join), never re-paired store×store.

At-least-once handling mirrors ``line_dedup.py``: stored docs carry
their ``batch_id`` and the load path EXCLUDES the current batch's
rows, so a redelivered batch pairs against exactly the store the
first delivery saw (its own landed docs would otherwise make every
replayed doc pair with itself) — replayed pair rows are
byte-identical and a downstream (lo, hi) dedupe picks a
deterministic winner. Store doc rows may also land twice on
replay; the load path drops duplicate ids before pairing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import editdist_pairs_incremental


def load_doc_store(
    spark,
    store_dir: str,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """Replay-safe read of the persisted doc store: one row per
    doc_id (duplicate appends from redelivered batches collapse),
    optionally excluding one batch's rows (the clean path passes
    the CURRENT batch id)."""
    raw = spark.read.parquet(store_dir)
    if exclude_batch_id is not None:
        raw = raw.where(F.col("batch_id") != F.lit(exclude_batch_id))
    return raw.dropDuplicates(["doc_id"]).drop("batch_id")


def pair_and_grow_doc_store(
    store_dir: str,
    pairs_dir: str,
    max_dist: int = 16,
    prefix: int = 80,
    band_width: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    len_col: str = "n_chars",
    max_band_docs: int | None = 2000,
    qgram_prefilter: bool = True,
):
    """A ``foreachBatch`` function: emit the batch's new pairs
    (batch×batch + batch×store), append them, then fold the batch's
    docs into the store. Parameters are pinned into the pairing
    semantics — probe and store must agree across batches (the
    line_dedup_incremental contract)."""
    cols = [id_col, text_col, lang_col, len_col]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(*cols).persist()
        try:
            if os.path.isdir(store_dir):
                corpus = load_doc_store(
                    spark, store_dir, exclude_batch_id=batch_id
                )
            else:
                corpus = spark.createDataFrame(
                    [], batch.schema
                )
            pairs = editdist_pairs_incremental(
                batch,
                corpus,
                max_dist=max_dist,
                prefix=prefix,
                band_width=band_width,
                id_col=id_col,
                text_col=text_col,
                lang_col=lang_col,
                len_col=len_col,
                max_band_docs=max_band_docs,
                qgram_prefilter=qgram_prefilter,
            ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            pairs.write.mode("append").format("parquet").save(pairs_dir)
            batch.withColumn(
                "batch_id", F.lit(batch_id).cast("bigint")
            ).write.mode("append").format("parquet").save(store_dir)
        finally:
            batch.unpersist()

    return apply
