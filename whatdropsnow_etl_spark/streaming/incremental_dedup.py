"""Streaming dedup against a growing MinHash band index.

The streaming twin of ``operators.incremental_dedup_minhash``: each
micro-batch of documents is probed against the persisted band-index
store (which doc in the existing corpus does each new doc near-match),
matches land in an output directory, and the batch's own bucket rows
are appended to the store so later batches — and later restarts —
see them. State is the INDEX RELATION, not document text: the store
grows by O(bands) rows per doc and the corpus is never re-shingled.

Same persist-registers-not-data pattern as the streaming HLL
maintenance (`tests/test_streaming.py`). At-least-once caveat: a
replayed batch appends its bucket rows twice in plain parquet, so
the probe drops duplicate (doc_id, band) rows before counting —
band counts stay exact under replay — and excludes
``batch_doc == index_doc`` pairs (a replayed batch probes a store
that already holds its own rows; without the guard every replayed
doc would "match" itself and be quarantined as a dup). The matches
output can still carry a replayed batch's rows twice (dedupe
downstream on (batch_doc, index_doc), or hold both outputs in a
transactional table format with MERGE in production).

Within-batch duplicates are intentionally NOT probed here (they
arrive together; run minhash_lsh_pairs on the batch if needed) —
this operator answers "is this NEW doc a near-dup of anything seen
BEFORE", the gating question for streaming corpus ingestion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import incremental_dedup_minhash, minhash_band_index


def probe_and_grow_index(
    store_dir: str,
    matches_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
):
    """A ``foreachBatch`` function: probe the batch against the
    store, append matches, then fold the batch's buckets in."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            buckets = minhash_band_index(
                batch_df, text_col, id_col, k, num_hashes, bands
            )
            if os.path.isdir(store_dir):
                # drop replayed bucket rows so replays can't inflate
                # the shared-band counts; the store's id column is
                # ALWAYS literally 'doc_id' (minhash_band_index
                # aliases the caller's id_col to it), so dedup on
                # that — using the caller's name crashed any
                # non-default id_col with UNRESOLVED_COLUMN
                index = spark.read.parquet(store_dir).dropDuplicates(
                    ["doc_id", "band"]
                )
                matches = (
                    incremental_dedup_minhash(
                        batch_df, index, text_col, id_col, k,
                        num_hashes, bands,
                    )
                    # a replayed batch probes a store that already
                    # holds ITS OWN bucket rows (write landed, offset
                    # commit didn't): without this, every replayed
                    # doc "matches" itself and unique docs get
                    # quarantined as dups downstream
                    .where(F.col("batch_doc") != F.col("index_doc"))
                    .withColumn(
                        "batch_id", F.lit(batch_id).cast("bigint")
                    )
                )
                matches.write.mode("append").format("parquet").save(matches_dir)
            buckets.write.mode("append").format("parquet").save(store_dir)
        finally:
            batch_df.unpersist()

    return apply
