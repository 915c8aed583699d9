"""Checkpointed streaming file sink (SURVEY §2.5).

writeStream → parquet with a checkpoint directory gives exactly-once
file output: the checkpoint's WAL records which source offsets each
committed batch covered, so a restarted query resumes without
duplicating or dropping rows. Downstream batch readers see only
committed files (Spark's file-sink metadata log).

Scale: one output file per partition per micro-batch — size
micro-batches (maxFilesPerTrigger / maxOffsetsPerTrigger) and
repartition before the sink so files land near the ~128 MB sweet
spot instead of thousands of small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start an exactly-once parquet sink for a streaming DataFrame.

    ``available_now=True`` drains everything currently available and
    stops (batch-like backfill); False runs continuously.
    """
    w = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
