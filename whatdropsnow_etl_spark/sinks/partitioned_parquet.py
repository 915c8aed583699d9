"""Date-partitioned parquet sink with pruning-friendly layout.

The lakehouse default for an events table at 100 TB: partition
directories by event date so time-ranged queries list and read only
the matching partitions (Catalyst turns a ``event_date`` filter into
PartitionFilters — pruning happens at file-listing time, before any
I/O). Within each date the writer shuffles rows TO their partition
first: without that, every upstream task writes a file into every
date it happens to hold, and a 1000-task stage over a year of data
emits ~365,000 small files — the classic small-file explosion. With
it, each date gets ``files_per_partition`` evenly-sized files.

Sorting within files by the secondary key keeps parquet row-group
min/max stats tight, so predicates on that key skip row groups even
inside a partition (the poor man's Z-order; real multi-column
clustering would interleave key bits the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_events(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    files_per_partition: int = 1,
    sort_col: str | None = "user_id",
) -> None:
    """Write events as parquet partitioned by event_date(ts)."""
    df = events.withColumn("event_date", F.to_date(F.col(ts_col)))
    if files_per_partition == 1:
        df = df.repartition(F.col("event_date"))
    else:
        # splitting a DATE into N files needs a salt in the hash —
        # repartition(n, event_date) hashes the date alone, so every
        # date still lands whole in one task (a skewed 2 TB day would
        # be written by a single task) and total parallelism
        # collapses to n; the deterministic ts-derived salt keeps the
        # layout reproducible across retries (no rand()), and the
        # EXPLICIT partition count keeps AQE from coalescing the
        # salted exchange back into one task at small volumes
        salt = F.pmod(
            F.xxhash64(F.col(ts_col)), F.lit(files_per_partition)
        )
        n_parts = int(
            events.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        df = df.repartition(
            max(n_parts, files_per_partition),
            F.col("event_date"),
            salt.alias("__salt"),
        )
    if sort_col is not None:
        df = df.sortWithinPartitions("event_date", sort_col)
    df.write.partitionBy("event_date").mode("overwrite").parquet(path)


def read_partitioned_events(spark: SparkSession, path: str) -> DataFrame:
    """Read back; date filters prune partitions at listing time."""
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a fragmented parquet directory to ~target-sized files.

    Streaming sinks and frequent small appends leave directories of
    KB-scale files; at 100 TB the file-listing and per-file open
    costs dominate scans long before the bytes do. Rewrite sizes the
    file count from the ACTUAL data volume (sum of file sizes — no
    data scan needed to plan), coalesces without a shuffle, and
    swaps directories atomically-ish (rename); a transactional table
    format would make the swap a metadata commit instead.

    Returns the number of files after compaction.
    """
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    tmp = path.rstrip("/") + "__compact_tmp"
    # preserve a Hive layout: a flat rewrite would demote discovered
    # partition directories (event_date=...) to plain data columns
    # and silently lose listing-time pruning for every later query
    part_cols = sorted(
        {
            d.split("=", 1)[0]
            for d in os.listdir(path)
            if "=" in d and os.path.isdir(os.path.join(path, d))
        }
    )
    df = spark.read.parquet(path).coalesce(n_files)
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def fragmentation_report(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int = 8 * 1024 * 1024,
) -> DataFrame:
    """The detector half of the compaction loop: one row per parquet
    file under ``path`` with its size and row count, plus the
    aggregate verdict ``compact_parquet`` would act on.

    File sizes come from a driver-side listing (bounded by the file
    COUNT — the very thing this report exists to keep small; no data
    is scanned for sizes). Row counts come from ONE distributed scan
    grouped by ``input_file_name()`` — metadata-only column pruning
    (count(1) reads no columns, parquet answers from footers).

    Returns (file, bytes, n_rows, is_small) ordered by bytes asc,
    where ``is_small`` marks files under ``small_file_bytes``.
    Callers gate compaction on e.g.
    ``df.where("is_small").count() / df.count() > 0.5`` or compare
    ``df.count()`` against ceil(sum(bytes)/target_file_bytes), the
    file count a rewrite would produce.
    """
    import os

    sizes = [
        (os.path.join(root, f), os.path.getsize(os.path.join(root, f)))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]
    sizes_df = spark.createDataFrame(sizes, "file string, bytes bigint")
    counts = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("__uri"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        # input_file_name returns a PERCENT-ENCODED URI (file:///a%20b);
        # the os.walk listing has raw paths — strip the scheme, protect
        # literal '+' (url_decode is form-decoding: '+' -> space), then
        # percent-decode so 'a b.parquet' joins its own count instead of
        # silently reporting 0 rows
        .select(
            F.url_decode(
                F.regexp_replace(
                    F.regexp_replace("__uri", "^file:/*", "/"), r"\+", "%2B"
                )
            ).alias("file"),
            "n_rows",
        )
    )
    return (
        sizes_df.join(counts, "file", "left")
        .select(
            "file",
            "bytes",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            (F.col("bytes") < small_file_bytes).alias("is_small"),
        )
        .orderBy("bytes", "file")
    )
