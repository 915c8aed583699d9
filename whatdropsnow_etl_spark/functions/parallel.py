"""Scan-parallelism floor for under-split inputs (guide §2.5).

A small parquet table is a single row group, so its scan is ONE task
and every narrow operation downstream — hash kernels, explodes,
pandas-UDF batches, iterative aggregates over a cached relation —
runs serially no matter how many cores the session has (the r11
verdict's flat 8→32 scaling signature). ``ensure_min_parallelism``
hash-repartitions by a deterministic key when (and only when) the
relation currently yields fewer partitions than
``sparkContext.defaultParallelism``:

* the added shuffle is input-sized by the very condition that
  triggers it (an under-split input is small);
* downstream aggregations keyed the same way reuse the partitioning
  (no second exchange);
* at production scale the scan has thousands of splits, the branch
  never fires, and no plan changes.

Only use above order-insensitive consumers (min/sum/count/sort_array
aggregations, per-row kernels): hash partitioning is deterministic,
but row order within a partition is not part of any result contract
here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_min_parallelism(df: DataFrame, key: Column | str) -> DataFrame:
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, F.col(key) if isinstance(key, str) else key)
    return df
