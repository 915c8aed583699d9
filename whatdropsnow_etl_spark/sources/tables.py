"""Parquet table loaders.

Columnar-scan discipline: callers select the columns they need
immediately after ``load_table`` so Catalyst prunes the parquet
``ReadSchema`` — at 100 TB a scan that materializes unused columns
is the first bottleneck. Filters applied on the returned DataFrame
push down to the scan (``PushedFilters``) for row-group skipping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# parquet TIMESTAMP(NANOS) columns: surfaced by Spark as epoch-nanos
# longs (spark.sql.legacy.parquet.nanosAsLong) and converted here to
# timestamps at microsecond precision. The raw values carry non-zero
# sub-microsecond nanos; `DIV 1000` truncates toward zero, which is
# exactly what DuckDB's epoch_us/make_timestamp cast does, so the
# oracle twins agree (pinned by tests/test_oracle_parity.py).
NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# path -> inferred StructType. Schema inference reads parquet footers
# in a Spark job per read call; caching it makes repeat loads (and all
# of plan construction) job-free. At 100 TB the same move — passing a
# known schema to the reader — skips footer reads over thousands of
# files.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # The testdata parquet carries INT64 TIMESTAMP(NANOS) columns that
    # Spark refuses to read without this conf. It must hold on the
    # *caller's* session (driver harnesses build their own), and it is
    # runtime-settable, so set it here idempotently rather than relying
    # on our session factory having been used.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    for col in NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table. Lazy: nothing is scanned until an
    action runs, and Catalyst prunes columns/filters per query."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
