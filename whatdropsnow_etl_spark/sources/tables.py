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

# Timestamp columns per table. The testdata's physical encoding has
# changed between rounds (INT64 TIMESTAMP(NANOS) -> plain
# timestamp[us] with no UTC flag), so the loader normalizes EVERY
# flavor Spark can surface — TIMESTAMP_NTZ (naive µs), TIMESTAMP
# (UTC-flagged µs), or bigint epoch-nanos under nanosAsLong — to one
# canonical type: TIMESTAMP with the session pinned to UTC. With the
# session at UTC, `cast(ntz as timestamp)` is value-preserving and
# matches DuckDB's naive-epoch semantics (DuckDB reads the same
# parquet as naive TIMESTAMP and epoch_us() treats it as UTC).
# Pinned by tests/test_timestamp_ingestion.py across all 3 fixtures.
TS_COLS = {
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
    # Both confs must hold on the *caller's* session (driver harnesses
    # build their own) and are runtime-settable, so set them here
    # idempotently rather than relying on our session factory.
    #   - nanosAsLong: lets Spark read INT64 TIMESTAMP(NANOS) parquet
    #     (as bigint) instead of refusing the file outright.
    #   - session timeZone=UTC: makes ntz->timestamp casts value-
    #     preserving and matches the DuckDB oracle's naive-epoch
    #     semantics for unix_micros/date_trunc/etc.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    dtypes = dict(df.dtypes)
    for col in TS_COLS.get(name, ()):
        dt = dtypes.get(col)
        if dt == "bigint":
            # epoch-nanos long: truncate toward zero to µs, matching
            # DuckDB's epoch_us cast of the same values.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
        elif dt == "timestamp_ntz":
            # naive µs: with the session pinned to UTC this cast is a
            # pure re-tag, no wall-clock shift.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dt == "date":
            # a future regeneration could demote these to DATE; keep
            # the canonical type stable (midnight UTC, matching what
            # DuckDB's TIMESTAMP cast of a DATE does).
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        # dt == "timestamp": already canonical.
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table. Lazy: nothing is scanned until an
    action runs, and Catalyst prunes columns/filters per query."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
