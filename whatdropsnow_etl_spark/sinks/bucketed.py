"""Bucketed parquet tables — shuffle-free co-located joins.

The 100 TB join strategy the brief calls out directly: persist both
fact tables bucketed (and sorted) by the join key, and every
subsequent equi-join on that key runs with ZERO exchange — Spark
reads matching buckets pair-wise and (when sorted) merge-joins
in place. For a fact-fact join that would otherwise shuffle
terabytes per query, pre-bucketing amortizes one write-time shuffle
across every downstream join/aggregation on that key.

Bucket pruning: an equality filter on the bucket column scans 1/N of
the files. GroupBy on the bucket key also skips its exchange.

Spark only honors bucket metadata through the catalog
(``saveAsTable``), not plain-path parquet — so this sink manages
named tables in the session warehouse.

No reference twin (the reference delegates storage to Postgres;
db.py:51-67 relies on table indexes instead) — this is the Spark
re-expression of "the storage layer carries the join structure".

Pinned by tests/test_bucketed_sink.py: the bucketed-bucketed join
plan contains no Exchange, and results match the plain join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    parquet table and return the catalog-backed DataFrame.

    ``num_buckets`` must match across tables that will join
    bucket-to-bucket (Spark requires equal bucket counts to elide the
    exchange). Sorting by the bucket key upgrades the join to a
    zero-sort SortMergeJoin read.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    if mode == "overwrite":
        # saveAsTable(overwrite) replaces a *cataloged* table, but a
        # fresh session whose warehouse dir carries an orphaned
        # location from a previous run fails with
        # LOCATION_ALREADY_EXISTS — drop both the entry and the dir.
        # When the table IS cataloged, ask the catalog for its real
        # location (a guessed <warehouse>/<name> path is wrong for
        # database-qualified names or a non-default current database).
        spark = df.sparkSession
        loc = None
        if spark.catalog.tableExists(table):
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
                if r["col_name"] == "Location":
                    loc = r["data_type"].removeprefix("file:")
                    break
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        elif "." not in table and spark.catalog.currentDatabase() == "default":
            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            )
            loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
        # qualified names / non-default databases with no catalog
        # entry: there is no authoritative orphan-dir to guess, but a
        # CLEAN warehouse must still work — attempt the write and only
        # fail (with guidance) if an orphan location actually blocks
        # it, instead of refusing upfront
        if loc and os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    try:
        writer.saveAsTable(table)
    except Exception as e:  # noqa: BLE001
        if "LOCATION_ALREADY_EXISTS" in str(e):
            raise ValueError(
                f"table {table!r} is not in the catalog but its"
                " location already exists (an orphan from a previous"
                " run); the orphan-dir guess is only safe for simple"
                " names in the default database — clear the stale"
                " location manually"
            ) from e
        raise
    return df.sparkSession.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read-back; bucket metadata rides along for free."""
    return spark.table(table)
