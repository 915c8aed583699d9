"""Generic file-format sources: schema-enforced CSV / JSON-lines /
ORC readers.

The reference ingests JSON API pages; real pipelines also land CSV
drops and columnar ORC. Common discipline for all three:

- ALWAYS pass an explicit schema. Inference scans the data once
  extra (the whole file for JSON/CSV) and can silently drift types
  between runs — at 100 TB both are unacceptable. `mode=FAILFAST`
  surfaces corrupt rows at read time instead of nulling them.
- CSV/JSON are row formats: no column pruning or predicate pushdown
  reaches the file, so the pattern is land → convert to parquet
  (`sinks/partitioned_parquet.py`) once, query columnar forever.
  ORC is columnar with the same pushdown machinery as parquet and
  needs no conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC carries its schema; filters/pruning push down like parquet."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML drops (feeds, sitemaps, legacy exports) via Spark 4's
    built-in XML source. Same discipline as CSV/JSONL: pass a schema
    in production (inference parses everything once extra); XML is a
    row format, so land -> convert to parquet before querying. The
    reader splits files on ``row_tag`` boundaries, so a single huge
    file still parallelizes across executors."""
    reader = spark.read.format("xml").option("rowTag", row_tag).option(
        "mode", "FAILFAST"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset ingestion via Spark's built-in ``binaryFile``
    source: one row per file with (path STRING, modificationTime
    TIMESTAMP, length BIGINT, content BINARY) — the landing step
    that feeds the multimodal operators (operators/multimodal.py
    treats image/audio/video as opaque binary + typed metadata;
    this reader produces exactly that shape from a directory of
    assets).

    ``glob`` maps to ``pathGlobFilter`` (e.g. ``*.png``) and is
    applied during LISTING, before any byte is read. ``max_bytes``
    guards the executor: files above it fail fast at planning via
    a filter on the ``length`` metadata column — Spark prunes the
    content read for length-only predicates, so the guard scans no
    file bodies (binaryFile supports content-skipping for
    length/path-only queries). One file = one row = one task unit;
    partition parallelism comes from the file COUNT, so pack many
    assets per directory rather than one giant file.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV landing with corrupt-row quarantine: returns
    (good, bad) — the ingestion posture when a feed is too valuable
    to FAILFAST on one mangled row but silently nulling bad rows
    (plain PERMISSIVE) would poison downstream stats.

    ``good`` carries the declared schema; ``bad`` is
    (_corrupt_record string) holding each unparseable raw line for
    the quarantine sink / replay queue. The split is two filters
    over ONE cached read: Spark refuses a query that references
    only the corrupt-record column of an un-materialized CSV scan
    (SPARK-21610 — the column exists only while parsing), and
    without the cache the file would be parsed twice anyway. The
    cache is row-format-scan-sized; at 100 TB quarantine splits run
    as part of the land-to-parquet conversion job, which
    materializes everything once regardless.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # COPY before add: StructType.add mutates in place and returns
    # self, so appending to the caller's schema object would make
    # their later reads expect a phantom _corrupt_record column (and
    # a second call here would add it twice)
    full = StructType(list(schema.fields)).add("_corrupt_record", "string")
    df = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return good, bad
