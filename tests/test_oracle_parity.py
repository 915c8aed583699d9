"""DuckDB cross-check of the hash-critical queries — the same
comparison the driver's correctness gate performs, at sf0.001 for
speed (the driver runs sf0.01; tools/parity_check.py replays that)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from whatdropsnow_etl_spark.sources import TABLE_NAMES

# the queries most sensitive to cross-engine float/regex/window drift
CRITICAL = [
    "flagship_segmentation",
    "q1_pricing_summary",
    "window_moving_avg",
    "sessionize",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "quality_score",
    "rollup_flag_status",
    "q8_market_share",
    "curation_funnel",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q22_sales_opportunity",
]


def duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@pytest.mark.parametrize("name", CRITICAL)
def test_matches_duckdb(spark, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF_SMALL)
    scols = sorted(sdf.columns)
    sidx = [sdf.columns.index(c) for c in scols]
    srows = sorted([tuple(r[i] for i in sidx) for r in sdf.collect()], key=repr)
    dcols, draw = duck(SF_SMALL, sql)
    didx = [dcols.index(c) for c in sorted(dcols)]
    drows = sorted([tuple(r[i] for i in didx) for r in draw], key=repr)
    assert scols == sorted(dcols)
    assert len(srows) == len(drows)
    assert srows == drows


def test_nanos_truncation_pinned(spark):
    """Pin the sub-microsecond truncation contract: the generator's raw
    epoch-nanos values carry NON-zero sub-microsecond nanos (they are not
    ‰1000), Spark's `ts DIV 1000` truncates toward zero, and DuckDB's
    `epoch_us(ts)` on the TIMESTAMP_NS column truncates identically. If
    the oracle side ever switched to rounding, this test catches the
    silent half-microsecond divergence before the driver gate does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # raw INT64 nanos straight from the file (DuckDB itself truncates
    # TIMESTAMP_NS -> micros at read, so it can't witness the raw nanos)
    t = pq.read_table(f"{SF_SMALL}/events.parquet", columns=["event_id", "ts"])
    raw_ns = dict(
        zip(t.column("event_id").to_pylist(), t.column("ts").cast(pa.int64()).to_pylist())
    )
    sub_us = [v for v in raw_ns.values() if v % 1000 != 0]
    assert sub_us, "fixture lost its sub-microsecond nanos; test needs regenerating"

    # Spark view of the same column after load_table's DIV 1000 conversion
    from whatdropsnow_etl_spark.sources import load_table
    from pyspark.sql import functions as F

    sdf = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", F.unix_micros("ts").alias("ts_us"))
    )
    srows = {r["event_id"]: r["ts_us"] for r in sdf.collect()}
    dcols, drows = duck(SF_SMALL, "SELECT event_id, epoch_us(ts) AS ts_us FROM events")
    for event_id, ts_us in drows:
        # all three agree: Spark DIV 1000 == DuckDB read-truncation == raw // 1000
        assert srows[event_id] == ts_us == raw_ns[event_id] // 1000, event_id


def test_upsert_latest_hash_parity(spark):
    """upsert_latest row-for-row vs DuckDB including the ts_us column —
    the query whose ordering is most sensitive to timestamp truncation."""
    fn = entrymod.queries()["upsert_latest"]
    sql = entrymod.oracle_sql()["upsert_latest"]
    sdf = fn(spark, SF_SMALL)
    scols = sorted(sdf.columns)
    sidx = [sdf.columns.index(c) for c in scols]
    srows = sorted([tuple(r[i] for i in sidx) for r in sdf.collect()], key=repr)
    dcols, draw = duck(SF_SMALL, sql)
    didx = [dcols.index(c) for c in sorted(dcols)]
    drows = sorted([tuple(r[i] for i in didx) for r in draw], key=repr)
    assert scols == sorted(dcols)
    assert srows == drows
