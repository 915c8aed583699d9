"""DuckDB cross-check of the hash-critical queries — the same
comparison the driver's correctness gate performs, at sf0.001 for
speed (the driver runs sf0.01; tools/parity_check.py replays that)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from whatdropsnow_etl_spark.functions.timeutil import ts_micros
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
    """If the testdata ever reverts to INT64 TIMESTAMP(NANOS), Spark's
    `DIV 1000` truncation must agree with DuckDB's read-truncation.
    With the current µs data there are no sub-µs nanos to witness, so
    this degrades to asserting exact µs equality Spark-vs-DuckDB."""
    from whatdropsnow_etl_spark.sources import load_table

    sdf = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", ts_micros("ts").alias("ts_us"))
    )
    srows = {r["event_id"]: r["ts_us"] for r in sdf.collect()}
    dcols, drows = duck(SF_SMALL, "SELECT event_id, epoch_us(ts) AS ts_us FROM events")
    assert len(srows) == len(drows)
    for event_id, ts_us in drows:
        assert srows[event_id] == ts_us, event_id


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
