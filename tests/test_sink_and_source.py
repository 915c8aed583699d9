"""Upsert parquet sink and paginated JSON-API source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.sinks import UpsertParquetSink
from whatdropsnow_etl_spark.sources.json_api import (
    PageFetchError,
    fetch_pages,
    normalize_pages,
)


def test_upsert_sink_latest_wins(spark, tables, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "t"), ["user_id", "event_type"], "ts")
    ev = tables["events"].select("user_id", "event_type", "ts", "value")
    sink.upsert(ev.limit(400))
    sink.upsert(ev)  # second batch supersedes overlapping keys
    state = sink.read(spark)
    n_keys = ev.select("user_id", "event_type").distinct().count()
    assert state.count() == n_keys
    # newest ts wins per key
    mx = ev.groupBy("user_id", "event_type").agg(F.max("ts").alias("mx"))
    assert state.join(mx, ["user_id", "event_type"]).where(
        F.col("ts") != F.col("mx")
    ).count() == 0
    # compaction preserves state exactly
    before = sorted([tuple(r) for r in state.collect()], key=repr)
    sink.compact(spark)
    after = sorted([tuple(r) for r in sink.read(spark).collect()], key=repr)
    assert before == after


def _api(records, fail_pages=(), total=None):
    """Fake paginated API; fails transiently once per page in fail_pages."""
    failed = set()

    def fetch(page, page_size):
        if page in fail_pages and page not in failed:
            failed.add(page)
            raise ConnectionError("transient")
        lo = (page - 1) * page_size
        return {
            "data": records[lo : lo + page_size],
            "meta": {
                "page": {
                    "total_count": total if total is not None else len(records),
                    "current_page": page,
                }
            },
        }

    return fetch


def test_fetch_pages_and_normalize(spark, tmp_path):
    records = [
        {"id": str(i), "attributes": {"product_id": i % 7, "price_usd": f"{i}.50"}}
        for i in range(25)
    ]
    out = str(tmp_path / "pages")
    landed = fetch_pages(
        _api(records, fail_pages=(2,)), out, page_size=10, sleep=lambda s: None
    )
    assert landed == 25
    df = normalize_pages(
        spark,
        out,
        {
            "id": ("id", "string"),
            "product_id": ("attributes.product_id", "int"),
            "price_usd": ("attributes.price_usd", "decimal(12,2)"),
        },
    )
    assert df.count() == 25
    assert dict(df.dtypes) == {
        "id": "string",
        "product_id": "int",
        "price_usd": "decimal(12,2)",
    }
    assert df.agg(F.sum(F.col("product_id"))).collect()[0][0] == sum(
        i % 7 for i in range(25)
    )


def test_fetch_pages_gives_up_after_retries(tmp_path):
    def always_fail(page, page_size):
        raise ConnectionError("down")

    with pytest.raises(PageFetchError):
        fetch_pages(always_fail, str(tmp_path / "p"), sleep=lambda s: None)


def test_fetch_pages_ignores_404(tmp_path):
    def gone(page, page_size):
        return None

    assert fetch_pages(gone, str(tmp_path / "p"), sleep=lambda s: None) == 0


def test_upsert_sink_rejects_bad_batch(spark, tables, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "t2"), ["user_id"], "ts")
    with pytest.raises(ValueError, match="missing columns"):
        sink.upsert(tables["events"].select("event_id"))


def test_upsert_valid_skips_orphans(spark, tables, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "t3"), ["l_orderkey", "l_linenumber"], "l_shipdate")
    li = tables["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate"
    )
    present = tables["part"].where(F.col("p_partkey") % 7 != 0)
    batch, orphans = sink.upsert_valid(li, present, "l_partkey", "p_partkey")
    n_orphan = orphans.count()
    n_valid = sink.read(spark).count()
    assert n_orphan > 0
    # state holds one row per surviving key (latest wins)
    valid_rows = li.join(
        present, li.l_partkey == present.p_partkey, "left_semi"
    )
    assert valid_rows.count() + n_orphan == li.count()
    assert n_valid == valid_rows.select("l_orderkey", "l_linenumber").distinct().count()
    # orphans really reference missing parents
    assert orphans.join(present, orphans.l_partkey == present.p_partkey).count() == 0
