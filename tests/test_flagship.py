"""Flagship segmentation semantics (reference sql.py contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from whatdropsnow_etl_spark.plans import flagship_segmentation


def test_entry_runs_and_schema(spark):
    df = entrymod.entry(spark)
    assert df.columns == [
        "retailer_name",
        "segment",
        "retailer_rank",
        "avg_product_price_usd",
    ]
    assert df.count() > 0


def test_flagship_drops_top_segment_and_ranks(tables):
    out = flagship_segmentation(
        tables["lineitem"], tables["supplier"], tables["part"]
    )
    rows = out.collect()
    assert all(r["segment"] != "Very High End" for r in rows)
    # within each segment ranks start at 1 and prices are non-increasing
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
    for seg_rows in by_seg.values():
        ranks = [r["retailer_rank"] for r in seg_rows]
        assert min(ranks) == 1
        prices = [r["avg_product_price_usd"] for r in seg_rows]
        assert prices == sorted(prices, reverse=True)


def test_flagship_broadcasts_dims(tables):
    plan = flagship_segmentation(
        tables["lineitem"], tables["supplier"], tables["part"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
