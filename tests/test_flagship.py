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


def test_share_of_parent_sums_to_one(spark, tables):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.plans.olap import share_of_parent

    out = share_of_parent(tables).cache()
    # every (region, nation) with supplier revenue appears once
    assert out.groupBy("r_name", "n_name").count().where(
        F.col("count") > 1
    ).count() == 0
    # shares sum to 1 within each region (exact decimal num/den)
    sums = out.groupBy("r_name").agg(F.sum("share").alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    # revenue-weighted consistency: share == revenue / region total
    joined = out.join(
        out.groupBy("r_name").agg(F.sum("revenue").alias("tot")), "r_name"
    )
    bad = joined.where(
        F.abs(F.col("share") - F.col("revenue") / F.col("tot")) > 1e-9
    )
    assert bad.count() == 0
    out.unpersist()
