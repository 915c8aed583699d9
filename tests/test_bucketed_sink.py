"""Bucketed tables must deliver the promise: equi-joins on the bucket
key with NO exchange in the physical plan, and identical results to
the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.sinks.bucketed import write_bucketed
from whatdropsnow_etl_spark.sources import load_table
from tests.conftest import SF_SMALL


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path so the exchange (or its absence) is
    visible — broadcast joins would hide it."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "bk_orders", "o_orderkey", 8, sort_cols="o_orderkey")
    write_bucketed(lineitem, "bk_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")

    bo = spark.table("bk_orders")
    bl = spark.table("bk_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    # same result as the un-bucketed join
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert joined.count() == plain.count()
    a = joined.agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
    b = plain.agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
    assert a == b


def test_bucketed_groupby_skips_exchange(spark, no_broadcast):
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(lineitem, "b_li_agg", "l_orderkey", 8)
    agg = (
        spark.table("b_li_agg")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == lineitem.select("l_orderkey").distinct().count()
