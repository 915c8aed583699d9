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


def test_incremental_join_bucketed_history_no_history_exchange(spark, no_broadcast):
    """The incremental_join docstring's scale claim, proven on the
    physical plan: with both HISTORY sides bucketed on the key, the
    delta terms shuffle only the (tiny) delta sides — the bucketed
    history scans carry no Exchange."""
    from whatdropsnow_etl_spark.operators import incremental_join

    orders = load_table(spark, SF_SMALL, "orders")
    a = orders.select(F.col("o_orderkey").alias("k"), "o_totalprice")
    b = orders.select(F.col("o_orderkey").alias("k"), "o_orderstatus")
    a_old = a.where(F.col("k") % 4 != 0)
    b_old = b.where(F.col("k") % 3 != 0)
    a_new = a.where(F.col("k") % 4 == 0)
    b_new = b.where(F.col("k") % 3 == 0)
    write_bucketed(a_old, "ij_a_hist", "k", 8, sort_cols="k")
    write_bucketed(b_old, "ij_b_hist", "k", 8, sort_cols="k")
    a_hist = spark.table("ij_a_hist")
    b_hist = spark.table("ij_b_hist")
    delta = incremental_join(a_hist, a_new, b_hist, b_new, ["k"])
    plan = delta._jdf.queryExecution().executedPlan().toString()
    # the bucketed history scans are in the plan, and bucketing
    # strictly reduces the exchange count vs the unbucketed twin
    # (the remaining exchanges belong to the delta legs)
    assert "ij_a_hist" in plan and "ij_b_hist" in plan
    n_bucketed = plan.count("Exchange")
    plain = incremental_join(a_old, a_new, b_old, b_new, ["k"])
    n_plain = plain._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert n_bucketed < n_plain, (n_bucketed, n_plain)
    # and results agree with the recompute diff
    want = sorted(map(tuple, a.join(b, "k").exceptAll(a_old.join(b_old, "k")).collect()))
    got = sorted(map(tuple, delta.collect()))
    assert got == want
