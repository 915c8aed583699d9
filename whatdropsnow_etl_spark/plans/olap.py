"""OLAP query plans over the TPC-H-ish star schema.

Every plan follows the scale rules (SURVEY §6): dims broadcast,
facts aggregated with map-side partial combine on natural keys,
money decimal-exact (functions.money), filters expressed on base
columns so they push into the parquet scan, timestamps emitted as
epoch-micros BIGINT or DATE (engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import money, rate


def exact_sum_expr(col: F.Column) -> F.Column:
    """SUM of an already-decimal expression, emitted as DOUBLE."""
    return F.sum(col).cast("double")


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - rate("l_discount"))


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1) + rate("l_tax"))


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1 flavor: multi-agg groupBy with a pushed-down date
    filter. One shuffle (groupBy), partial agg map-side."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(rate("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_topk_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    segment: str = "BUILDING", date: str = "1998-01-01", k: int = 10,
) -> DataFrame:
    """Top-k open orders by revenue. Customer filter applied before
    the join (broadcast after filter); top-k via rank-then-limit on
    exact revenue with key tiebreak — never a driver-side sort."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < F.lit(date).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.where(F.col("l_shipdate") > F.lit(date).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum_expr(_disc_price()).alias("revenue"))
        .select(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def q5_region_volume(
    tables: dict[str, DataFrame],
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """6-table snowflake rollup: local-supplier revenue per nation.
    region/nation/supplier broadcast; one fact shuffle for the agg."""
    region = tables["region"].where(F.col("r_name") == region_name)
    nation = tables["nation"]
    dims = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = tables["customer"].select("c_custkey", "c_nationkey")
    supp = tables["supplier"].select("s_suppkey", "s_nationkey")
    ords = tables["orders"].where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    items = tables["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (items.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(dims), supp.s_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(exact_sum_expr(_disc_price()).alias("revenue"))
    )


def rollup_flag_status(lineitem: DataFrame) -> DataFrame:
    """Multi-level ROLLUP aggregate (flag, status, grand total)."""
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(money("l_extendedprice")).cast("double").alias("sum_price"),
    )


def multi_currency(lineitem: DataFrame) -> DataFrame:
    """Parallel derived price columns (reference db.py:106-108 keeps
    usd/gbp/eur side by side): net / discounted / gross, aggregated
    per returnflag. All decimal-exact then double."""
    return lineitem.groupBy("l_returnflag").agg(
        F.sum(money("l_extendedprice")).cast("double").alias("sum_net"),
        F.sum(_disc_price()).cast("double").alias("sum_discounted"),
        F.sum(_charge()).cast("double").alias("sum_gross"),
        F.count(F.lit(1)).alias("n_items"),
    )


def resource_cascade(tables: dict[str, DataFrame]) -> DataFrame:
    """Cascading resource hierarchy (reference etl.py:34-57: brand →
    products → offers → retailers): region → nation → customer →
    orders with per-level rollup. Dims broadcast; orders left-joined
    so childless nations still report."""
    region = tables["region"].select("r_regionkey", "r_name")
    nation = tables["nation"].select("n_nationkey", "n_regionkey", "n_name")
    cust = tables["customer"].select("c_custkey", "c_nationkey")
    ords = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(ords, cust.c_custkey == ords.o_custkey, "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_revenue"),
        )
    )


def json_normalize_events(events: DataFrame) -> DataFrame:
    """Nested JSON props → typed aggregate (reference db.py:79-158
    parse_data: {id, attributes:{...}} → typed flat rows)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
    )


def tumbling_window_agg(events: DataFrame) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregate: 1-hour
    buckets as epoch-micros BIGINT."""
    bucket = F.unix_micros(F.date_trunc("hour", F.col("ts")))
    return (
        events.select(bucket.alias("hour_start_us"), "event_type", "value")
        .groupBy("hour_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
    )


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4 flavor: orders with at least one returned lineitem
    (EXISTS), counted per priority. The EXISTS subquery is a
    left-semi join — the fact side never widens, and the semi join
    short-circuits per key (no duplicate explosion, unlike an inner
    join + distinct)."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    late = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(late, ords.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: str = "0.03",
    disc_hi: str = "0.05",
    max_qty: int = 50,
) -> DataFrame:
    """TPC-H Q6 flavor: pure filter + single aggregate. Everything
    pushes to the scan (date, discount band, quantity) — the plan is
    one columnar scan + partial/final agg, zero joins, one shuffle
    of a single row per partition."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (rate("l_discount") >= F.lit(disc_lo).cast("decimal(4,2)"))
            & (rate("l_discount") <= F.lit(disc_hi).cast("decimal(4,2)"))
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q2_min_cost_supplier(
    tables: dict[str, DataFrame], region_name: str = "EUROPE", k: int = 20
) -> DataFrame:
    """TPC-H Q2 flavor: per-part minimum-cost supplier (correlated
    subquery re-expressed as a window min over the joined relation —
    one pass, no second join back). Dims broadcast; tie on supplier
    key for determinism."""
    from pyspark.sql.window import Window

    region = tables["region"].where(F.col("r_name") == region_name)
    nation = tables["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = tables["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    # partsupp isn't in the testdata; lineitem (l_partkey, l_suppkey,
    # l_extendedprice) stands in as the part-supplier cost relation
    cost = tables["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.min(money("l_extendedprice")).alias("supply_cost")
    )
    joined = cost.join(
        F.broadcast(supp), cost.l_suppkey == supp.s_suppkey
    ).select("l_partkey", "l_suppkey", "supply_cost", "s_name", "n_name")
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("supply_cost").asc(), F.col("l_suppkey").asc()
    )
    best = (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation_name"),
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
    )
    return best.orderBy(
        F.col("supply_cost").desc(), F.col("p_partkey").asc()
    ).limit(k)
