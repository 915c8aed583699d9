"""Flagship query: retailer price segmentation with window RANK.

Reference parity: sql.py:4-25 — offers ⋈ retailers ⋈ products with a
regex brand filter, AVG(price) per retailer, CASE segment, RANK()
OVER (PARTITION BY segment ORDER BY avg DESC), drop the top segment,
ordered output. Re-expressed on the TPC-H-ish star: lineitem (fact)
⋈ supplier (retailer dim) ⋈ part (product dim), regex filter on
p_name.

Scale design (100 TB):
- supplier and part are dims at TPC-H ratios → Catalyst broadcasts
  both joins (BroadcastHashJoin, zero shuffle on the fact side);
  explicit broadcast() hints make that survive stale stats.
- The regex filter is applied on `part` BEFORE the join, so the
  broadcast side is pre-shrunk and the fact rows drop early.
- One shuffle total: the groupBy(s_suppkey) agg, with map-side
  partial aggregation.
- The RANK window partitions by segment over *per-supplier* rows
  (cardinality = #suppliers, tiny post-agg) — never over the fact.
- AVG is decimal-exact then double (see functions.money).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.money import exact_avg
from ..functions.segments import price_segment


def flagship_segmentation(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    brand_pattern: str = "(green|blue|red)",
) -> DataFrame:
    offers = lineitem.select("l_suppkey", "l_partkey", "l_extendedprice")
    products = part.select("p_partkey").where(
        F.lower(F.col("p_name")).rlike(brand_pattern)
    )
    retailers = supplier.select("s_suppkey", "s_name")

    per_retailer = (
        offers.join(F.broadcast(products), offers.l_partkey == products.p_partkey)
        .join(F.broadcast(retailers), offers.l_suppkey == retailers.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(exact_avg("l_extendedprice").alias("avg_product_price"))
        .withColumn("segment", price_segment(F.col("avg_product_price")))
    )

    w = Window.partitionBy("segment").orderBy(
        F.col("avg_product_price").desc(), F.col("s_suppkey")
    )
    return (
        per_retailer.where(F.col("segment") != "Very High End")
        .select(
            F.col("s_name").alias("retailer_name"),
            "segment",
            F.rank().over(w).cast("bigint").alias("retailer_rank"),
            F.round("avg_product_price", 2).alias("avg_product_price_usd"),
        )
        .orderBy("segment", "retailer_rank", "retailer_name")
    )
