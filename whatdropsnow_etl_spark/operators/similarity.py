"""Similarity search over embedding columns.

Brute-force cosine top-k: O(N·Q) with the query set broadcast —
zero shuffle on the corpus side, so it scales linearly with
executors for bounded Q. The per-query top-k is a window over
(query_id), cardinality Q × N before the rank filter; Spark's
WindowExec sorts within partitions only (no global sort).

The LSH-bucketed variant (random-hyperplane signs → bucket join →
rerank) is the 100 TB path for large Q — r2.

All arithmetic is JVM-side (zip_with/aggregate in codegen): floats
are widened to double and accumulated left-to-right, matching
DuckDB's list_dot_product exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_sim, to_double_array


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows per ``queries`` row."""
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("cosine"))
    )
