"""Spherical k-means codebook training for IVF (Lloyd's iterations).

Closes the loop on ``ann_ivf_topk``'s "codebook is an input"
contract: this trains that input on a corpus sample with plain
DataFrame ops. Per iteration:

- ASSIGN: one broadcast of the k×dim codebook against the corpus,
  argmax-cosine via a map-side-combined max(struct) — O(N·k·dim),
  zero corpus shuffle;
- UPDATE: posexplode vectors → groupBy (cell, dim) mean — one
  shuffle of N·dim skinny rows with map-side partial aggregation.

The k×dim result is collected to the driver each round (bounded,
documented driver action — it IS the model, and next round's
broadcast). Empty cells keep their previous centroid. Init is
deterministic: the k corpus rows with the smallest xxhash64(id, 42)
— a seeded pseudo-random sample, stable across engines and runs.

At 100 TB you train on a sample (pass ``corpus.sample(...)``) —
Lloyd's on a 1% sample converges to near-identical codebooks at a
fraction of the assign cost; the operator takes whatever DataFrame
it is given.

Not SQL-expressible (iterative fixpoint) — no DuckDB oracle; pinned
by pytest: monotone non-increasing quantization error per round and
recall >= the deterministic stand-in codebook on the same fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim_arrow, to_double_array


def train_kmeans_codebook(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train a k-centroid codebook; returns (cid BIGINT, embedding
    array<double>) — directly usable as ``ann_ivf_topk(centroids=)``.
    """
    from ..functions.parallel import ensure_min_parallelism

    cos = cosine_sim_arrow()
    # parallelism floor (r12): a single-row-group embeddings parquet
    # scans as ONE task, serializing every Lloyd round's cosine
    # kernel; the cached relation inherits the floored partitioning
    c = ensure_min_parallelism(corpus, id_col).select(
        F.col(id_col).alias("vid"), to_double_array(vec_col).alias("v")
    ).persist()  # scanned once; every Lloyd round re-reads it
    seeds = (
        c.withColumn("h", F.xxhash64("vid", F.lit(42)))
        .orderBy("h", "vid")
        .limit(k)
        .select("v")
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    spark = corpus.sparkSession
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(centroids)],
            "cid bigint, cent array<double>",
        )
        assign = (
            c.crossJoin(F.broadcast(cent_df))
            .select(
                "vid",
                F.struct(
                    cos(F.col("cent"), F.col("v")).alias("s"),
                    (-F.col("cid")).alias("negcid"),
                    F.col("v").alias("v"),
                ).alias("m"),
            )
            .groupBy("vid")
            .agg(F.max("m").alias("m"))
            .select((-F.col("m.negcid")).alias("cell"), F.col("m.v").alias("v"))
        )
        means = (
            assign.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("mv"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "mv"))
                ).alias("pairs")
            )
            .select("cell", F.col("pairs.mv").alias("cent"))
            .collect()
        )
        for r in means:
            centroids[r["cell"]] = list(r["cent"])
    c.unpersist()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)],
        f"cid bigint, {vec_col} array<double>",
    ).select(F.col("cid").alias(id_col), vec_col)


def kmeans_update_pass(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The engine-exact relation of ONE Lloyd's round — the
    deterministic half of :func:`train_kmeans_codebook` a SQL oracle
    CAN verify (the iterative fixpoint and the xxhash-seeded init
    stay rows-only), completing the r7 twin-the-deterministic-half
    set (pca_sufficient_stats, lr_gradient_pass): seeds are the
    ``n_centroids`` lowest-id corpus vectors (the ann_ivf_topk
    stand-in codebook — oracle-expressible, unlike the trained
    path's seeded hash sample), ASSIGN is the argmax-cosine
    broadcast with the (cos DESC, cid ASC) tiebreak ann_ivf's green
    oracle already proves engine-exact, and the UPDATE step is
    emitted as its mergeable sufficient statistics: per (cell, dim)
    exact micro-unit coordinate sums + member counts
    (``bround`` half-to-even mirrors ``round_even``;
    DECIMAL-as-VARCHAR rendering). stats(slice A) ⊕ stats(slice B)
    == stats(A ∪ B) bit-identically (the pca_sufficient_stats
    incremental contract), and centroid_next = s / (n·1e6)
    normalized — the caller's display-time division.

    Fully lazy: the seed relation is a sort-limit broadcast, nothing
    collects. Emits (cid, pos, s, n).
    """
    cos = cosine_sim_arrow()
    c = corpus.select(
        F.col(id_col).alias("vid"), to_double_array(vec_col).alias("v")
    )
    cent = (
        c.orderBy("vid")
        .limit(n_centroids)
        .select(F.col("vid").alias("cid"), F.col("v").alias("cent"))
    )
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .select(
            "vid",
            F.struct(
                cos(F.col("cent"), F.col("v")).alias("s"),
                (-F.col("cid")).cast("bigint").alias("negcid"),
                F.col("v").alias("v"),
            ).alias("m"),
        )
        .groupBy("vid")
        .agg(F.max("m").alias("m"))
        .select((-F.col("m.negcid")).alias("cid"), F.col("m.v").alias("v"))
    )
    micro = F.transform(
        F.col("v"), lambda x: F.bround(x * F.lit(1_000_000.0)).cast("long")
    )
    return (
        assigned.select("cid", F.posexplode(micro).alias("pos", "m"))
        .groupBy("cid", "pos")
        .agg(
            F.sum(F.col("m").cast("decimal(38,0)"))
            .cast("string")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
