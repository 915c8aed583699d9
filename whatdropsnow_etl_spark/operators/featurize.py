"""Model-free document featurization: the hashing trick.

Feature hashing (Weinberger et al., ICML 2009): project token counts
into a fixed ``n_buckets``-dimensional space via a hash on the token
string, with a second independent hash choosing the sign so that
colliding tokens cancel in expectation instead of accumulating bias.
The workhorse for cheap document vectors when no trained embedding
model is in the loop — clustering, linear probes, and coarse near-dup
blocking all run on these.

No reference twin — the reference (397 LoC ETL) has no featurizer;
this extends SURVEY §2.3's text-analysis family.

Scale design:
- map-only explode then ONE shuffle, the (doc_id, bucket) partial
  aggregate — map-side combine collapses each document's repeated
  tokens before anything moves;
- output is the SPARSE triple relation (doc_id, bucket, weight),
  never a dense array column: at n_buckets=2^18 a dense row is 2 MB
  of mostly-zero doubles per doc, while the triples carry only the
  occupied cells (3 BIGINTs each) through the shuffle and into
  parquet;
- weights are exact BIGINT signed counts — no floats anywhere, so
  the result is bit-stable across engines and partitionings;
- both hashes read the SAME md5 digest (chars 1-8 for the bucket,
  char 9 for the sign): one hash evaluation per token occurrence,
  and md5 exists bit-identically in Spark and DuckDB so the oracle
  twin shares the exact bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Signed-hash token features: one (doc_id, bucket, weight) row
    per occupied bucket, weight = sum over the doc's token
    occurrences of sign(token), bucket/sign both md5-derived.

    Zero-weight cells (sign cancellation) are dropped — the sparse
    contract; downstream dot products treat absent as 0.
    """
    h = F.md5(F.col("__tok"))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_buckets)
    )
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .select("doc_id", bucket.alias("bucket"), sign.alias("__sign"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("__sign").cast("bigint").alias("weight"))
        .where(F.col("weight") != 0)
    )


def label_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-label mean embedding (class prototype) in exact fixed-
    point arithmetic — the centroid table behind nearest-class-mean
    classifiers, label-noise screens ("which examples sit far from
    their own class prototype"), and class-similarity matrices.

    Float summation is order-dependent, so a naive avg() differs
    between engines (and between runs of the SAME engine once
    partitioning changes). Instead each coordinate is rounded to
    integer micro-units first (ROUND(x*1e6) — the proven cents
    trick), summed as BIGINT (associative, any partitioning), and
    the mean emitted both as the exact (sum, n) pair and as
    floor(sum/n) micro-units (the division is exact in double below
    2^53, so the floor is engine-identical).

    Plan: posexplode is a map-side projection (rows x dims, no
    shuffle), then ONE map-side-combined groupBy(label, dim) —
    #labels x dims result rows. At 100 TB the combine does the
    work; nothing but the bounded centroid table crosses the wire.
    Emits (label, dim 1-based, n_vecs, sum_micro, mean_micro).
    """
    micro = F.round(
        F.col("__v").cast("double") * scale, 0
    ).cast("long")
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("__p", "__v"),
    ).select(
        "label",
        (F.col("__p") + 1).cast("bigint").alias("dim"),
        micro.alias("__micro"),
    )
    return ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("__micro").alias("sum_micro"),
        F.floor(F.sum("__micro") / F.count(F.lit(1))).cast("bigint").alias(
            "mean_micro"
        ),
    )


def feature_class_lift(
    df: DataFrame,
    feature_col: str,
    class_col: str,
    scale: int = 100,
    width_cents: int = 5000,
) -> DataFrame:
    """Contingency-table lift between a binned numeric feature and a
    class label — the feature-vs-label association preflight run
    before training on (or stratifying by) a column: a cell whose
    joint count beats what its margins predict (lift > 1) marks a
    feature range that separates the class.

    Lift = p(bin, class) / (p(bin)·p(class)) is emitted as the EXACT
    integer fraction (lift_num, lift_den) = (c_cell·N, c_bin·c_class)
    — the trend_report convention: no float division, engine-bitwise
    portable, callers compare num·den' vs num'·den. Bins are the
    scale-free equi-width value_histogram cut (floor(cents/width) —
    no global min/max pass, no rank), so the whole report is one
    groupBy(bin, class) plus two margin aggregates broadcast back:
    nothing corpus-sized moves twice, and the output is
    #bins × #classes regardless of corpus size.

    Products stay in BIGINT (c·N ≤ ~1e18 for counts to ~1e9; at true
    100 TB cell counts, route through DECIMAL — same caveat as PMI).
    Emits (bin_id, class, c_cell, c_bin, c_class, lift_num,
    lift_den).
    """
    cents = F.round(F.col(feature_col) * scale, 0).cast("long")
    binned = df.select(
        F.floor(cents / F.lit(width_cents)).cast("bigint").alias("bin_id"),
        F.col(class_col).cast("string").alias("class"),
    )
    cells = binned.groupBy("bin_id", "class").agg(
        F.count(F.lit(1)).alias("c_cell")
    )
    # margins roll up from the #cells-sized relation, never from the
    # corpus again — the identical cells exchange subtree is reused
    # across all three branches (ReuseExchange), so the corpus is
    # scanned and shuffled exactly once
    bins = cells.groupBy("bin_id").agg(F.sum("c_cell").alias("c_bin"))
    classes = cells.groupBy("class").agg(F.sum("c_cell").alias("c_class"))
    total = cells.agg(F.sum("c_cell").alias("__n"))
    return (
        cells.join(F.broadcast(bins), "bin_id")
        .join(F.broadcast(classes), "class")
        .crossJoin(F.broadcast(total))
        .select(
            "bin_id",
            "class",
            F.col("c_cell").cast("bigint").alias("c_cell"),
            F.col("c_bin").cast("bigint").alias("c_bin"),
            F.col("c_class").cast("bigint").alias("c_class"),
            (F.col("c_cell") * F.col("__n")).cast("bigint").alias("lift_num"),
            (F.col("c_bin") * F.col("c_class")).cast("bigint").alias("lift_den"),
        )
    )
