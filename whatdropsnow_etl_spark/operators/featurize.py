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

from pyspark.sql import DataFrame, Window
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


def chi2_features(
    docs: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    min_df: int = 5,
    top_k: int = 10,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-class chi-squared feature selection over document-level
    term occurrence — the vocabulary-picking step in front of every
    bag-of-words quality/domain classifier (CCNet/fastText-style
    curation): for each class, the ``top_k`` terms whose presence is
    most dependent on class membership.

    Contingency table per (term, class), from DOC counts (each doc
    counts once per distinct term — occurrence, not frequency):
      a = docs in class containing term      b = df_term - a
      c = n_class - a                        d = N - df_term - c
      chi2 = N * (a*d - b*c)^2 / (df_term * (N-df_term)
                                  * n_class * (N-n_class))

    Determinism/exactness contract (the exact_avg convention): every
    count is exact BIGINT; numerator and denominator are built in
    DECIMAL(38,0) (the DuckDB twin uses HUGEINT — both exact to
    ~1e38, i.e. corpora to ~2e7 docs; beyond that route the
    intermediates through DOUBLE and accept statistic-grade
    precision), then ONE correctly-rounded cast each and ONE
    division produce a bit-identical double in both engines. Ties
    break on term ASC.

    Scale shape:
    - corpus is scanned once and shuffled once (the (term, class)
      cell aggregate with map-side combine); the term margin rolls
      up from the CELLS relation (vocab-sized), never the corpus;
      the class margin and N are broadcast;
    - the per-class top-k is the SALTED two-phase cut
      (quota_sample's pattern): rank within (class,
      xxhash64(term) % salt_buckets), keep top_k, then re-rank the
      classes x salt_buckets x top_k survivors — no
      one-task-per-class window over a 100 TB vocabulary, and the
      result is bit-identical to the single-window form (any global
      top-k member is a fortiori in its salt bucket's top-k).

    Emits (class, term, df_cell, df_term, n_class, n_total, chi2,
    rank). Only OBSERVED (term, class) cells are scored (a >= 1):
    selection surfaces positive indicators of each class, the
    standard feature-selection use; a term's ABSENCE signal for a
    class shows up as the same term scored high in the
    complementary classes. No reference twin — extends SURVEY
    §2.3's text-analysis family (the reference's 397-LoC ETL has no
    feature selection).
    """
    toks = docs.select(
        F.col(class_col).cast("string").alias("class"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    )
    cells = toks.groupBy("term", "class").agg(
        F.count(F.lit(1)).alias("df_cell")
    )
    # vocab-sized margin from the cells relation (ReuseExchange), not
    # a second corpus pass; min_df prunes the hapax tail before the
    # join fans it back out
    tmarg = (
        cells.groupBy("term")
        .agg(F.sum("df_cell").alias("df_term"))
        .where(F.col("df_term") >= min_df)
    )
    cmarg = docs.groupBy(F.col(class_col).cast("string").alias("class")).agg(
        F.count(F.lit(1)).alias("n_class")
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n_total"))

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = (
        cells.join(tmarg, "term")
        .join(F.broadcast(cmarg), "class")
        .crossJoin(F.broadcast(tot))
        # a term present in EVERY doc has zero discriminative power
        # and a zero denominator — drop it; same guard on the class
        # margin (a single-class corpus has nothing to contrast, and
        # an unguarded den=0 division diverges between engines:
        # Spark NULL vs DuckDB NaN)
        .where(
            (F.col("df_term") < F.col("n_total"))
            & (F.col("n_class") < F.col("n_total"))
        )
    )
    a = F.col("df_cell")
    b = F.col("df_term") - a
    c = F.col("n_class") - a
    d = F.col("n_total") - F.col("df_term") - F.col("n_class") + a
    diff = dec(a) * dec(d) - dec(b) * dec(c)
    num = dec(F.col("n_total")) * diff * diff
    den = (
        dec(F.col("df_term"))
        * dec(F.col("n_total") - F.col("df_term"))
        * dec(F.col("n_class"))
        * dec(F.col("n_total") - F.col("n_class"))
    )
    scored = j.select(
        "class",
        "term",
        a.cast("bigint").alias("df_cell"),
        F.col("df_term").cast("bigint").alias("df_term"),
        F.col("n_class").cast("bigint").alias("n_class"),
        F.col("n_total").cast("bigint").alias("n_total"),
        (num.cast("double") / den.cast("double")).alias("chi2"),
    )
    order = [F.col("chi2").desc(), F.col("term").asc()]
    salt = F.pmod(F.xxhash64("term"), F.lit(salt_buckets))
    w_salted = Window.partitionBy(F.col("class"), salt).orderBy(*order)
    w_class = Window.partitionBy("class").orderBy(*order)
    return (
        scored.withColumn("__srn", F.row_number().over(w_salted))
        .where(F.col("__srn") <= top_k)
        .withColumn("rank", F.row_number().over(w_class).cast("bigint"))
        .where(F.col("rank") <= top_k)
        .drop("__srn")
    )
