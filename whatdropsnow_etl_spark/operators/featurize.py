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
