"""Scale the sf0.1 testdata up by integer replication for bench runs.

Usage: python tools/scale_data.py <copies> <out_dir>
e.g.   python tools/scale_data.py 10 benchdata/sf1

Each fact/dim table is replicated ``copies`` times with every key
column offset by copy_index * (max_key + 1), so FK integrity holds
within each copy and join/group cardinalities scale the way a bigger
corpus would (region/nation stay fixed, like TPC-H). Document text
for copies > 0 gets a per-copy token prefix: replicated docs form
their own dedup clusters instead of cross-copy near-dup matches, so
pair volume scales linearly with corpus size (real 10x corpora are
not 10 literal copies of every doc). Embedding vectors likewise get
a tiny deterministic per-copy rotation marker via label offset only
(vector values replicate; exact-dup pairs stay within copies for the
bucketed variants, and the exact GEMM twin's cost is size-driven, not
value-driven).

Timestamps land as plain TIMESTAMP (micros) — load_table's nanos
branch is only for the generator's original files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.session import get_spark
from whatdropsnow_etl_spark.sources import load_table

SRC = "/root/testdata/sf0.1"

# key column -> the id domain whose stride it offsets by
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
DOMAIN_KEY = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "users": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    copies = int(sys.argv[1])
    out_dir = sys.argv[2]
    spark = get_spark(app_name="scale-data")
    strides = {
        dom: load_table(spark, SRC, tbl).agg(F.max(col)).collect()[0][0] + 1
        for dom, (tbl, col) in DOMAIN_KEY.items()
    }
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY_AS_IS:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: copied")
    copies_df = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__copy")
    for name, keys in KEYED.items():
        df = load_table(spark, SRC, name).select("*", copies_df)
        for col, dom in keys.items():
            df = df.withColumn(
                col, F.col(col) + F.col("__copy") * F.lit(strides[dom])
            )
        if name == "documents":
            # per-copy token prefix -> no cross-copy shingle matches
            df = df.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.expr(
                        r"regexp_replace(text, '(\\S+)',"
                        r" concat('c', __copy, 'x$1'))"
                    )
                ),
            )
        df = df.drop("__copy")
        n_parts = max(8, min(64, copies * 4))
        df.repartition(n_parts).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"{name}: x{copies}")
    print("done:", out_dir)


if __name__ == "__main__":
    main()
