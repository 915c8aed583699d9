"""Vector math over array<float|double> columns — JVM-side only.

Embeddings stay as Spark SQL arrays; dot/norm/cosine are
higher-order-function expressions (zip_with + aggregate) that run in
codegen, not Python. Accumulation is left-to-right in double
precision — the same sequential order DuckDB's list_dot_product
uses, so oracle hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
