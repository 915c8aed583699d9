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


def rademacher_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes for sign-LSH, seeded by md5.

    Component d of plane p is +1 iff hex digit (d mod 32) of
    md5("hp:{p}:{d // 32}") is odd. Computed driver-side with
    hashlib and inlined as literals into BOTH the Spark plan and the
    DuckDB oracle SQL, so the two engines bucket identically.
    Rademacher (±1) entries are a standard sub-Gaussian choice for
    random-projection LSH — same collision guarantees as Gaussian
    hyperplanes, and exactly representable in every engine.
    """
    import hashlib

    planes: list[list[float]] = []
    for p in range(n_planes):
        comps: list[float] = []
        for chunk_start in range(0, dim, 32):
            hx = hashlib.md5(f"hp:{p}:{chunk_start // 32}".encode()).hexdigest()
            for d in range(chunk_start, min(chunk_start + 32, dim)):
                comps.append(1.0 if hx[d % 32] in "13579bdf" else -1.0)
        planes.append(comps)
    return planes


def dot_literal(v: Column, plane: list[float]) -> Column:
    """Dot product of an array column with a literal plane."""
    return dot(v, F.array(*[F.lit(x) for x in plane]))


def cosine_sim_arrow() -> "Column":
    """Arrow-batched cosine for the pair-heavy operators.

    The zip_with/aggregate formulation above is *interpreted* per
    element (HOF lambdas don't codegen) — fine per corpus row,
    ~100× too slow when an all-pairs operator evaluates millions of
    pairs. This pandas UDF is the sanctioned Python fast path:
    vectorized numpy over Arrow batches, with the accumulation
    hand-rolled as a per-dimension loop (acc += a[:,d] * b[:,d]) so
    every row's sum happens left-to-right in float64 — bit-identical
    to the sequential order of both the HOF version and DuckDB's
    list_dot_product, keeping oracle hashes exact. numpy.dot would
    be faster still but uses pairwise/BLAS summation, which changes
    the low bits and breaks cross-engine parity.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _dot(a, b):
        acc = np.zeros(len(a), dtype=np.float64)
        for d in range(a.shape[1]):
            acc += a[:, d] * b[:, d]
        return acc

    def _cos(va, vb):
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.stack(va.to_numpy()).astype(np.float64, copy=False)
        b = np.stack(vb.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(_dot(a, b) / (np.sqrt(_dot(a, a)) * np.sqrt(_dot(b, b))))

    _cos.__annotations__ = {
        "va": pd.Series,
        "vb": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(_cos, "double")


def bucket_keys_arrow(
    planes: list[list[float]] | None, n_tables: int, bits: int
):
    """Arrow-batched sign-LSH bucket keys: one array<bigint> of
    ``n_tables`` keys per vector. Same bit-exactness contract as
    cosine_sim_arrow — each plane's dot product accumulates per
    dimension left-to-right, so the sign (and therefore every key)
    matches the SQL twin's list_dot_product formulation exactly.
    Replaces n_tables × bits interpreted HOF dot products per row
    with one numpy pass per Arrow batch.

    ``planes=None`` defers plane construction to the executors: the
    deterministic Rademacher planes depend only on (n_planes, dim),
    and dim is read off the first Arrow batch — so no driver-side
    ``.first()`` job is needed when the caller doesn't know dim.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    P0 = None if planes is None else np.array(planes, dtype=np.float64)
    n_planes = n_tables * bits

    def _keys(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64, copy=False)  # (n, dim)
        P = (
            P0
            if P0 is not None
            else np.array(rademacher_planes(n_planes, X.shape[1]), dtype=np.float64)
        )
        dots = np.zeros((len(X), len(P)), dtype=np.float64)
        for d in range(X.shape[1]):
            dots += np.outer(X[:, d], P[:, d])
        bits_m = dots > 0  # (n, n_planes)
        keys = np.zeros((len(X), n_tables), dtype=np.int64)
        for t in range(n_tables):
            for j in range(bits):
                keys[:, t] |= bits_m[:, t * bits + j].astype(np.int64) << j
        return pd.Series(list(keys))

    _keys.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_keys, "array<bigint>")

