"""Exact one-pass distributed PCA for embedding columns.

The standard preprocessing in front of large-scale vector pipelines
(FAISS's ``PCAR`` / OPQ's unlearned cousin): project d-dim embeddings
onto the top-k principal axes to cut ANN index cost, whiten before
clustering, or screen for dead/collinear dimensions. The reference
(397-LoC ETL) has none of this; extends SURVEY §2.3's
embedding family next to kmeans/PQ/OPQ.

Scale design — the covariance is a ONE-PASS map-side reduction, never
a sample and never a corpus-sized collect:

- each Arrow batch contributes the sufficient statistics
  (n, Σx, ΣxᵀX) — a single (1 + d + d²)-wide row per batch
  (`mapInPandas`, integer matmul inside numpy);
- batch partials shuffle as a SKINNY (pos, val) relation and reduce
  with one model-sized groupBy — #batches × (d²+d) rows total cross
  the wire regardless of corpus size (d=64 → 4 KB per batch);
- accumulation is EXACT: coordinates are rounded to integer
  micro-units first (the label_centroids fixed-point trick), so
  products and sums are integers (DECIMAL(38,0) — overflow-free to
  ~1e13 rows at unit-scale embeddings; per-chunk int64 partials are
  row-bounded from each batch's max coordinate magnitude so they
  can never wrap) and the resulting covariance
  is bit-identical across partitionings, retries and cluster sizes
  — no float-summation order dependence;
- the driver solves the d×d eigenproblem (model-sized numpy
  ``eigh``) and fixes each eigenvector's sign so its
  largest-|coordinate| entry is positive — a deterministic
  convention, since eigenvectors are sign-ambiguous;
- projection is MAP-ONLY: the (d×k) component matrix ships in the
  task closure and every Arrow batch is one fused ``(X - mean) @ W``
  matmul (the OPQ encode convention).

Not SQL-expressible (eigendecomposition) — no DuckDB oracle;
rows-only, pinned by pytest vs numpy PCA on the same rows
(eigenvalues, axis alignment, projection) plus a
partitioning-invariance bit-identity check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def pca_sufficient_stats(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The mergeable half of PCA training: the (pos, t) sufficient-
    statistics relation (d²+d+1 rows — flattened ΣxᵀX, Σx, n in
    exact micro-unit DECIMAL(38,0)). Persist one per day/partition
    as data lands, MERGE by union + groupBy(pos).sum — sums of exact
    integers, so stats(day1) ⊕ stats(day2) is BIT-IDENTICAL to
    sketching the union (pytest-pinned) — and re-solve axes with
    :func:`pca_solve` whenever needed, never rescanning history:
    the kmv/hll_merge_rollup incremental pattern applied to a
    trained model."""
    import numpy as np
    import pandas as pd

    if dim is None:
        head = (
            corpus.select(F.col(vec_col))
            .where(F.col(vec_col).isNotNull())
            .first()
        )
        if head is None:
            raise ValueError(
                f"pca_sufficient_stats: no non-NULL '{vec_col}' rows"
            )
        dim = len(head[0])

    def partials(batches):
        for pdf in batches:
            vs = pdf["v"].to_numpy()
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            Xi = np.rint(X * _MICRO).astype(np.int64)
            # int64 Gram cells sum (coord·1e6)² over the chunk rows:
            # bound the chunk so the per-cell sum stays < 2^62 even
            # at this batch's max coordinate magnitude (unit-scale
            # vectors allow ~4e6 rows/chunk; |coord|≈30 still ~500)
            m = int(np.abs(Xi).max(initial=1)) or 1
            if m * m > (1 << 62):
                raise ValueError(
                    "pca_train: coordinate magnitude exceeds the "
                    "fixed-point exactness range (|x| > ~2e3); "
                    "rescale the embeddings first"
                )
            rows_per_chunk = max(1, (1 << 62) // (m * m))
            for lo in range(0, len(Xi), rows_per_chunk):
                C = Xi[lo : lo + rows_per_chunk]
                g = (C.T @ C).reshape(-1)  # exact int64 per chunk
                s = C.sum(axis=0)
                yield pd.DataFrame(
                    {
                        "pos": range(dim * dim + dim + 1),
                        "val": list(map(int, g))
                        + list(map(int, s))
                        + [len(C)],
                    }
                )

    return (
        corpus.select(F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .mapInPandas(partials, "pos long, val long")
        .groupBy("pos")
        .agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("t"))
    )


def pca_train(
    corpus: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
):
    """Exact full-corpus PCA axes. Returns ``(components_df, model)``
    where components_df is the model-sized relation (component INT
    1-based, eigenvalue DOUBLE, vector ARRAY<DOUBLE>, mean
    ARRAY<DOUBLE>) and ``model`` is the (mean, W) ndarray pair that
    :func:`pca_project` closes over. One-shot composition of
    :func:`pca_sufficient_stats` + :func:`pca_solve`; incremental
    pipelines call the two halves separately and merge stats
    relations between them."""
    head = (
        corpus.select(F.col(vec_col)).where(F.col(vec_col).isNotNull())
        .first()
    )
    if head is None:
        raise ValueError(
            f"pca_train: no non-NULL '{vec_col}' rows to train on"
        )
    dim = len(head[0])
    stats = pca_sufficient_stats(corpus, vec_col=vec_col, dim=dim)
    return pca_solve(stats, dim, n_components, spark=corpus.sparkSession)


def pca_solve(
    stats: DataFrame,
    dim: int,
    n_components: int = 8,
    spark=None,
):
    """Solve PCA axes from a (possibly merged) sufficient-statistics
    relation — the model-sized second half (d²+d+1-value collect +
    driver eigh). Merge stats from slices with
    ``union(...).groupBy("pos").agg(F.sum("t").alias("t"))``."""
    import numpy as np

    spark = spark or stats.sparkSession
    acc = {r["pos"]: int(r["t"]) for r in stats.collect()}
    if not acc:
        raise ValueError("pca_solve: empty sufficient-statistics relation")
    n = acc[dim * dim + dim]
    G = np.array(
        [acc[i] for i in range(dim * dim)], dtype=np.float64
    ).reshape(dim, dim) / (_MICRO * _MICRO)
    s = (
        np.array([acc[dim * dim + i] for i in range(dim)], dtype=np.float64)
        / _MICRO
    )
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    W = evecs[:, order]
    # deterministic sign: largest-|coordinate| entry positive
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    lam = evals[order]
    comp = spark.createDataFrame(
        [
            (
                j + 1,
                float(lam[j]),
                [float(x) for x in W[:, j]],
                [float(x) for x in mean],
            )
            for j in range(W.shape[1])
        ],
        "component int, eigenvalue double, vector array<double>,"
        " mean array<double>",
    )
    return comp, (mean, W)


def pca_project(
    emb: DataFrame,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Map-only projection onto trained axes: one fused
    ``(X - mean) @ W`` matmul per Arrow batch, model in the task
    closure (the OPQ encode convention). NULL vectors are dropped —
    the same rows pca_train excludes, so train-then-project covers
    exactly the trainable corpus. Emits (id, out_col
    array<double>)."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    mean, W = model
    mean = np.asarray(mean, dtype=np.float64)
    Wm = np.asarray(W, dtype=np.float64)

    @pandas_udf("array<double>")
    def _proj(vs):
        import pandas as pd

        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        P = (X - mean) @ Wm
        return pd.Series([[float(x) for x in row] for row in P])

    return emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _proj(F.col(vec_col)).alias(out_col)
    )


def pca_project_pass(
    emb: DataFrame,
    weights: DataFrame | None = None,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The oracle-twinnable deterministic half of
    :func:`embedding_pca`'s PROJECTION step: X·Wᵀ against a FIXED
    basis in exact micro-unit integer arithmetic — the
    kmeans_update_pass pattern (the eigendecomposition itself stays
    honestly rows-only in :func:`pca_train`; what the driver gate can
    check bit-identically is that the engine projects a corpus onto
    given axes correctly).

    ``weights`` is the basis relation (component id, vector). When
    None, the stand-in basis is the ``n_components`` LOWEST-ID corpus
    vectors (the kmeans_update_pass seed convention — deterministic
    and oracle-expressible as a sort-limit, unlike a trained basis).
    Production callers pass ``pca_train``'s components relation.

    Exactness: both vectors quantize to micro-unit integers
    (bround half-to-even == round_even), each (row, component) dot
    is a sum of int·int products in DECIMAL(38,0) — integer
    addition, so partition- and engine-order free; the result is the
    UNCENTERED dot in 1e-12 units, VARCHAR-rendered. Centering is
    the caller's display-time subtraction (dot − mean·w, one
    model-sized correction), the kmeans_update_pass division
    convention.

    Scale shape: the basis is model-sized and BROADCAST; projection
    is one map-side zip_with/aggregate per (vector, component) —
    zero corpus shuffle, no UDF, no collect. Emits
    (vec_id, component, dot VARCHAR) — k rows per corpus vector.
    """
    dec = "decimal(38,0)"
    v = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
    ).where(F.col("__v").isNotNull())
    if weights is None:
        w = (
            v.orderBy("vec_id")
            .limit(n_components)
            .select(
                F.col("vec_id").alias("component"), F.col("__v").alias("__w")
            )
        )
    else:
        w = weights.select(
            F.col(id_col).alias("component"), F.col(vec_col).alias("__w")
        )

    def micro(c):
        return F.transform(
            c, lambda x: F.bround(x * F.lit(1_000_000.0), 0).cast(dec)
        )

    dot = F.aggregate(
        F.zip_with(
            micro(F.col("__v")), micro(F.col("__w")), lambda a, b: a * b
        ),
        F.lit(0).cast(dec),
        lambda acc, x: (acc + x).cast(dec),
    )
    return v.crossJoin(F.broadcast(w)).select(
        "vec_id",
        F.col("component").cast("bigint").alias("component"),
        dot.cast(dec).cast("string").alias("dot"),
    )


def embedding_pca(
    emb: DataFrame,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train-then-project convenience: exact one-pass PCA on the
    given corpus, then the map-only projection of the SAME corpus
    onto the top ``n_components`` axes. Emits (vec_id, pca)."""
    _, model = pca_train(emb, n_components=n_components, vec_col=vec_col)
    return pca_project(emb, model, id_col=id_col, vec_col=vec_col)
