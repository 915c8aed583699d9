"""Tests for the training-order operators (ordering.py), the
blocklist filter, and the exact correlation matrix — the r5-tail
batch.

Pin points:
- the prefix-bucket histogram rank decomposes EXACTLY to the naive
  single-window rank (the scale trick changes the plan, never the
  answer);
- epoch_shuffle is a pure function of (seed, id): same seed twice is
  bit-identical, a new seed is a genuinely different permutation;
- interleave_sources' stride keys give every prefix of the ordering
  its fair per-source share (within one row per source);
- blocklist_filter matches whole tokens only (no scunthorpe) and
  thresholds on DISTINCT terms, not raw hits;
- corr_matrix equals numpy corrcoef and is partitioning-invariant.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whatdropsnow_etl_spark.operators import (
    blocklist_filter,
    corr_matrix,
    epoch_shuffle,
    interleave_sources,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src_"), (F.col("id") % 3).cast("string")).alias(
            "source"
        ),
    )


def test_epoch_shuffle_matches_naive_window_rank(spark):
    df = _docs(spark)
    got = epoch_shuffle(df, n_shards=4, seed=7).orderBy("shard", "pos")
    # naive twin: one window per shard over the identical key order
    key = F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"), F.lit(4)
    )
    naive = (
        df.select(F.col("doc_id"), key.alias("k"), shard.alias("shard"))
        .withColumn(
            "pos",
            F.row_number()
            .over(Window.partitionBy("shard").orderBy("k", "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in naive.collect()
    ]


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    df = _docs(spark, 200)
    a = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, 4, seed=1).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, 4, seed=1).collect()}
    c = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, 4, seed=2).collect()}
    assert a == b
    assert a != c  # a fresh permutation per epoch seed
    # (shard, pos) is a bijection onto the corpus: pos runs 1..n_s
    rows = epoch_shuffle(df, 4, seed=1).collect()
    assert len({(r.shard, r.pos) for r in rows}) == 200
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_interleave_prefix_fairness(spark):
    # 240 docs over 3 sources at rates 1/2, 1/3, 1/6
    rows = (
        [(i, "web") for i in range(120)]
        + [(120 + i, "books") for i in range(80)]
        + [(200 + i, "code") for i in range(40)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(df).orderBy("interleave_key").collect()
    assert len(out) == 240
    # stride scheduling invariant: after any prefix of length p, each
    # source s with n_s rows has seen floor/ceil of p * n_s / N rows
    # (within one row — the classic stride bound)
    seen = {"web": 0, "books": 0, "code": 0}
    n = {"web": 120, "books": 80, "code": 40}
    for p, r in enumerate(out, start=1):
        seen[r.source] += 1
        for s, k in seen.items():
            fair = p * n[s] / 240
            assert abs(k - fair) <= 1.0, (p, s, k, fair)
    # keys strictly inside (0, 1); ranks 1-based per source
    assert all(0.0 < r.interleave_key < 1.0 for r in out)


def test_interleave_rank_matches_naive_window(spark):
    df = _docs(spark, 300)
    got = {
        (r.doc_id, r.src_rank)
        for r in interleave_sources(df).collect()
    }
    naive = {
        (r.doc_id, r.rnk)
        for r in df.select(
            "doc_id",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.md5(F.col("doc_id").cast("string")), "doc_id"
                )
            )
            .cast("bigint")
            .alias("rnk"),
        ).collect()
    }
    assert got == naive


def test_blocklist_whole_token_and_distinct_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "the class is great"),  # 'class' != blocked 'ass'
            (2, "a", "spam spam spam"),  # 3 hits, 1 distinct term
            (3, "a", "spam and scam here"),  # 2 distinct terms -> drop
            (4, "a", "clean text entirely"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in blocklist_filter(
            df, ["ass", "spam", "scam"], max_distinct_terms=2
        ).collect()
    }
    assert out[1].n_blocked == 0 and out[1].keep
    assert out[2].n_blocked == 3 and out[2].n_blocked_terms == 1
    assert out[2].keep  # one noisy term can't sink the doc
    assert out[3].n_blocked_terms == 2 and not out[3].keep
    assert out[4].keep


def test_corr_matrix_matches_numpy_and_partitioning(spark):
    rng = np.random.default_rng(5)
    x = np.round(rng.uniform(1, 100, 400), 2)
    y = np.round(2.0 * x + rng.normal(0, 5, 400), 2)
    z = np.round(rng.uniform(-50, 50, 400), 2)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r.col_x, r.col_y): r.corr
        for r in corr_matrix(df, ["x", "y", "z"]).collect()
    }
    ref = np.corrcoef(np.vstack([x, y, z]))
    assert math.isclose(got[("x", "y")], ref[0, 1], rel_tol=1e-9)
    assert math.isclose(got[("x", "z")], ref[0, 2], rel_tol=1e-9)
    assert math.isclose(got[("y", "z")], ref[1, 2], rel_tol=1e-9)
    # decimal-exact moments => bit-identical under any partitioning
    again = {
        (r.col_x, r.col_y): r.corr
        for r in corr_matrix(df.repartition(7), ["x", "y", "z"]).collect()
    }
    assert got == again


def test_corr_matrix_perfect_linear(spark):
    df = spark.createDataFrame(
        [(float(i), float(2 * i + 3)) for i in range(1, 50)],
        "a double, b double",
    )
    [r] = corr_matrix(df, ["a", "b"]).collect()
    assert (r.col_x, r.col_y) == ("a", "b")
    assert math.isclose(r.corr, 1.0, rel_tol=1e-12)


def test_rank_correlation_hand_cases(spark):
    """Perfect monotone agreement gives rho == 1.0 exactly; perfect
    reversal gives -1.0; and a hand-computable tied case matches the
    scipy-convention tie-averaged value."""
    from whatdropsnow_etl_spark.operators import rank_correlation

    mono = spark.createDataFrame(
        [(i, float(i), float(i * i)) for i in range(1, 21)],
        "doc_id long, x double, y double",
    )
    r = rank_correlation(mono, "x", "y").collect()[0]
    assert r["n_rows"] == 20 and r["rho"] == 1.0
    rev = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(1, 21)],
        "doc_id long, x double, y double",
    )
    assert rank_correlation(rev, "x", "y").collect()[0]["rho"] == -1.0
    # tied case: x = (1,1,2), y = (1,2,2)
    # ar2_x = (3,3,6), ar2_y = (2,5,5); Pearson over those:
    # n=3 sx=12 sy=12 sxx=54 syy=54 sxy=51
    # num = 3*51-144 = 9; var = 3*54-144 = 18 each
    # rho = 9 / (sqrt(18)·sqrt(18)) — mathematically 0.5, and the
    # assertion pins the documented IEEE evaluation order exactly
    # (sqrt(18)² = 18.000000000000004, not 18)
    import math

    tied = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 2.0), (3, 2.0, 2.0)],
        "doc_id long, x double, y double",
    )
    expect = 9.0 / (math.sqrt(18.0) * math.sqrt(18.0))
    assert rank_correlation(tied, "x", "y").collect()[0]["rho"] == expect


def test_rank_correlation_matches_naive_window(spark):
    """The sample-sort decomposition must equal the naive
    single-window RANK() formulation bit-for-bit on real data with
    heavy ties (n_chars collides across docs)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.functions.text import tokens
    from whatdropsnow_etl_spark.operators import rank_correlation
    from whatdropsnow_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "n_tokens", F.size(tokens(F.col("text")))
    )
    fast = rank_correlation(docs, "n_chars", "n_tokens").collect()[0]

    def ar2(c):
        return (
            2 * F.rank().over(W.orderBy(F.col(c)))
            + F.count(F.lit(1)).over(W.partitionBy(F.col(c)))
            - 1
        ).cast("bigint")

    r = docs.select(ar2("n_chars").alias("ax"), ar2("n_tokens").alias("ay"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = r.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("ax")).alias("sx"),
        F.sum(dec("ay")).alias("sy"),
        F.sum(dec("ax") * dec("ax")).alias("sxx"),
        F.sum(dec("ay") * dec("ay")).alias("syy"),
        F.sum(dec("ax") * dec("ay")).alias("sxy"),
    ).collect()[0]
    import math

    num = float(m["n"] * m["sxy"] - m["sx"] * m["sy"])
    vx = float(m["n"] * m["sxx"] - m["sx"] * m["sx"])
    vy = float(m["n"] * m["syy"] - m["sy"] * m["sy"])
    naive = num / (math.sqrt(vx) * math.sqrt(vy))
    assert fast["rho"] == naive


def test_rank_correlation_grouped_matches_naive(spark):
    """group_col mode: one rho per source, each bit-identical to the
    naive per-group RANK() formulation."""
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.functions.text import tokens
    from whatdropsnow_etl_spark.operators import rank_correlation
    from whatdropsnow_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "n_tokens", F.size(tokens(F.col("text")))
    )
    fast = {
        r["source"]: (r["n_rows"], r["rho"])
        for r in rank_correlation(
            docs, "n_chars", "n_tokens", group_col="source"
        ).collect()
    }

    def ar2(c):
        return (
            2 * F.rank().over(W.partitionBy("source").orderBy(F.col(c)))
            + F.count(F.lit(1)).over(W.partitionBy("source", F.col(c)))
            - 1
        ).cast("bigint")

    r = docs.select(
        "source", ar2("n_chars").alias("ax"), ar2("n_tokens").alias("ay")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    for m in (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(dec("ax")).alias("sx"),
            F.sum(dec("ay")).alias("sy"),
            F.sum(dec("ax") * dec("ax")).alias("sxx"),
            F.sum(dec("ay") * dec("ay")).alias("syy"),
            F.sum(dec("ax") * dec("ay")).alias("sxy"),
        )
        .collect()
    ):
        num = float(m["n"] * m["sxy"] - m["sx"] * m["sy"])
        vx = float(m["n"] * m["sxx"] - m["sx"] * m["sx"])
        vy = float(m["n"] * m["syy"] - m["sy"] * m["sy"])
        naive = num / (math.sqrt(vx) * math.sqrt(vy))
        assert fast[m["source"]] == (int(m["n"]), naive), m["source"]
