"""Pins for the r9 additions: reliability-diagram calibration,
Cohen's kappa, pairwise vocabulary Jaccard, and MAD outlier flags.

Each operator is checked against a hand-built case or an independent
pure-Python reference (never against its own oracle SQL — the driver
gate does that comparison separately).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    calibration_bins,
    cohens_kappa,
    mad_outliers,
    vocab_jaccard,
)


def test_calibration_bins_hand_case(spark):
    rows = [
        # bin 0: scores .02/.05, labels 0/0 -> pos_rate 0
        (0.02, 0), (0.05, 0),
        # bin 5: scores .50/.55/.59, labels 1/0/1 -> pos_rate 2/3
        (0.50, 1), (0.55, 0), (0.59, 1),
        # bin 9: score 1.0 clamps into the top bin, label 1
        (1.0, 1),
        # out-of-range clamps: -0.2 -> bin 0; 1.7 -> bin 9
        (-0.2, 0), (1.7, 1),
    ]
    df = spark.createDataFrame(rows, "score double, y long")
    got = {r.bin: r for r in calibration_bins(df, "score", "y").collect()}
    assert set(got) == {0, 5, 9}
    b0, b5, b9 = got[0], got[5], got[9]
    assert (b0.n, b0.n_pos) == (3, 0)
    # exact micro sums: .02+.05+(-0.2) = -130000
    assert b0.sum_score_fp == "-130000"
    # gap num = |0*1e6 - (-130000)| = 130000 over this BIN's n*scale
    assert b0.pos_rate == 0.0 and b0.gap == round(130000 / 3e6, 6)
    assert (b5.n, b5.n_pos) == (3, 2)
    assert b5.sum_score_fp == str(500000 + 550000 + 590000)
    assert b5.pos_rate == round(2 / 3, 6)
    assert b5.mean_score == round(1640000 / 3e6, 6)
    # gap num = |2*1e6 - 1640000| = 360000
    assert b5.gap == round(360000 / 3e6, 6)
    assert (b9.n, b9.n_pos) == (2, 2)
    # ece identical on every row and equals the weighted gap sum
    # bin9 gapnum = |2e6 - 2700000| = 700000
    ece_num = 130000 + 360000 + 700000
    assert {r.ece_num for r in got.values()} == {str(ece_num)}
    assert b0.ece == round(ece_num / (8 * 1e6), 6)


def test_calibration_bins_filters_bad_labels(spark):
    df = spark.createDataFrame(
        [(0.5, 1), (0.5, 2), (None, 1), (0.5, None)],
        "score double, y long",
    )
    out = calibration_bins(df, "score", "y").collect()
    assert len(out) == 1 and out[0].n == 1


def _kappa_ref(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra, cb = {}, {}
    for a, b in pairs:
        ra[a] = ra.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    rc = sum(ra[k] * cb.get(k, 0) for k in ra)
    num, den = n * agree - rc, n * n - rc
    return n, agree, num, den


def test_cohens_kappa_matches_reference(spark):
    pairs = [
        ("en", "en"), ("en", "en"), ("en", "de"), ("de", "de"),
        ("de", "en"), ("fr", "fr"), ("fr", "en"), ("en", "en"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, agree, num, den = _kappa_ref(pairs)
    assert (r.n, r.n_agree) == (n, agree)
    assert (r.kappa_num, r.kappa_den) == (str(num), str(den))
    assert r.kappa == round(num / den, 6)


def test_cohens_kappa_edges(spark):
    # perfect agreement -> 1.0 even with several classes
    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0].kappa == 1.0
    # both raters constant -> pe = 1, kappa undefined -> NULL
    const = spark.createDataFrame(
        [("x", "x"), ("x", "x")], "a string, b string"
    )
    r = cohens_kappa(const, "a", "b").collect()[0]
    assert r.kappa is None and r.kappa_den == "0"
    # NULL on either side is excluded, not a class
    holes = spark.createDataFrame(
        [("x", "x"), (None, "x"), ("x", None)], "a string, b string"
    )
    assert cohens_kappa(holes, "a", "b").collect()[0].n == 1


def test_vocab_jaccard_hand_case(spark):
    docs = [
        (0, "alpha beta gamma", "s1"),
        (1, "beta delta", "s1"),
        (2, "beta gamma epsilon", "s2"),
        (3, "zeta", "s3"),  # disjoint from everything
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {(r.src_a, r.src_b): r for r in vocab_jaccard(df).collect()}
    # full unordered grid, including zero-overlap pairs
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = got[("s1", "s2")]
    # V1={alpha,beta,gamma,delta} V2={beta,gamma,epsilon}: inter 2
    assert (r12.n_inter, r12.n_a, r12.n_b, r12.n_union) == (2, 4, 3, 5)
    assert r12.jaccard == 0.4
    r13 = got[("s1", "s3")]
    assert (r13.n_inter, r13.n_union, r13.jaccard) == (0, 5, 0.0)


def test_vocab_jaccard_case_and_dedup(spark):
    # tokens lowercase; repeats inside a source count once
    docs = [(0, "The THE the", "a"), (1, "the dog", "b")]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    r = vocab_jaccard(df).collect()[0]
    assert (r.n_a, r.n_b, r.n_inter) == (1, 2, 1)


def test_mad_outliers_whale_robustness(spark):
    # 9 values near 10, one whale at 1e6: mean/stddev screening at
    # 3 sigma misses NOTHING ELSE because sigma explodes; MAD flags
    # exactly the whale
    rows = [(i, "t", 10.0 + 0.1 * i) for i in range(9)]
    rows.append((9, "t", 1_000_000.0))
    df = spark.createDataFrame(rows, "event_id long, g string, v double")
    got = mad_outliers(df, ["g"], "v", "event_id", k=3, scale=1000000).collect()
    assert [r.event_id for r in got] == [9]
    r = got[0]
    # med = lo-median of 10 values = value at rank 5 = 10.4
    assert r.med_fp == 10_400_000
    assert r.value_fp == 1_000_000_000_000
    assert r.dev_fp == r.value_fp - r.med_fp
    # mad = lo-median of devs {0.4,0.3,0.2,0.1,0,...}: sorted devs
    # [0,.1,.2,.3,.4,.1,.2,.3,.4, whale] -> rank 5 of 10 = 0.2
    assert r.mad_fp == 200_000


def test_mad_outliers_groups_and_degeneracy(spark):
    rows = [
        # group a: constant except one -> MAD 0, the deviant flags
        (0, "a", 5.0), (1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.1),
        # group b: clean spread, no flags at k=3
        (4, "b", 1.0), (5, "b", 2.0), (6, "b", 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, g string, v double")
    got = {
        r.event_id: r
        for r in mad_outliers(
            df, ["g"], "v", "event_id", k=3, scale=1000000
        ).collect()
    }
    assert set(got) == {3}
    assert got[3].mad_fp == 0 and got[3].dev_fp == 100_000
    # determinism under repartition
    again = {
        r.event_id
        for r in mad_outliers(
            df.repartition(7), ["g"], "v", "event_id", k=3, scale=1000000
        ).collect()
    }
    assert again == {3}


def test_mad_outliers_agrees_with_numeric_outliers_report(spark, tables):
    """The pairing contract: at the shared defaults (k=5, integer
    cents), numeric_outliers' per-group n_outliers equals the number
    of rows mad_outliers emits for that group — the report and its
    apply half never disagree."""
    from whatdropsnow_etl_spark.operators import numeric_outliers

    ev = tables["events"]
    report = {
        r["event_type"]: r["n_outliers"]
        for r in numeric_outliers(ev).collect()
    }
    flagged: dict = {}
    for r in mad_outliers(ev, ["event_type"], "value", "event_id").collect():
        flagged[r.event_type] = flagged.get(r.event_type, 0) + 1
    assert {g: n for g, n in report.items() if n > 0} == flagged


def test_interevent_stats_python_reference(spark):
    import datetime as dt
    import math

    from whatdropsnow_etl_spark.operators import interevent_stats

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: metronomic gaps of 10s -> cv 0, burstiness -1
        (1, t0, 1), (2, t0 + 10 * s, 1), (3, t0 + 20 * s, 1),
        # user 2: bursty 1s,1s,28s
        (4, t0, 2), (5, t0 + 1 * s, 2), (6, t0 + 2 * s, 2),
        (7, t0 + 30 * s, 2),
        # user 3: single event -> no row
        (8, t0, 3),
        # user 4: two simultaneous events -> gap 0, NULL cv/B
        (9, t0, 4), (10, t0, 4),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {r.user_id: r for r in interevent_stats(df).collect()}
    assert set(got) == {1, 2, 4}

    def ref(gaps_us):
        n = len(gaps_us)
        sd = sum(gaps_us)
        ss = sum(g * g for g in gaps_us)
        v = n * ss - sd * sd
        cv = math.sqrt(v) / sd
        b = (math.sqrt(v) - sd) / (math.sqrt(v) + sd)
        return n, sd, str(ss), round(cv, 6), round(b, 6)

    u1 = got[1]
    assert (u1.n_gaps, u1.sum_dt_us, u1.sumsq_dt, u1.cv, u1.burstiness) == ref(
        [10_000_000, 10_000_000]
    )
    assert u1.cv == 0.0 and u1.burstiness == -1.0
    u2 = got[2]
    assert (u2.n_gaps, u2.sum_dt_us, u2.sumsq_dt, u2.cv, u2.burstiness) == ref(
        [1_000_000, 1_000_000, 28_000_000]
    )
    assert u2.burstiness > 0  # bursty actor scores positive
    u4 = got[4]
    assert (u4.n_gaps, u4.sum_dt_us) == (1, 0)
    assert u4.cv is None and u4.burstiness is None


def test_kcore_peel_pass_hand_graph(spark):
    from whatdropsnow_etl_spark.operators import kcore_peel_pass

    # triangle 1-2-3, pendant 4 off node 1, isolated edge 5-6
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (5, 6), (6, 5), (7, 7)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r for r in kcore_peel_pass(pairs, k=2).collect()}
    # k=2 survivors: the triangle only (4 has deg 1; 5/6 deg 1 after
    # the duplicate/self-loop canonicalization)
    assert set(got) == {1, 2, 3}
    assert got[1].deg0 == 3  # triangle + pendant
    assert got[2].deg0 == 2 and got[3].deg0 == 2
    # survivor-induced degrees: the pendant edge is gone
    assert got[1].deg1 == 2 and got[2].deg1 == 2 and got[3].deg1 == 2
    # k=3: only node 1 has deg0 >= 3; its neighbors all peel -> deg1 0
    got3 = {r.node: r for r in kcore_peel_pass(pairs, k=3).collect()}
    assert set(got3) == {1} and got3[1].deg1 == 0
    # iterating the pass to fixpoint yields the 2-core exactly
    state = pairs
    for _ in range(3):
        keep = kcore_peel_pass(state, k=2).select(F.col("node"))
        state = (
            state.join(keep.withColumnRenamed("node", "doc_a"), "doc_a", "left_semi")
            .join(keep.withColumnRenamed("node", "doc_b"), "doc_b", "left_semi")
        )
    assert sorted(
        (r.doc_a, r.doc_b) for r in state.collect()
    ) == [(1, 2), (1, 3), (2, 3)]
