"""Pins for the r11 ADVICE fixes: floor-semantics seasonality cells
for pre-1970 epochs, the kcore_decompose rounds-exhausted error, and
the _cached_inputs release convention on the r10 persisting ops.

Each check runs against a hand-built case or an independent
pure-Python reference (never against its own oracle SQL — the driver
gate does that comparison separately).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_weekly_seasonality_pre_1970(spark):
    """Pre-1970 (negative-epoch) timestamps must land in the same
    UTC (dow, hour) cell Python's calendar assigns — truncating
    div/% would shift dow and emit negative hours there (ADVICE
    r10). Reference: datetime in UTC, isoweekday mapped to the
    0=Sunday convention."""
    from whatdropsnow_etl_spark.operators import weekly_seasonality

    stamps = [
        dt.datetime(1969, 12, 31, 23, 59, 59),  # Wednesday, hour 23
        dt.datetime(1969, 12, 31, 0, 0, 1),  # Wednesday, hour 0
        dt.datetime(1955, 3, 14, 6, 30, 0),  # Monday, hour 6
        dt.datetime(1969, 7, 20, 20, 17, 40),  # Sunday, hour 20
        dt.datetime(2024, 1, 1, 8, 0, 0),  # Monday, hour 8 (control)
    ]
    rows = [(i, "e", s) for i, s in enumerate(stamps)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {
        (r.dow, r.hour): r.n_events
        for r in weekly_seasonality(df).collect()
    }
    expect: dict = {}
    for s in stamps:
        # isoweekday: Mon=1..Sun=7 -> 0=Sunday convention
        cell = (s.isoweekday() % 7, s.hour)
        expect[cell] = expect.get(cell, 0) + 1
    assert got == expect
    assert all(0 <= d <= 6 and 0 <= h <= 23 for d, h in got)


def test_streaming_seasonality_pre_1970_equals_batch(spark):
    """The streaming fold shares epoch_day_cell, so pre-1970 rows
    fold into the identical cells batch assigns."""
    from whatdropsnow_etl_spark.operators import weekly_seasonality
    from whatdropsnow_etl_spark.streaming import (
        fold_seasonality_cells,
        seasonality_report,
    )

    rows = [
        (1, "a", dt.datetime(1962, 2, 20, 14, 47, 39)),
        (2, "a", dt.datetime(1969, 12, 31, 23, 0, 0)),
        (3, "b", dt.datetime(1970, 1, 1, 0, 0, 0)),
        (4, "b", dt.datetime(2023, 6, 1, 12, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    state = None
    for lo, hi in ((1, 2), (3, 4)):
        state = fold_seasonality_cells(
            state, df.where(F.col("event_id").between(lo, hi))
        )
    folded = sorted(
        [tuple(r) for r in seasonality_report(state).collect()], key=repr
    )
    full = sorted(
        [tuple(r) for r in weekly_seasonality(df).collect()], key=repr
    )
    assert folded == full


def test_kcore_decompose_rounds_exhausted_raises(spark):
    """max_rounds too small must fail loudly, not return a partial
    decomposition (ADVICE r10)."""
    import pytest

    from whatdropsnow_etl_spark.operators.graph import (
        KCoreRoundsExhausted,
        kcore_decompose,
    )

    # triangle + pendant: needs >= 3 rounds (peel pendant at k=1,
    # advance, peel triangle at k=2)
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "doc_a string, doc_b string",
    )
    with pytest.raises(KCoreRoundsExhausted, match="max_rounds=1"):
        kcore_decompose(pairs, max_rounds=1)
    # ample rounds still decompose fully
    got = {
        r.node: r.coreness for r in kcore_decompose(pairs).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1}


def test_cached_inputs_release_convention(spark):
    """The r10 persisting operators expose their pinned relations via
    _cached_inputs so long-lived sessions can release them (ADVICE
    r10): mmr_select_pass, nn_descent_recall_curve, and
    budget_curve_from_bins through token_budget_curve."""
    from whatdropsnow_etl_spark.operators import (
        mmr_select_pass,
        nn_descent_recall_curve,
        token_budget_curve,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    out = mmr_select_pass(vecs, vecs.limit(2), pool=3)
    assert hasattr(out, "_cached_inputs") and len(out._cached_inputs) == 1
    out.collect()
    for c in out._cached_inputs:
        c.unpersist()

    out = nn_descent_recall_curve(vecs, rounds=1, k=2)
    assert hasattr(out, "_cached_inputs") and len(out._cached_inputs) == 1
    out.collect()
    for c in out._cached_inputs:
        c.unpersist()

    docs = spark.createDataFrame(
        [(1, 0.2, 10), (2, 0.7, 20), (3, 0.9, 5)],
        "doc_id long, quality double, n_tokens long",
    )
    out = token_budget_curve(docs, score_col="quality", weight_col="n_tokens")
    assert hasattr(out, "_cached_inputs") and len(out._cached_inputs) == 1
    rows = out.collect()
    assert len(rows) > 0
    for c in out._cached_inputs:
        c.unpersist()


def test_floor_log2_ratio_signed_exact(spark):
    """The signed whole-bit log2 matches exact integer math on both
    sides of ratio 1 (independent reference: Fraction bit-walk)."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators.corpus import (
        _floor_log2_ratio_signed,
    )

    def py_floor_log2(num, den):
        f = Fraction(num, den)
        e = 0
        while f >= 2:
            f /= 2
            e += 1
        while f < 1:
            f *= 2
            e -= 1
        return e

    cases = [
        (1, 1), (1, 2), (1, 3), (2, 3), (3, 2), (5, 7), (7, 5),
        (4, 8), (8, 4), (1, 1024), (1023, 1024), (1025, 1024),
        (999999937, 7), (7, 999999937), (3 ** 20, 2 ** 30),
        (2 ** 30, 3 ** 20), (6, 48), (48, 6),
    ]
    df = spark.createDataFrame(cases, "num long, den long")
    got = {
        (r.num, r.den): r.bits
        for r in df.select(
            "num",
            "den",
            _floor_log2_ratio_signed(F.col("num"), F.col("den")).alias(
                "bits"
            ),
        ).collect()
    }
    for num, den in cases:
        assert got[(num, den)] == py_floor_log2(num, den), (num, den)


def test_kl_source_divergence_hand_corpus(spark):
    """Two-source corpus checked against a pure-Python whole-bit KL
    reference (same add-1-smoothed rest distribution)."""
    from collections import Counter

    from whatdropsnow_etl_spark.operators import kl_source_divergence

    docs = [
        (1, "a a a b", "s1"),
        (2, "a b b c", "s1"),
        (3, "c c c d d", "s2"),
        (4, "a d", "s2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_tokens, r.vocab, r.sum_bits, r.kl_bits)
        for r in kl_source_divergence(df).collect()
    }

    toks = {}
    for _, text, src in docs:
        toks.setdefault(src, []).extend(t for t in text.split(" ") if t)
    all_counts = Counter(c for v in toks.values() for c in v)
    n_all = sum(all_counts.values())
    v_all = len(all_counts)

    def py_floor_log2(num, den):
        e = num.bit_length() - den.bit_length()
        if e >= 0:
            return e if num >= (den << e) else e - 1
        e = -e
        return -e if (num << e) == den else -(e + 1) if (num << e) < den else -e
    for src, words in toks.items():
        c = Counter(words)
        n_s = sum(c.values())
        sum_bits = 0
        for w, cw in c.items():
            d = all_counts[w] - cw
            num = cw * (n_all - n_s + v_all)
            den = (d + 1) * n_s
            sum_bits += cw * py_floor_log2(num, den)
        assert got[src][0] == n_s
        assert got[src][1] == len(c)
        assert got[src][2] == sum_bits, src
        assert got[src][3] == round(sum_bits / n_s, 6)


def test_survival_hazard_hand_case(spark):
    """Risk sets and hazards over a constructed cohort: users churn
    at known day offsets; censoring = last event within 7 days of
    the global max."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import survival_hazard

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # u1: duration 0d, last event day 1 -> churned (max - last > 7d)
    # u2: duration 2d, last day 12 -> churned
    # u3: duration 10d, last day 20 -> censored (within 7d of max=day 21)
    # u4: duration 0d, last day 21 (the max) -> censored
    spec = [(1, 1, 1), (2, 10, 12), (3, 10, 20), (4, 21, 21)]
    for u, d0, d1 in spec:
        for d in (d0, d1):
            rows.append((eid, u, base + dt.timedelta(days=d)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.t_days: (r.n_risk, r.n_churned, r.n_censored, r.hazard)
        for r in survival_hazard(df).collect()
    }
    assert got == {
        0: (4, 1, 1, 0.25),   # u1 churned, u4 censored; all 4 at risk
        2: (2, 1, 0, 0.5),    # u2 churned at 2; u2,u3 still at risk
        10: (1, 0, 1, 0.0),   # u3 censored at 10
    }


def test_event_xcorr_hand_series(spark):
    """Lag-1 cross-correlation of two constructed hourly series
    checked against numpy's corrcoef on the shifted windows."""
    import datetime as dt

    import numpy as np

    from whatdropsnow_etl_spark.operators import event_xcorr

    base = dt.datetime(2024, 1, 1)
    # type A counts per hour 0..5: [3,1,4,1,5,9]
    # type B counts per hour 0..5: [2,7,1,8,2,8]
    xa = [3, 1, 4, 1, 5, 9]
    xb = [2, 7, 1, 8, 2, 8]
    rows = []
    eid = 0
    for h, n in enumerate(xa):
        for _ in range(n):
            rows.append((eid, "A", base + dt.timedelta(hours=h))); eid += 1
    for h, n in enumerate(xb):
        for _ in range(n):
            rows.append((eid, "B", base + dt.timedelta(hours=h))); eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {
        (r.type_a, r.type_b, r.lag): (r.n_hours, r.sum_xy, r.corr)
        for r in event_xcorr(df, max_lag=2).collect()
    }
    assert len(got) == 6  # 2 ordered pairs x 3 lags
    for lag in (0, 1, 2):
        a = np.array(xa[: 6 - lag], dtype=float)
        b = np.array(xb[lag:], dtype=float)
        expect = float(np.corrcoef(a, b)[0, 1])
        n_hours, sum_xy, corr = got[("A", "B", lag)]
        assert n_hours == 6 - lag
        assert sum_xy == int((a * b).sum())
        assert abs(corr - expect) < 1e-6, (lag, corr, expect)


def test_seasonal_anomalies_hand_spike(spark):
    """A flat 5-week Monday-09:00 baseline with one spiked week:
    only the spiked bucket crosses the 2-sigma gate, with the exact
    integer z."""
    import datetime as dt
    import math

    from whatdropsnow_etl_spark.operators import seasonal_anomalies

    rows = []
    eid = 0
    # 2024-01-01 is a Monday; 5 consecutive Mondays at 09:00
    counts = [2, 2, 2, 2, 12]
    for wk, n in enumerate(counts):
        t = dt.datetime(2024, 1, 1, 9, 30) + dt.timedelta(weeks=wk)
        for _ in range(n):
            rows.append((eid, "click", t)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {(r.day, r.hour): r for r in seasonal_anomalies(df).collect()}
    w, s1 = 5, sum(counts)
    s2 = sum(c * c for c in counts)
    spike_day = (dt.datetime(2024, 1, 29) - dt.datetime(1970, 1, 1)).days
    z = round((w * 12 - s1) / math.sqrt(w * s2 - s1 * s1), 6)
    assert set(got) == {(spike_day, 9)}
    r = got[(spike_day, 9)]
    assert (r.n_events, r.n_weeks, r.cell_total, r.dow, r.z) == (12, 5, s1, 1, z)


def test_streaming_anomaly_equals_batch(spark):
    """The anomaly bucket fold is a commutative monoid sharing
    anomalies_from_buckets, so batch-folded == seasonal_anomalies
    over the full relation exactly (3-way split)."""
    from whatdropsnow_etl_spark.operators import seasonal_anomalies
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        anomaly_report,
        fold_anomaly_buckets,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    splits = [
        ev.where(F.col("event_id") % 3 == i) for i in range(3)
    ]
    state = None
    for part in splits:
        state = fold_anomaly_buckets(state, part)
    folded = sorted(
        [tuple(r) for r in anomaly_report(state).collect()], key=repr
    )
    full = sorted(
        [tuple(r) for r in seasonal_anomalies(ev).collect()], key=repr
    )
    assert folded == full and len(full) > 0


def test_streaming_survival_equals_batch(spark):
    """The per-user bounds fold is a min/max monoid sharing
    hazard_from_user_bounds, so batch-folded == survival_hazard over
    the full relation exactly (3-way split)."""
    from whatdropsnow_etl_spark.operators import survival_hazard
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        fold_user_bounds,
        survival_report,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    state = None
    for i in range(3):
        state = fold_user_bounds(state, ev.where(F.col("event_id") % 3 == i))
    folded = sorted(
        [tuple(r) for r in survival_report(state).collect()], key=repr
    )
    full = sorted(
        [tuple(r) for r in survival_hazard(ev).collect()], key=repr
    )
    assert folded == full and len(full) > 0


def test_kmv_set_ops_hand_overlap(spark):
    """Exact-regime set algebra on constructed overlapping groups:
    estimates equal true set sizes when k exceeds every union."""
    from whatdropsnow_etl_spark.operators import kmv_set_ops

    rows = (
        [(i, "a") for i in range(10)]
        + [(i, "b") for i in range(5, 20)]
        + [(i, "c") for i in range(100, 103)]
    )
    df = spark.createDataFrame(rows, "v long, g string")
    got = {
        (r.group_a, r.group_b): (
            r.est_a, r.est_b, r.est_union, r.est_intersection, r.jaccard
        )
        for r in kmv_set_ops(df, "g", "v", k=64).collect()
    }
    assert got[("a", "b")] == (10, 15, 20, 5, 0.25)
    assert got[("a", "c")] == (10, 3, 13, 0, 0.0)
    assert got[("b", "c")] == (15, 3, 18, 0, 0.0)


def test_kmv_set_ops_estimator_regime(spark):
    """Past k the union estimate comes from (k-1)/u_k — still within
    the ~1/sqrt(k) band, and the intersection stays clamped >= 0."""
    from whatdropsnow_etl_spark.operators import kmv_set_ops

    rows = [(i, "a") for i in range(2000)] + [
        (i, "b") for i in range(1000, 3000)
    ]
    df = spark.createDataFrame(rows, "v long, g string")
    r = kmv_set_ops(df, "g", "v", k=256).collect()[0]
    assert abs(r.est_union - 3000) / 3000 < 0.25
    assert r.est_intersection >= 0


def test_l_diversity_hand_classes(spark):
    """A homogeneous class (k rows, one sensitive value) must flag
    diverse=false while a same-sized diverse class passes."""
    from whatdropsnow_etl_spark.operators import l_diversity_report

    rows = (
        [("q1", "s1")] * 5
        + [("q2", "s1"), ("q2", "s2"), ("q2", "s2"), ("q2", "s3")]
    )
    df = spark.createDataFrame(rows, "q string, s string")
    got = {
        r.q: (r.n_rows, r.n_sensitive, r.top_share, r.diverse)
        for r in l_diversity_report(df, ["q"], "s", l_min=2).collect()
    }
    assert got["q1"] == (5, 1, 1.0, False)
    assert got["q2"] == (4, 3, 0.5, True)


def test_degree_assortativity_hand_graphs(spark):
    """Star (r = -1), 4-clique (r undefined: regular), and path P4
    (known r) against networkx-free closed forms."""
    from whatdropsnow_etl_spark.operators import degree_assortativity

    def run(edges):
        df = spark.createDataFrame(edges, "doc_a string, doc_b string")
        return degree_assortativity(df).collect()[0]

    # star K1,3: every edge joins deg-3 hub to deg-1 leaf -> r = -1
    r = run([("h", "a"), ("h", "b"), ("h", "c")])
    assert (r.n_nodes, r.n_edges, r.assortativity) == (4, 3, -1.0)

    # 4-clique: degree-regular -> zero variance -> NULL r
    clique = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    r = run(clique)
    assert r.assortativity is None and r.r_den == "0"

    # path a-b-c-d: degrees 1,2,2,1; directed pairs
    # (1,2),(2,1),(2,2),(2,2),(2,1),(1,2): exact r = -1/2... compute:
    # M=6 sx=10 sxx=18 sxy=2*(2+4+2)=16 -> num=96-100=-4 den=108-100=8
    r = run([("a", "b"), ("b", "c"), ("c", "d")])
    assert (r.r_num, r.r_den) == ("-4", "8")
    assert r.assortativity == -0.5


def test_cusum_changepoints_hand_series(spark):
    """A level-shifted daily series checked against a pure-Python
    CUSUM recurrence (max(0, S + d) with n-scaled deviations)."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import cusum_changepoints

    base = dt.datetime(2024, 3, 1, 12, 0)
    daily = [4, 4, 4, 4, 4, 12, 12, 12]  # shift up at day 5
    rows = []
    eid = 0
    for day, n in enumerate(daily):
        for _ in range(n):
            rows.append((eid, "e", base + dt.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {
        r.day: r for r in cusum_changepoints(df, threshold_ppm=200_000).collect()
    }
    n, t = len(daily), sum(daily)
    su = sd = 0
    first_flag_day = None
    d0 = (base.date() - dt.date(1970, 1, 1)).days
    for day, x in enumerate(daily):
        d = n * x - t
        su = max(0, su + d)
        sd = max(0, sd - d)
        r = got[d0 + day]
        assert r.n_events == x
        assert r.cusum_up == round(su / n, 6)
        assert r.cusum_down == round(sd / n, 6)
        assert r.flag_up == (1_000_000 * su > 200_000 * t * n)
        assert r.flag_down == (1_000_000 * sd > 200_000 * t * n)
        if r.flag_up and first_flag_day is None:
            first_flag_day = day
    # the sustained shift must eventually flag, and not before it starts
    assert first_flag_day is not None and first_flag_day >= 5


def test_streaming_xcorr_equals_batch(spark):
    """The hourly histogram fold is a commutative monoid sharing
    xcorr_from_hourly, so batch-folded == event_xcorr over the full
    relation exactly (3-way split)."""
    from whatdropsnow_etl_spark.operators import event_xcorr
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        fold_hourly_counts,
        xcorr_report,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    state = None
    for i in range(3):
        state = fold_hourly_counts(state, ev.where(F.col("event_id") % 3 == i))
    folded = sorted(
        [tuple(r) for r in xcorr_report(state).collect()], key=repr
    )
    full = sorted(
        [tuple(r) for r in event_xcorr(ev).collect()], key=repr
    )
    assert folded == full and len(full) > 0


def test_mann_kendall_hand_series(spark):
    """Known monotone and shifted series vs a pure-Python MK/Sen
    reference (S sign sum; type-1 lower-median pairwise slope)."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import mann_kendall_trend

    base = dt.datetime(2024, 5, 1, 6, 0)
    daily = [1, 2, 3, 5, 8, 4, 4]
    rows = []
    eid = 0
    for day, n in enumerate(daily):
        for _ in range(n):
            rows.append((eid, "e", base + dt.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    r = mann_kendall_trend(df).collect()[0]
    n = len(daily)
    pairs = [
        (i, j) for i in range(n) for j in range(i + 1, n)
    ]
    s_stat = sum(
        (daily[j] > daily[i]) - (daily[j] < daily[i]) for i, j in pairs
    )
    ties = sum(1 for i, j in pairs if daily[i] == daily[j])
    slopes = sorted(
        ((daily[j] - daily[i]) / (j - i), i, j) for i, j in pairs
    )
    med = slopes[(len(slopes) + 1) // 2 - 1][0]
    assert (r.n_days, r.s_stat, r.n_pairs, r.n_tied_pairs) == (
        n, s_stat, len(pairs), ties
    )
    assert r.tau == round(s_stat / len(pairs), 6)
    assert r.sen_slope == round(med, 6)


def test_token_entropy_hand_corpus(spark):
    """Two-source corpus vs a pure-Python whole-bit entropy
    reference (floor(log2(N/c)) per word, Σ c·bits / N)."""
    from collections import Counter

    from whatdropsnow_etl_spark.operators import token_entropy

    docs = [
        (1, "a a a a", "uniform1"),  # one word: entropy 0
        (2, "a b c d", "diverse"),   # four singletons: floor(log2 4)=2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_tokens, r.vocab, r.sum_bits, r.entropy_bits)
        for r in token_entropy(df).collect()
    }
    for src, text in [("uniform1", docs[0][1]), ("diverse", docs[1][1])]:
        c = Counter(t for t in text.split(" ") if t)
        n = sum(c.values())
        def fl2(num, den):
            e = num.bit_length() - den.bit_length()
            return e if num >= (den << e) else e - 1
        sb = sum(cw * fl2(n, cw) for cw in c.values())
        assert got[src] == (n, len(c), sb, round(sb / n, 6)), src
    assert got["uniform1"][3] == 0.0
    assert got["diverse"][3] == 2.0
