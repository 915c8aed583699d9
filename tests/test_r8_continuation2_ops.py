"""Pins for the second r8 continuation batch: growth accounting,
session entry/exit, exact token Gini, Kneser-Ney continuation
counts, one LPA round, and embedding decontamination.

Each operator is checked against a hand-built case or an
independent pure-Python reference (never against its own oracle
SQL — the driver gate does that comparison separately).
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    entry_exit_report,
    fano_burstiness,
    mnn_pairs,
    rfm_segments,
    kn_continuation_counts,
    label_propagation_pass,
    semantic_decontaminate,
    token_gini,
    user_lifecycle,
)


def _ts(day: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 12, 0) + dt.timedelta(minutes=minute)


def _ev_schema():
    return "event_id long, ts timestamp, user_id long, event_type string"


def test_user_lifecycle_classes_and_churn(spark):
    # u1 active d1,d2,d3; u2 active d1,d3 (gap); u3 active d2 only
    rows = [
        (1, _ts(1), 1, "x"), (2, _ts(2), 1, "x"), (3, _ts(3), 1, "x"),
        (4, _ts(1), 2, "x"), (5, _ts(3), 2, "x"),
        (6, _ts(2), 3, "x"),
        # a second same-day event must not double-count activity
        (7, _ts(2, 30), 3, "x"),
    ]
    df = spark.createDataFrame(rows, _ev_schema())
    got = {r.day.isoformat(): r for r in user_lifecycle(df).collect()}
    assert set(got) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    d1, d2, d3 = (got["2024-01-0" + str(i)] for i in (1, 2, 3))
    assert (d1.dau, d1.new_users, d1.retained_users,
            d1.resurrected_users, d1.churned_users) == (2, 2, 0, 0, 0)
    # d2: u1 retained, u3 new; u2 churned (active d1, not d2)
    assert (d2.dau, d2.new_users, d2.retained_users,
            d2.resurrected_users, d2.churned_users) == (2, 1, 1, 0, 1)
    # d3: u1 retained, u2 resurrected; u3 churned
    assert (d3.dau, d3.new_users, d3.retained_users,
            d3.resurrected_users, d3.churned_users) == (2, 0, 1, 1, 1)
    # growth-accounting identities on every day
    for d in (d1, d2, d3):
        assert d.dau == d.new_users + d.retained_users + d.resurrected_users
    assert d2.churned_users == d1.dau - d2.retained_users
    assert d3.churned_users == d2.dau - d3.retained_users
    # NO churn row for d4 — the last observed day emits no future


def test_user_lifecycle_churn_only_day(spark):
    # one user, active d1 and d4: d2 is a churn-only row (dau 0),
    # d4 a resurrection; d3 has no row at all
    rows = [(1, _ts(1), 1, "x"), (2, _ts(4), 1, "x")]
    df = spark.createDataFrame(rows, _ev_schema())
    got = {r.day.isoformat(): r for r in user_lifecycle(df).collect()}
    assert set(got) == {"2024-01-01", "2024-01-02", "2024-01-04"}
    d2 = got["2024-01-02"]
    assert (d2.dau, d2.churned_users) == (0, 1)
    d4 = got["2024-01-04"]
    assert (d4.dau, d4.resurrected_users, d4.churned_users) == (1, 1, 0)


def test_entry_exit_report_sessions_and_bounces(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, session 1: click -> view (entry click, exit view)
        (1, t0, 1, "click"), (2, t0 + 5 * m, 1, "view"),
        # user 1, session 2 (2h later): lone purchase (bounce)
        (3, t0 + 120 * m, 1, "purchase"),
        # user 2: lone click (bounce)
        (4, t0, 2, "click"),
    ]
    df = spark.createDataFrame(rows, _ev_schema())
    got = {r.event_type: r for r in entry_exit_report(df).collect()}
    assert set(got) == {"click", "view", "purchase"}
    c, v, p = got["click"], got["view"], got["purchase"]
    assert (c.entries, c.exits, c.bounces) == (2, 1, 1)
    assert (v.entries, v.exits, v.bounces) == (0, 1, 0)
    assert (p.entries, p.exits, p.bounces) == (1, 1, 1)
    assert {r.sessions for r in got.values()} == {3}
    assert c.entry_share == round(2 / 3, 6)
    assert c.bounce_rate == 0.5 and p.bounce_rate == 1.0
    assert v.bounce_rate is None  # never opens a session


def test_entry_exit_report_tie_determinism(spark):
    # two events at the SAME timestamp: (ts, id) order decides
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(2, t0, 1, "b"), (1, t0, 1, "a")]
    df = spark.createDataFrame(rows, _ev_schema())
    got = {r.event_type: r for r in entry_exit_report(df).collect()}
    assert got["a"].entries == 1 and got["b"].entries == 0
    assert got["b"].exits == 1 and got["a"].exits == 0


def _gini_reference(counts: list[int]) -> tuple[int, float]:
    xs = sorted(counts)
    k, n = len(xs), sum(xs)
    num = sum((2 * (i + 1) - k - 1) * x for i, x in enumerate(xs))
    return num, round(num / (k * n), 6)


def test_token_gini_matches_reference(spark):
    # src a: skewed (one dominant token); src b: perfectly uniform
    docs = [
        (0, "x x x x x x y z", "a"),
        (1, "x x y z", "a"),
        (2, "p q r s", "b"),
        (3, "s r q p", "b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {r.source: r for r in token_gini(df).collect()}
    # a: x=8, y=2, z=2  b: p=q=r=s=2
    num_a, g_a = _gini_reference([8, 2, 2])
    assert got["a"].gini_num == str(num_a) and got["a"].gini == g_a
    assert (got["a"].n_types, got["a"].n_tokens) == (3, 12)
    assert got["b"].gini_num == "0" and got["b"].gini == 0.0
    assert got["a"].gini > got["b"].gini


def test_token_gini_tie_run_closed_form(spark):
    # many tie runs — the closed-form run contribution must equal
    # the per-term ranked formula exactly
    counts = [1, 1, 1, 2, 2, 5, 5, 5, 9]
    words = [f"w{i} " * c for i, c in enumerate(counts)]
    df = spark.createDataFrame(
        [(0, " ".join(words), "s")], "doc_id long, text string, source string"
    )
    num, g = _gini_reference(counts)
    r = token_gini(df).collect()[0]
    assert r.gini_num == str(num) and r.gini == g


def _kn_reference(texts: list[str]):
    uni: dict[str, int] = {}
    types = set()
    for t in texts:
        toks = [w for w in t.lower().split(" ")]
        for w in toks:
            if w != "":
                uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            if a != "" and b != "":
                types.add((a, b))
    lc = {w: len({a for a, b in types if b == w}) for w in uni}
    rc = {w: len({b for a, b in types if a == w}) for w in uni}
    return uni, lc, rc, len(types)


def test_kn_continuation_counts_matches_reference(spark):
    texts = [
        "san francisco is foggy",
        "san diego is sunny",
        "san francisco bay",
        "the bay is cold",
        "is is is",  # self-bigram: one (is, is) type
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    uni, lc, rc, total = _kn_reference(texts)
    got = kn_continuation_counts(df, k=100).collect()
    assert len(got) == len(uni)
    for r in got:
        assert r.c == uni[r.word]
        assert r.n_left_ctx == lc[r.word], r.word
        assert r.n_right_ctx == rc[r.word], r.word
        assert r.n_bigram_types == total
        assert r.p_cont == round(lc[r.word] / total, 6)
    # "francisco" follows only "san": continuation count 1 despite
    # 2 raw occurrences — THE Kneser-Ney discrimination
    by_w = {r.word: r for r in got}
    assert by_w["francisco"].c == 2 and by_w["francisco"].n_left_ctx == 1
    # ranks follow (n_left_ctx DESC, word ASC) with no gaps
    ranked = sorted(got, key=lambda r: r.rank)
    assert [r.rank for r in ranked] == list(range(1, len(got) + 1))
    assert ranked == sorted(ranked, key=lambda r: (-r.n_left_ctx, r.word))


def test_kn_continuation_counts_topk_cut(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "c b"), (2, "a d")], "doc_id long, text string"
    )
    got = kn_continuation_counts(df, k=2).collect()
    assert len(got) == 2
    # b has 2 left contexts {a, c} — rank 1
    assert got[0].word == "b" or got[1].word == "b"
    assert {r.rank for r in got} == {1, 2}


def test_label_propagation_pass_votes_and_tiebreak(spark):
    edges = spark.createDataFrame(
        [
            (1, 2), (1, 3), (1, 4),  # node 1: neighbors labeled B,B,A
            (5, 6),                   # 5 <-> 6
            (7, 8),                   # 8 is unlabeled, 7 labeled A
            (9, 9),                   # self-loop: dropped
        ],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [
            (1, "A"), (2, "B"), (3, "B"), (4, "A"),
            (5, "A"), (6, "B"),
            (7, "A"),
            (9, "C"), (10, "D"),  # 10 is isolated
        ],
        "node long, label string",
    )
    got = {r.node: r for r in label_propagation_pass(edges, labels).collect()}
    # node 1: B wins 2-1
    assert got[1].new_label == "B" and got[1].old_label == "A"
    assert got[1].n_neighbors == 3 and got[1].top_count == 2
    # 1-1 tie at node 5 (neighbor B) — single vote, adopts B;
    # node 2's neighbors: only node 1 (A) -> A... and the A/B tie
    # on node 4's side: neighbors = {1: A} -> keeps A trivially.
    # Tiebreak proper: node 6 sees {5: A}, node 5 sees {6: B}.
    assert got[5].new_label == "B" and got[6].new_label == "A"
    # unlabeled node 8 adopts its neighbor's label
    assert got[8].old_label is None and got[8].new_label == "A"
    # labeled node 7's only neighbor (8) is unlabeled: keeps own
    assert got[7].new_label == "A" and got[7].n_neighbors == 0
    # self-loop contributes nothing
    assert got[9].new_label == "C" and got[9].n_neighbors == 0
    # isolated labeled node keeps its label
    assert got[10].new_label == "D" and got[10].top_count == 0


def test_label_propagation_pass_count_desc_label_asc_tie(spark):
    # 2-2 vote: the ASCENDING label wins
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(1, "Z"), (2, "B"), (3, "B"), (4, "A"), (5, "A")],
        "node long, label string",
    )
    got = {r.node: r for r in label_propagation_pass(edges, labels).collect()}
    assert got[1].new_label == "A" and got[1].top_count == 2


def test_semantic_decontaminate_threshold_and_nearest(spark):
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),    # cos 1.0 vs bench 100 -> flagged
            (2, [0.9, 0.9]),    # cos .7071 vs BOTH -> tie, lower id
            (3, [-1.0, 0.0]),   # cos -1 / 0 -> clean at 0.5
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r
        for r in semantic_decontaminate(cands, bench, threshold=0.5).collect()
    }
    assert set(got) == {1, 2}
    assert got[1].bench_id == 100 and got[1].cosine == 1.0
    # rounded-cosine tie -> benchmark id ascending
    assert got[2].bench_id == 100 and got[2].cosine == round(
        0.9 / (2 * 0.81) ** 0.5, 6
    )


def test_semantic_decontaminate_empty_when_clean(spark):
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cands = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    assert semantic_decontaminate(cands, bench, threshold=0.5).count() == 0


def test_semantic_decontaminate_lsh_matches_exact_on_separable(spark):
    # r9 (r8 verdict ask #3): the LSH pre-gate's flag set equals the
    # exact method's on separable data — contaminated candidates are
    # POSITIVE SCALINGS of bench vectors (sign-LSH keys are
    # scale-invariant, so they co-bucket in every table and score
    # cos=1.0), clean candidates sit far below the threshold, so the
    # recall trade cannot bite and the two methods must agree row
    # for row.
    bench = spark.createDataFrame(
        [
            (100, [1.0, 0.0, 2.0, -1.0]),
            (101, [0.0, 3.0, -1.0, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 4.0, -2.0]),    # 2.0 * bench 100
            (2, [0.0, 1.5, -0.5, 0.25]),   # 0.5 * bench 101
            (3, [0.1, -0.2, -0.3, -1.0]),  # clean vs both at 0.9
            (4, [-1.0, 0.0, -2.0, 1.0]),   # anti-parallel: cos -1
        ],
        "vec_id long, embedding array<double>",
    )
    exact = sorted(
        semantic_decontaminate(cands, bench, threshold=0.9).collect()
    )
    lsh = sorted(
        semantic_decontaminate(
            cands, bench, threshold=0.9, method="lsh"
        ).collect()
    )
    assert [r.vec_id for r in exact] == [1, 2]
    assert exact == lsh


def test_semantic_decontaminate_lsh_zero_corpus_shuffle_plan(spark):
    # the candidate side must reach the scorer through a broadcast
    # join only — no Exchange of the corpus relation in the pre-
    # window plan (the window's shuffle sees threshold survivors)
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cands = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    df = semantic_decontaminate(cands, bench, threshold=0.5, method="lsh")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_decontaminate_bad_method(spark):
    bench = spark.createDataFrame(
        [(100, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="method"):
        semantic_decontaminate(bench, bench, method="ivf")


def test_rfm_segments_ranks_and_remainder(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0)
    day = dt.timedelta(days=1)
    rows = []
    eid = 0
    # user u: last day 10-u  => recency rank == u order;
    # frequency u+1 events; monetary 100*(u+1) total
    for u in range(5):
        for k in range(u + 1):
            rows.append(
                (eid, t0 - u * day, u, "x", 100.0 * (u + 1) / (u + 1))
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = rfm_segments(df, n_tiles=5).collect()
    # 5 users, 5 tiles: every cell is a singleton; user 0 is most
    # recent (r=1) but least frequent (f=5) and lowest spend (m=5)
    assert sum(r.n_users for r in out) == 5
    cells = {(r.r_score, r.f_score, r.m_score) for r in out}
    assert (1, 5, 5) in cells and (5, 1, 1) in cells
    # ntile remainder: 5 users into 2 tiles -> 3 then 2 (early
    # tiles take the remainder, pinned so both engines must agree)
    out2 = rfm_segments(df, n_tiles=2).collect()
    r_counts: dict[int, int] = {}
    for r in out2:
        r_counts[r.r_score] = r_counts.get(r.r_score, 0) + r.n_users
    assert r_counts == {1: 3, 2: 2}


def test_rfm_segments_exact_cents(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    df = spark.createDataFrame(
        [(1, t0, 1, "x", 0.1), (2, t0, 1, "x", 0.2)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = rfm_segments(df).collect()
    assert len(out) == 1 and out[0].sum_cents == 30  # never 29.999...


def test_rfm_segments_scale_ranks_bit_identity(spark):
    # r9 (r8 verdict ask #4): the sample-sort ntile path must be
    # BIT-IDENTICAL to the window form — remainder tiles, metric
    # ties broken by user id, and the N < n_tiles degenerate case
    t0 = dt.datetime(2024, 3, 1, 12, 0)
    day = dt.timedelta(days=1)
    rows = []
    eid = 0
    # 23 users with deliberately tie-heavy metrics: frequency cycles
    # 1..3, spend cycles over 4 values, recency over 6 days
    for u in range(23):
        for k in range((u % 3) + 1):
            rows.append((eid, t0 - (u % 6) * day, u, "x", float(u % 4)))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    for n_tiles in (2, 5, 7, 50):  # 50 > 23 users: degenerate NTILE
        window_form = sorted(
            map(tuple, rfm_segments(df, n_tiles=n_tiles).collect())
        )
        scaled = sorted(
            map(
                tuple,
                rfm_segments(df, n_tiles=n_tiles, scale_ranks=True).collect(),
            )
        )
        assert window_form == scaled, n_tiles


def test_rfm_segments_scale_ranks_no_single_partition_window(spark):
    # every row_number window in the scaled plan partitions by the
    # sample-sort bucket — no corpus-wide single-task window
    t0 = dt.datetime(2024, 3, 1, 12, 0)
    df = spark.createDataFrame(
        [(i, t0, i % 7, "x", float(i)) for i in range(40)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    plan = (
        rfm_segments(df, scale_ranks=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = [
        l for l in plan.splitlines() if "Window" in l and "row_number" in l
    ]
    assert windows and all("__bkt" in l for l in windows), plan
    assert "ntile" not in plan


def test_fano_burstiness_constant_and_bursty(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    h = dt.timedelta(hours=1)
    rows = []
    eid = 0
    # type A: exactly one event per hour for 4 hours -> variance 0
    for i in range(4):
        rows.append((eid, t0 + i * h, 1, "A", 0.0)); eid += 1
    # type B: all 4 events inside hour 0 of the same global span
    for _ in range(4):
        rows.append((eid, t0, 2, "B", 0.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r.event_type: r for r in fano_burstiness(df).collect()}
    a, b = got["A"], got["B"]
    assert a.n_hours == 4 and b.n_hours == 4  # global span, both types
    assert (a.n_events, b.n_events) == (4, 4)
    # A: x=[1,1,1,1]: num = 4*4 - 16 = 0
    assert a.fano_num == "0" and a.fano == 0.0
    # B: x=[4,0,0,0] (zero hours are real): num = 4*16 - 16 = 48,
    # den = 16 -> fano 3.0
    assert b.fano_num == "48" and b.fano_den == "16" and b.fano == 3.0


def test_mnn_pairs_mutuality_and_groups(spark):
    vecs = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [2.0, 0.1]),    # mutual with 1
        (3, 0, [0.0, 1.0]),
        (4, 0, [0.1, 2.0]),    # mutual with 3
        (5, 0, [-1.0, -1.0]),  # nobody reciprocates
        (6, 1, [1.0, 0.0]),    # identical to 1 but another group
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, label int, embedding array<double>"
    )
    got = {(r.id_a, r.id_b): r for r in mnn_pairs(df, group_col="label").collect()}
    assert set(got) == {(1, 2), (3, 4)}
    assert all(r.label == 0 for r in got.values())
    # ungrouped: one global shard, same two pairs plus none for 5/6
    solo = {
        (r.id_a, r.id_b)
        for r in mnn_pairs(df.where("vec_id <= 5")).collect()
    }
    assert solo == {(1, 2), (3, 4)}


def test_rfm_segments_null_spend_is_zero_cents(spark):
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    df = spark.createDataFrame(
        [(1, t0, 1, "x", None), (2, t0, 2, "x", 3.5)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = rfm_segments(df, n_tiles=2).collect()
    # the all-NULL-spend user lands at 0 cents (m_score 2), never a
    # NULL whose sort order the two engines would pick differently
    by_m = {r.m_score: r for r in out}
    assert by_m[1].sum_cents == 350 and by_m[2].sum_cents == 0


def _overlap_reference(pairs):
    from collections import Counter

    by_g: dict[str, Counter] = {}
    for g, v in pairs:
        by_g.setdefault(g, Counter())[v] += 1
    out = {}
    for g, cg in by_g.items():
        ng = sum(cg.values())
        rest = Counter()
        for g2, c2 in by_g.items():
            if g2 != g:
                rest.update(c2)
        nr = sum(rest.values())
        num = sum(
            min(cg[v] * nr, rest.get(v, 0) * ng) for v in cg
        )
        out[g] = (ng, nr, num, round(num / (ng * nr), 6) if ng and nr else None)
    return out


def test_histogram_overlap_matches_reference(spark):
    from whatdropsnow_etl_spark.operators import histogram_overlap

    pairs = []
    for i in range(300):
        g = f"src{i % 3}"
        v = (i * 13) % 40 + (25 if g == "src2" else 0)
        pairs.append((g, v))
    df = spark.createDataFrame(pairs, "source string, n_chars long")
    ref = _overlap_reference(pairs)
    got = histogram_overlap(df, "source", "n_chars").collect()
    assert len(got) == 3
    for r in got:
        ng, nr, num, ov = ref[r.source]
        assert (r.n_group, r.n_rest) == (ng, nr)
        assert r.overlap_num == str(num)
        assert r.overlap == ov
    # the shifted group shares the least mass with the rest
    by_g = {r.source: r.overlap for r in got}
    assert by_g["src2"] < by_g["src0"] and by_g["src2"] < by_g["src1"]


def test_histogram_overlap_identical_and_disjoint(spark):
    from whatdropsnow_etl_spark.operators import histogram_overlap

    # identical distributions: overlap == 1 exactly (num == ng*nr)
    same = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(same, "source string, n_chars long")
    for r in histogram_overlap(df, "source", "n_chars").collect():
        assert r.overlap == 1.0 and r.overlap_num == "9"
    # disjoint supports: overlap == 0
    dis = [("a", 1), ("a", 2), ("b", 10), ("b", 11)]
    df2 = spark.createDataFrame(dis, "source string, n_chars long")
    for r in histogram_overlap(df2, "source", "n_chars").collect():
        assert r.overlap == 0.0 and r.overlap_num == "0"
    # single group: rest empty -> overlap NULL, never a divide crash
    one = spark.createDataFrame([("a", 1)], "source string, n_chars long")
    r = histogram_overlap(one, "source", "n_chars").collect()[0]
    assert r.overlap is None and r.n_rest == 0


def test_overlap_from_histogram_shares_ks_state(spark):
    # the ks_drift fold state feeds the overlap report directly
    from whatdropsnow_etl_spark.operators import (
        histogram_overlap,
        overlap_from_histogram,
    )
    from whatdropsnow_etl_spark.streaming import fold_value_histogram

    pairs = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 3)]
    df = spark.createDataFrame(pairs, "source string, n_chars long")
    state = fold_value_histogram(None, df, "source", "n_chars")
    got = sorted(
        [tuple(r) for r in overlap_from_histogram(
            state, "source", "n_chars").collect()],
        key=repr,
    )
    want = sorted(
        [tuple(r) for r in histogram_overlap(
            df, "source", "n_chars").collect()],
        key=repr,
    )
    assert got == want
