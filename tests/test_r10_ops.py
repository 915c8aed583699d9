"""Pins for the r10 additions: full k-core coreness decomposition,
the MMR first-greedy-step twin, streaming interevent maintenance,
and the NN-descent recall curve.

Each operator is checked against a hand-built case or an independent
pure-Python reference (never against its own oracle SQL — the driver
gate does that comparison separately).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _py_coreness(edges):
    """Independent brute-force coreness: peel min-degree nodes."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    k = 0
    while adj:
        peel = [n for n, nb in adj.items() if len(nb) <= k]
        if not peel:
            k += 1
            continue
        for n in peel:
            core[n] = k
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
    return core


def test_kcore_decompose_hand_graph(spark):
    from whatdropsnow_etl_spark.operators import (
        kcore_decompose,
        kcore_peel_pass,
    )

    # K4 on 1-4 (coreness 3), pendant chain 1-5-6 (coreness 1),
    # triangle 7-8-9 (coreness 2), isolated edge 10-11 (coreness 1);
    # duplicates and a self-loop exercise canonicalization.
    raw = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (1, 5), (5, 6),
        (7, 8), (8, 9), (7, 9),
        (10, 11), (11, 10), (2, 2),
    ]
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
    got = {r.node: r.coreness for r in kcore_decompose(pairs).collect()}
    want = _py_coreness(raw)
    assert got == want
    assert got == {
        1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1, 7: 2, 8: 2, 9: 2,
        10: 1, 11: 1,
    }
    # consistency with the single-pass oracle twin: iterating
    # kcore_peel_pass at k=2 to fixpoint keeps exactly the nodes
    # whose coreness is >= 2
    state = pairs
    for _ in range(4):
        keep = kcore_peel_pass(state, k=2).select("node")
        state = (
            state.join(
                keep.withColumnRenamed("node", "doc_a"), "doc_a", "left_semi"
            ).join(
                keep.withColumnRenamed("node", "doc_b"), "doc_b", "left_semi"
            )
        )
    surv = {
        r.node
        for r in state.select(
            F.explode(F.array("doc_a", "doc_b")).alias("node")
        )
        .distinct()
        .collect()
    }
    assert surv == {n for n, c in want.items() if c >= 2}


def test_mmr_select_pass_matches_mmr_diversify(spark):
    """The relational first-two-picks twin must agree with the
    rows-only greedy loop (same pool, same lam) on real embeddings:
    same ids at each rank and same 6dp scores."""
    from whatdropsnow_etl_spark.operators import (
        mmr_diversify,
        mmr_select_pass,
    )
    from whatdropsnow_etl_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    queries = emb.where(F.col("vec_id") < 10)
    full = {
        (r.query_id, r.mmr_rank): r
        for r in mmr_diversify(corpus, queries, k=2, pool=20).collect()
    }
    got = {
        (r.query_id, r.mmr_rank): r
        for r in mmr_select_pass(corpus, queries, pool=20).collect()
    }
    assert set(got) == set(full)
    for key, r in got.items():
        ref = full[key]
        assert r.neighbor_id == ref.neighbor_id, key
        # mmr_diversify scores from 6dp-pre-rounded relevance; the
        # pass from raw — agreement within ~one ulp of the 6dp
        # rounding (a boundary case lands at exactly 1.0000...e-6)
        assert abs(r.relevance - ref.relevance) <= 1.5e-6, key
        assert abs(r.mmr_score - ref.mmr_score) <= 1.5e-6, key


def test_mmr_select_pass_hand_vectors(spark):
    """Hand case where relevance order and MMR order differ: the
    two most relevant candidates are near-duplicates, so pick #2
    must skip to the diverse third candidate."""
    from whatdropsnow_etl_spark.operators import mmr_select_pass

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),       # rel 1.0 -> pick 1
            (11, [0.999, 0.01]),    # rel ~1.0 but sim(pick1) ~1.0
            (12, [0.5, 0.5]),       # lower rel, diverse
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r.mmr_rank: r
        for r in mmr_select_pass(corpus, queries, pool=3, lam=0.5).collect()
    }
    assert got[1].neighbor_id == 10
    # score(11) = .5*rel(11) - .5*sim(11,10) ~ .5*.99995 - .5*.99995 ~ 0
    # score(12) = .5*cos(45deg) - .5*cos(45deg)... sim(12,10)=cos45
    # rel(12)=cos45 -> 0 too; compute exactly instead of guessing:
    import math

    def cos(a, b):
        d = a[0] * b[0] + a[1] * b[1]
        return d / (math.sqrt(a[0] ** 2 + a[1] ** 2) * math.sqrt(b[0] ** 2 + b[1] ** 2))

    v = {10: [1.0, 0.0], 11: [0.999, 0.01], 12: [0.5, 0.5]}
    best = max(
        (0.5 * cos(v[i], [1.0, 0.0]) - 0.5 * cos(v[i], v[10]), -i)
        for i in (11, 12)
    )
    assert got[2].neighbor_id == -best[1]
    assert got[2].mmr_score == round(best[0], 6)


def test_nn_descent_recall_curve_monotone(spark):
    """Recall can only improve round over round (g_{p-1} is a subset
    of round p's candidates, so a truth hit is only ever displaced
    by another truth hit), and the NN-descent rounds must actually
    move the needle from the arbitrary ring seed."""
    from whatdropsnow_etl_spark.operators import nn_descent_recall_curve
    from whatdropsnow_etl_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = {
        r.round: r
        for r in nn_descent_recall_curve(
            emb, k=5, rounds=2, query_limit=20
        ).collect()
    }
    assert set(rows) == {0, 1, 2}
    n_q = rows[0].n_queries
    assert n_q == 20
    assert rows[0].n_hits <= rows[1].n_hits <= rows[2].n_hits
    assert rows[1].n_hits > rows[0].n_hits  # a round visibly improves
    for r in rows.values():
        assert r.recall == round(r.n_hits / (n_q * 5), 6)


def test_streaming_interevent_equals_batch_operator(spark):
    """Folding per-batch gap moments (segment monoid with one
    bridging gap per user per fold) over a 3-way TIME split and
    reporting through interevent_from_moments must equal the batch
    interevent_stats over the full relation EXACTLY — shared
    post-moments code path (the fano/auc/gini contract). The fold
    is applied in time order explicitly: unlike the histogram
    gauges, batch arrival order is part of this operator's
    streaming contract (per-user in-order delivery across batches)."""
    from whatdropsnow_etl_spark.operators import interevent_stats
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        batch_gap_moments,
        fold_gap_moments,
    )
    from whatdropsnow_etl_spark.streaming.interevent import (
        interevent_report,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts"
    )
    # tercile boundaries on ts: every event lands in exactly one
    # time-ordered batch, so per-user cross-batch order holds
    tl = ev.select(F.col("ts").cast("long").alias("t"))
    q1, q2 = tl.approxQuantile("t", [0.33, 0.66], 0.0)
    t = F.col("ts").cast("long")
    lo, mid, hi = (
        ev.where(t < q1),
        ev.where((t >= q1) & (t < q2)),
        ev.where(t >= q2),
    )
    assert lo.count() > 0 and mid.count() > 0 and hi.count() > 0
    state = None
    for batch in (lo, mid, hi):
        state = fold_gap_moments(state, batch_gap_moments(batch))
    got = sorted(
        [tuple(r) for r in interevent_report(state).collect()], key=repr
    )
    want = sorted(
        [tuple(r) for r in interevent_stats(ev).collect()], key=repr
    )
    assert got == want
    # state boundedness: one row per ever-seen user
    assert state.count() == ev.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id").distinct().count()


def test_streaming_interevent_bridge_hand_case(spark):
    """The bridging gap is exact: user 1's only gaps straddle the
    batch boundary; a single-event user carries zero moments until
    their second event arrives in a later batch."""
    from whatdropsnow_etl_spark.streaming import (
        batch_gap_moments,
        fold_gap_moments,
    )
    from whatdropsnow_etl_spark.streaming.interevent import (
        interevent_report,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, user_id long, ts timestamp"
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    b1 = mk([(1, 1, at(0)), (2, 1, at(10)), (3, 2, at(5))])
    b2 = mk([(4, 1, at(40)), (5, 2, at(5))])
    state = fold_gap_moments(None, batch_gap_moments(b1))
    state = fold_gap_moments(state, batch_gap_moments(b2))
    got = {r.user_id: r for r in interevent_report(state).collect()}
    # user 1: gaps 10s (in-batch) and 30s (bridge) in micros
    assert got[1].n_gaps == 2
    assert got[1].sum_dt_us == 40_000_000
    assert got[1].sumsq_dt == str(10_000_000**2 + 30_000_000**2)
    # user 2: two simultaneous events -> one zero gap, NULL cv/B
    assert got[2].n_gaps == 1 and got[2].sum_dt_us == 0
    assert got[2].cv is None and got[2].burstiness is None


def test_decode_gif_animation_and_truncation_gates():
    """ADVICE r9: a second frame preceded by a 0x21 graphic-control
    extension (the normal GIF89a animation layout) must hit the
    named animation gate instead of silently decoding frame 1, and
    a payload that ends without any image descriptor must raise a
    named ValueError instead of a raw struct.error."""
    import struct

    import pytest as _pytest

    from whatdropsnow_etl_spark.functions.media import (
        decode_gif,
        encode_gif87a,
    )

    base = encode_gif87a(3, 2, (10, 20, 30))
    packed = base[10]
    pal_len = (2 << (packed & 0x07)) * 3
    img = base[13 + pal_len : -1]  # 0x2C ... data ... 0x00
    assert img[0] == 0x2C and img[-1] == 0x00
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    animated = base[:-1] + gce + img + b"\x3b"
    with _pytest.raises(NotImplementedError, match="animated"):
        decode_gif(animated)
    # immediate second frame (no extension) still gates
    with _pytest.raises(NotImplementedError, match="animated"):
        decode_gif(base[:-1] + img + b"\x3b")
    # a trailing extension after the only frame is fine
    d = decode_gif(base[:-1] + gce + b"\x3b")
    assert (d["width"], d["height"]) == (3, 2)
    # header + screen descriptor, then nothing: named error
    headless = b"GIF87a" + struct.pack("<HHBBB", 3, 2, 0, 0, 0)
    with _pytest.raises(ValueError, match="without an image block"):
        decode_gif(headless)
    # trailer with no image: the pre-existing named error holds
    with _pytest.raises(ValueError, match="trailer before"):
        decode_gif(headless + b"\x3b")


def test_neighborhood_jaccard_hand_graph(spark):
    """Triangle 1-2-3 plus pendant 4 on 1: known common-neighbor
    counts, degrees and Jaccard scores; the (2,3) edge and the
    (2,4)/(3,4) non-edges are both candidates."""
    from whatdropsnow_etl_spark.operators import neighborhood_jaccard

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    got = {
        (r.node_a, r.node_b): r
        for r in neighborhood_jaccard(pairs).collect()
    }
    # N(1)={2,3,4} N(2)={1,3} N(3)={1,2} N(4)={1}
    # pairs sharing a neighbor: (2,3) via 1 [edge], (2,4) via 1,
    # (3,4) via 1, (1,2) via 3, (1,3) via 2
    assert set(got) == {(2, 3), (2, 4), (3, 4), (1, 2), (1, 3)}
    e23 = got[(2, 3)]
    assert (e23.n_common, e23.deg_a, e23.deg_b, e23.is_edge) == (1, 2, 2, 1)
    assert e23.jaccard == round(1 / 3, 6)  # {1} over {1,2,3}
    e24 = got[(2, 4)]
    assert (e24.n_common, e24.is_edge) == (1, 0)
    assert e24.jaccard == 0.5  # {1} over {1,3}
    e12 = got[(1, 2)]
    assert (e12.n_common, e12.deg_a, e12.deg_b, e12.is_edge) == (1, 3, 2, 1)
    assert e12.jaccard == 0.25  # {3} over {2,3,4,1}


def test_neighborhood_jaccard_hub_cap(spark):
    """max_center_degree excludes hot hubs from acting as wedge
    CENTERS (their edges still count toward degrees/is_edge): the
    star's leaf pairs vanish, pairs through low-degree centers
    survive with identical scores."""
    from whatdropsnow_etl_spark.operators import neighborhood_jaccard

    # star around hub 1 (deg 4) + a path 2-10-3 (center 10 deg 2)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 10), (10, 3)],
        "doc_a long, doc_b long",
    )
    full = {
        (r.node_a, r.node_b): r
        for r in neighborhood_jaccard(pairs).collect()
    }
    capped = {
        (r.node_a, r.node_b): r
        for r in neighborhood_jaccard(
            pairs, max_center_degree=3
        ).collect()
    }
    # (2,3) reachable via BOTH hub 1 and center 10: survives the cap
    # with n_common reduced from 2 to 1
    assert full[(2, 3)].n_common == 2
    assert capped[(2, 3)].n_common == 1
    # degrees and is_edge are cap-independent: deg(2) = |{1, 10}|
    assert capped[(2, 3)].deg_a == full[(2, 3)].deg_a == 2
    # hub-only pairs (4,5), (2,4)... drop entirely under the cap
    assert (4, 5) in full and (4, 5) not in capped
    # pairs through the surviving center keep exact arithmetic:
    # (2,3) jaccard under cap = 1 / (2 + 2 - 1)
    assert capped[(2, 3)].jaccard == round(1 / 3, 6)
    assert full[(2, 3)].jaccard == 1.0  # {1,10} over {1,10}


def test_weekly_seasonality_hand_timestamps(spark):
    """2024-01-01 was a MONDAY (dow 1 in the 0=Sunday convention);
    cells, shares and lifts are exact."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import weekly_seasonality

    rows = [
        # three clicks Monday 08:xx UTC, one click Sunday 23:59
        (1, "click", dt.datetime(2024, 1, 1, 8, 0, 0)),
        (2, "click", dt.datetime(2024, 1, 1, 8, 30, 0)),
        (3, "click", dt.datetime(2024, 1, 8, 8, 59, 59)),
        (4, "click", dt.datetime(2024, 1, 7, 23, 59, 59)),
        (5, "view", dt.datetime(2024, 1, 3, 0, 0, 0)),  # Wednesday
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {
        (r.event_type, r.dow, r.hour): r
        for r in weekly_seasonality(df).collect()
    }
    assert set(got) == {("click", 1, 8), ("click", 0, 23), ("view", 3, 0)}
    mon = got[("click", 1, 8)]
    assert (mon.n_events, mon.n_type) == (3, 4)
    assert mon.share == 0.75 and mon.lift == round(3 * 168 / 4, 6)
    assert got[("view", 3, 0)].share == 1.0


def test_token_budget_curve_hand_case(spark):
    """Cumulative counts/weights accumulate from the TOP bin down;
    out-of-range scores clamp into the edge bins."""
    from whatdropsnow_etl_spark.operators import token_budget_curve

    rows = [
        (0.95, 100), (0.92, 50),   # bin 9
        (0.55, 30),                # bin 5
        (0.05, 20), (-0.1, 10),    # bin 0 (clamped)
        (1.2, 40),                 # bin 9 (clamped)
    ]
    df = spark.createDataFrame(rows, "score double, w long")
    got = {r.bin: r for r in token_budget_curve(df, "score", "w").collect()}
    assert set(got) == {0, 5, 9}
    assert (got[9].n_rows, got[9].sum_w) == (3, 190)
    assert (got[9].cum_rows, got[9].cum_w) == (3, 190)
    assert (got[5].cum_rows, got[5].cum_w) == (4, 220)
    assert (got[0].cum_rows, got[0].cum_w) == (6, 250)
    assert got[5].cum_w_share == round(220 / 250, 6)


def test_streaming_overlap_report_equals_batch(spark):
    """The overlap gauge reads the SAME folded histogram state as
    the KS gauge: a 3-way fold reported through overlap_report must
    equal histogram_overlap over the full static relation exactly."""
    from whatdropsnow_etl_spark.operators import histogram_overlap
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        fold_value_histogram,
        overlap_report,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "n_chars"
    )
    state = None
    for part in range(3):
        b = docs.where(F.col("doc_id") % 3 == part)
        state = fold_value_histogram(state, b, "source", "n_chars")
    got = sorted(
        [tuple(r) for r in overlap_report(state, "source", "n_chars").collect()],
        key=repr,
    )
    want = sorted(
        [
            tuple(r)
            for r in histogram_overlap(docs, "source", "n_chars").collect()
        ],
        key=repr,
    )
    assert got == want


def test_animated_gif_codec_round_trip():
    """encode_gif89a_frames -> decode_gif_frames is bit-exact per
    frame (shared global palette, real LZW, GCE per frame); the
    single-image decode_gif gates on the same payload; the frame
    decoder reads plain GIF87a single images too and raises the
    named gates on transparency and missing frames."""
    import numpy as np
    import pytest as _pytest

    from whatdropsnow_etl_spark.functions.media import (
        decode_gif,
        decode_gif_frames,
        encode_gif87a,
        encode_gif89a_frames,
    )

    rng = np.random.RandomState(3)
    frames = [
        (rng.randint(0, 4, size=(5, 7, 1)).repeat(3, axis=2) * 60).astype(
            np.uint8
        )
        for _ in range(3)
    ]
    p = encode_gif89a_frames(7, 5, frames)
    d = decode_gif_frames(p)
    assert (d["n_frames"], d["width"], d["height"]) == (3, 7, 5)
    for f, g in zip(frames, d["frames"]):
        assert (f == g).all()
    assert d["sum_g"] == sum(
        int(f[:, :, 1].astype(np.int64).sum()) for f in frames
    )
    with _pytest.raises(NotImplementedError, match="animated"):
        decode_gif(p)
    # solid-tuple frames; single-frame 87a reads through the same path
    d2 = decode_gif_frames(encode_gif89a_frames(3, 2, [(10, 0, 0), (40, 0, 0)]))
    assert d2["n_frames"] == 2 and d2["sum_r"] == 6 * 10 + 6 * 40
    d3 = decode_gif_frames(encode_gif87a(4, 3, (1, 2, 3)))
    assert d3["n_frames"] == 1 and d3["sum_b"] == 12 * 3
    # transparency flag is a named gate: set bit 0 of the GCE packed
    # byte in the first frame's extension
    gce_at = p.index(b"\x21\xf9\x04")
    tampered = bytearray(p)
    tampered[gce_at + 3] |= 0x01
    with _pytest.raises(NotImplementedError, match="transparency"):
        decode_gif_frames(bytes(tampered))
    # >256 distinct colors across frames gates at encode
    big = rng.randint(0, 256, (20, 20, 3)).astype(np.uint8)
    with _pytest.raises(NotImplementedError, match="palette"):
        encode_gif89a_frames(20, 20, [big, 255 - big])


def test_streaming_seasonality_equals_batch(spark):
    """Folding per-batch (type, dow, hour) cells (a true commutative
    monoid — cell assignment is batch-independent integer epoch
    arithmetic) and reporting through seasonality_from_cells must
    equal weekly_seasonality over the full relation exactly."""
    from whatdropsnow_etl_spark.operators import weekly_seasonality
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        fold_seasonality_cells,
        seasonality_report,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "ts"
    )
    state = None
    # arbitrary (non-time) split order — the fold must not care
    for part in (2, 0, 1):
        state = fold_seasonality_cells(
            state, ev.where(F.col("event_id") % 3 == part)
        )
    got = sorted(
        [tuple(r) for r in seasonality_report(state).collect()], key=repr
    )
    want = sorted(
        [tuple(r) for r in weekly_seasonality(ev).collect()], key=repr
    )
    assert got == want
    # state is bounded by types x 168
    n_types = ev.select("event_type").distinct().count()
    assert state.count() <= n_types * 168


def test_streaming_budget_curve_equals_batch(spark):
    """Folding per-batch (bin, n_rows, sum_w) histograms (a true
    commutative monoid) and reporting through budget_curve_from_bins
    must equal token_budget_curve over the full static relation
    exactly — shared post-histogram code path."""
    from whatdropsnow_etl_spark.operators import (
        quality_score,
        token_budget_curve,
    )
    from whatdropsnow_etl_spark.sources import load_table
    from whatdropsnow_etl_spark.streaming import (
        budget_report,
        fold_score_bins,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    q = quality_score(docs).select("doc_id", "quality", "n_tokens")
    state = None
    for part in (1, 2, 0):
        state = fold_score_bins(
            state, q.where(F.col("doc_id") % 3 == part), "quality",
            "n_tokens",
        )
    got = sorted(
        [tuple(r) for r in budget_report(state).collect()], key=repr
    )
    want = sorted(
        [
            tuple(r)
            for r in token_budget_curve(q, "quality", "n_tokens").collect()
        ],
        key=repr,
    )
    assert got == want
    assert state.count() <= 10


def test_ppm_codec_round_trip():
    """r10 P6 PPM: encode -> decode is bit-exact, header comments
    skip per the netpbm spec, resize round-trips as a valid PPM, and
    P3 / non-255 maxval / truncation raise named gates."""
    import numpy as np
    import pytest as _pytest

    from whatdropsnow_etl_spark.functions.media import (
        decode_ppm,
        encode_ppm,
        resize_ppm_nearest,
    )

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    d = decode_ppm(encode_ppm(7, 5, pixels=px))
    assert (d["px"] == px).all()
    assert d["sum_g"] == int(px[:, :, 1].astype(np.int64).sum())
    # comment lines anywhere in the header token stream
    raw = encode_ppm(3, 2, (10, 20, 30))
    commented = raw[:3] + b"# a comment\n# another\n" + raw[3:]
    d2 = decode_ppm(commented)
    assert (d2["width"], d2["height"], d2["sum_b"]) == (3, 2, 6 * 30)
    # resize round-trip stays a valid PPM with exact gather sums
    r = decode_ppm(resize_ppm_nearest(raw, 6, 4))
    assert (r["width"], r["height"], r["sum_r"]) == (6, 4, 24 * 10)
    with _pytest.raises(NotImplementedError, match="P3"):
        decode_ppm(b"P3\n1 1\n255\n1 2 3")
    with _pytest.raises(NotImplementedError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")


def test_media_probe_quarantine_mode(spark):
    """on_error='quarantine': corrupt blobs become rows with NULL
    metrics and a rendered error instead of killing the job; clean
    rows match the strict mode exactly; default mode still raises."""
    import pytest as _pytest

    from whatdropsnow_etl_spark.functions.media import encode_bmp24
    from whatdropsnow_etl_spark.operators import media_probe

    good = encode_bmp24(3, 2, (10, 20, 30))
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"\x00\x01garbage")),        # unknown magic
        (3, bytearray(b"P6\n4 4\n255\n\x00")),     # truncated PPM
        (4, bytearray(b"P6\n1 1\n65535\n" + b"\x00" * 6)),  # gated maxval
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in media_probe(media, on_error="quarantine").collect()}
    assert got[1].error is None and got[1].format == "bmp"
    assert got[1].sum_rgb == 6 * (10 + 20 + 30)
    assert got[2].format is None and "unknown media magic" in got[2].error
    assert "truncated" in got[3].error
    assert got[4].error.startswith("NotImplementedError")
    # strict mode still raises on the same relation
    with _pytest.raises(Exception):
        media_probe(media).collect()
    with _pytest.raises(ValueError, match="on_error"):
        media_probe(media, on_error="skip")


def test_kcore_decompose_empty_and_selfloops(spark):
    from whatdropsnow_etl_spark.operators import kcore_decompose

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert kcore_decompose(empty).count() == 0
    only_self = spark.createDataFrame(
        [(1, 1), (2, 2)], "doc_a long, doc_b long"
    )
    assert kcore_decompose(only_self).count() == 0
