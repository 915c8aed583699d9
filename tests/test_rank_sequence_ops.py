"""Tests for the sample-sort percentile rank, the recsys user-
history sequence builder, and the quarantining CSV loader.

Pin points:
- percentile_rank's sample-partitioned decomposition equals the
  naive single-window PERCENT_RANK exactly, including boundary ties
  and single-row groups;
- user_event_sequences keeps the last-N window but emits it oldest-
  first, deterministically under (ts, id) ties;
- read_csv_quarantine routes every raw line to exactly one side.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whatdropsnow_etl_spark.operators import (
    percentile_rank,
    user_event_sequences,
)


def test_percentile_rank_matches_naive_window(spark):
    # values with heavy boundary ties and a skewed distribution
    rows = [(i, f"s{i % 3}", float((i * 7) % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    got = {
        (r.doc_id): r.pct_rank
        for r in percentile_rank(
            df, "v", group_col="source", n_buckets=8, sample_k=64
        ).collect()
    }
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    naive = {
        r.doc_id: r.pr
        for r in df.select(
            "doc_id", F.percent_rank().over(w).alias("pr")
        ).collect()
    }
    assert got == naive  # bit-equal, not just close


def test_percentile_rank_global_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "doc_id long, v double"
    )
    # all-equal values: ranks fall back to the id tiebreak
    out = sorted(
        percentile_rank(df, "v", n_buckets=4, sample_k=8).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.pct_rank for r in out] == [0.0, 0.5, 1.0]
    # single row emits 0.0, not a division by zero
    one = percentile_rank(
        df.where("doc_id = 1"), "v", n_buckets=4, sample_k=8
    ).collect()
    assert [r.pct_rank for r in one] == [0.0]


def test_user_event_sequences_truncates_and_orders(spark):
    rows = [
        # user 1: 4 events, max_len=3 keeps the LAST 3, oldest first
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "c"),
        (4, 1, "2024-01-01 00:03:00", "d"),
        # user 2: ts tie broken by event_id
        (6, 2, "2024-01-01 00:00:00", "y"),
        (5, 2, "2024-01-01 00:00:00", "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.user_id: r for r in user_event_sequences(df, max_len=3).collect()}
    assert out[1].seq == "b c d" and out[1].n_events == 3
    assert out[2].seq == "x y" and out[2].n_events == 2


def test_read_csv_quarantine_splits(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,price\n"
        "1,10.5\n"
        "2,not_a_number\n"
        "3,7.25\n"
    )
    from whatdropsnow_etl_spark.sources.files import read_csv_quarantine

    good, bad = read_csv_quarantine(
        spark, str(p), "id bigint, price double"
    )
    g = {r.id: r.price for r in good.collect()}
    assert set(g) == {1, 3}
    assert math.isclose(g[3], 7.25)
    b = [r._corrupt_record for r in bad.collect()]
    assert b == ["2,not_a_number"]


def test_distribution_shift_detects_shift(spark):
    from whatdropsnow_etl_spark.operators import distribution_shift_report

    old = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(500)], "doc_id long, v double"
    )
    # new: same shape but shifted +60 — mass must pile into top bins
    new = spark.createDataFrame(
        [(i, float(i % 100 + 60)) for i in range(500)],
        "doc_id long, v double",
    )
    out = {
        r.bin: r
        for r in distribution_shift_report(
            old, new, "v", "doc_id", n_bins=5
        ).collect()
    }
    assert len(out) == 5
    assert abs(sum(r.share_old for r in out.values()) - 1.0) < 1e-12
    assert abs(sum(r.share_new for r in out.values()) - 1.0) < 1e-12
    # identical snapshots: zero delta everywhere
    same = distribution_shift_report(old, old, "v", "doc_id", n_bins=5)
    assert all(r.share_delta == 0.0 for r in same.collect())
    # shifted: the top bin gains share
    assert out[4].share_new > out[4].share_old


def test_benford_on_benford_and_uniform(spark):
    import math

    from whatdropsnow_etl_spark.operators import benford_check

    # log-uniform magnitudes over WHOLE decades follow Benford
    # (a fractional last decade over-weights low digits)
    vals = [10 ** (i / 2000) for i in range(6000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in benford_check(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    for d in range(1, 10):
        assert abs(out[d].share - math.log10(1 + 1 / d)) < 0.02
        assert abs(out[d].delta) < 0.02
    # uniform [1, 2) is ALL first-digit 1 (scaled to cents: 100-199)
    uni = spark.createDataFrame(
        [(1.0 + i / 2000,) for i in range(1000)], "v double"
    )
    uo = {r.digit: r for r in benford_check(uni, "v").collect()}
    assert set(uo) == {1} and uo[1].share == 1.0
    assert uo[1].delta > 0.6  # wildly non-Benford, as it should flag


def test_hybrid_search_rrf_fusion(spark):
    """RRF must credit docs on both lists with both terms, docs on
    one list with one, and rank strictly by the fused score when one
    doc dominates both lists."""
    from whatdropsnow_etl_spark.operators import hybrid_search

    docs = spark.createDataFrame(
        [
            (0, "dup key window dup key"),  # strong lexical hit
            (1, "key filter other words"),  # weak lexical hit
            (2, "nothing relevant here"),  # no lexical hit
            (3, "window case alone stands"),
        ],
        "doc_id long, text string",
    )
    # embeddings: vec 0 is the query; 1 and 2 close, 3 orthogonal
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.8, 0.3]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.doc_id: r
        for r in hybrid_search(
            docs, emb, terms=("dup", "key", "window"), k_each=3
        ).collect()
    }
    # doc 0: lexical rank 1, in vector top-3? vec ranks: 1, 2, 3 for
    # docs 1,2,3 (query vec 0 excluded from corpus)
    assert out[0].lex_rank == 1 and out[0].vec_rank is None
    assert out[1].vec_rank == 1 and out[1].lex_rank is not None
    assert out[2].vec_rank == 2 and out[2].lex_rank is None
    # doc 1 is on BOTH lists -> two rrf terms
    r1 = out[1]
    assert abs(
        r1.rrf - (1.0 / (60 + r1.lex_rank) + 1.0 / 61)
    ) < 1e-15
    # single-list docs carry exactly one term
    assert abs(out[0].rrf - 1.0 / 61) < 1e-15
    assert abs(out[2].rrf - 1.0 / 62) < 1e-15


def test_wav_resample_sine_roundtrip(spark):
    """Resampling must preserve signal content, not just metadata: a
    real sine upsampled 2x keeps its frequency (zero-crossing count
    doubles-in-samples but stays fixed per second) and linear
    interpolation stays within the int16 rounding envelope."""
    import numpy as np

    from whatdropsnow_etl_spark.functions.media import (
        decode_wav16,
        encode_wav16,
        resample_wav16,
    )

    rate, secs, freq = 8000, 1, 50
    t = np.arange(rate * secs) / rate
    sine = np.rint(10000 * np.sin(2 * np.pi * freq * t)).astype(np.int64)
    wav = encode_wav16(rate, sine)
    up = resample_wav16(wav, 16000)
    d = decode_wav16(up)
    assert d["sample_rate"] == 16000
    assert d["n_samples"] == (rate * secs - 1) * 2 + 1
    out = np.frombuffer(up[-2 * d["n_samples"]:], dtype="<i2")
    # zero crossings per second unchanged => frequency preserved
    zc = int(((out[:-1] < 0) & (out[1:] >= 0)).sum())
    assert abs(zc - freq) <= 1
    # every interpolated value within the true sine +- quantization
    t2 = np.arange(d["n_samples"]) / 16000
    true = 10000 * np.sin(2 * np.pi * freq * t2)
    assert np.abs(out - true).max() < 25  # interp + rounding envelope
    # identity resample: bytes decode to the identical signal
    same = decode_wav16(resample_wav16(wav, 8000))
    assert same["n_samples"] == rate * secs
    assert same["energy"] == int((sine * sine).sum())


def test_media_resample_operator_formula(spark):
    from whatdropsnow_etl_spark.operators import (
        attach_media_payload,
        media_resample,
    )

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    out = {
        r.doc_id: r
        for r in media_resample(
            attach_media_payload(docs), out_rate=16000
        ).collect()
    }
    # only odd ids are WAVs
    assert set(out) == {i for i in range(20) if i % 2 == 1}
    for did, r in out.items():
        rate = 8000 + (did % 3) * 4000
        n = 50 + did % 100
        amp = 100 + did % 1000
        # r8 WAV classes: per-class sum of channel amp^2; r9 carves
        # id % 16 == 9 out as float32 (quantized to 32k exactly)
        if did % 16 == 9:
            ampsq = (32 * (100 + did % 900)) ** 2
        elif did % 8 == 1:
            ampsq = amp * amp
        elif did % 8 == 3:
            ampsq = amp * amp + (amp + 7) * (amp + 7)
        elif did % 8 == 5:
            ampsq = (1 + did % 120) ** 2
        else:
            a24 = amp * 250
            ampsq = a24 * a24 + (a24 + 1000) * (a24 + 1000)
        n_out = (n - 1) * 16000 // rate + 1
        assert (r.src_rate, r.n_src) == (rate, n)
        assert (r.out_rate, r.n_out) == (16000, n_out)
        assert r.energy_out == n_out * ampsq, did


def test_media_silence_vad_runs(spark):
    """VAD must find the active runs a cutter would keep: silence -
    tone - silence - tone yields two runs with the longer one
    reported, framed on the documented hop grid."""
    import numpy as np

    from whatdropsnow_etl_spark.functions.media import encode_wav16
    from whatdropsnow_etl_spark.operators import media_silence_report

    sig = np.concatenate(
        [
            np.zeros(160, dtype=np.int64),  # silence
            np.full(320, 5000, dtype=np.int64),  # tone: ~19 frames
            np.zeros(160, dtype=np.int64),
            np.full(96, 5000, dtype=np.int64),  # short tone
        ]
    )
    wav = encode_wav16(8000, sig)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    [r] = media_silence_report(df, frame=32, hop=16, threshold=50).collect()
    n = sig.size
    assert r.n_frames == (n - 32) // 16 + 1
    # active frames exist, but not all frames are active
    assert 0 < r.n_active < r.n_frames
    # the long tone dominates the max run; it spans ~320/16 frames
    assert 17 <= r.max_run <= 21
    # all-silence: nothing active
    quiet = encode_wav16(8000, np.zeros(400, dtype=np.int64))
    qdf = spark.createDataFrame(
        [(2, bytearray(quiet))], "doc_id long, payload binary"
    )
    [q] = media_silence_report(qdf).collect()
    assert q.n_active == 0 and q.max_run == 0


def test_group_topk_matches_plain_window(spark):
    """The salted two-phase cut is bit-identical to the naive
    single-window top-k for any order, including heavy score ties."""
    rows = [
        (i, f"g{i % 2}", float((i * 13) % 7)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    from whatdropsnow_etl_spark.operators import group_topk

    got = {
        (r.doc_id, r.rank_in_group)
        for r in group_topk(
            df, ["g"], [F.col("v").desc(), F.col("doc_id").asc()], 7, "doc_id"
        ).collect()
    }
    naive = {
        (r.doc_id, r.rn)
        for r in df.select(
            "doc_id",
            F.row_number()
            .over(
                Window.partitionBy("g").orderBy(
                    F.col("v").desc(), F.col("doc_id").asc()
                )
            )
            .cast("bigint")
            .alias("rn"),
        )
        .where(F.col("rn") <= 7)
        .collect()
    }
    assert got == naive


def test_active_learning_picks_boundary_scores(spark):
    from whatdropsnow_etl_spark.operators import active_learning_batch

    rows = [
        (1, "a", 0.51),  # closest to the boundary
        (2, "a", 0.95),
        (3, "a", 0.45),
        (4, "a", 0.02),
        (5, "b", 0.99),
        (6, "b", 0.52),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {
        (r.source, r.rank_in_group): r.doc_id
        for r in active_learning_batch(df, k_per_group=2).collect()
    }
    assert out[("a", 1)] == 1  # |0.51-0.5| = 0.01
    assert out[("a", 2)] == 3  # |0.45-0.5| = 0.05
    assert out[("b", 1)] == 6
    assert out[("b", 2)] == 5
    assert len(out) == 4


def _ks_reference(pairs):
    """Pure-python per-group two-sample KS vs rest: returns
    {group: (n_g, n_r, d_num, at_value)} from (group, value) pairs."""
    from collections import Counter

    by_g = Counter(pairs)
    groups = sorted({g for g, _ in pairs})
    values = sorted({v for _, v in pairs})
    out = {}
    for g in groups:
        n_g = sum(c for (gg, _), c in by_g.items() if gg == g)
        n_r = len(pairs) - n_g
        cum_g = cum_r = 0
        best = (-1, None)
        for v in values:
            cum_g += by_g.get((g, v), 0)
            cum_r += sum(
                c for (gg, vv), c in by_g.items() if gg != g and vv == v
            )
            gap = abs(cum_g * n_r - cum_r * n_g)
            if gap > best[0]:
                best = (gap, v)
        out[g] = (n_g, n_r, best[0], best[1])
    return out


def test_ks_two_sample_matches_reference(spark):
    from whatdropsnow_etl_spark.operators import ks_two_sample

    # deterministic skewed data: src2's values shifted up
    pairs = []
    for i in range(300):
        g = f"src{i % 3}"
        v = (i * 13) % 40 + (25 if g == "src2" else 0)
        pairs.append((g, v))
    df = spark.createDataFrame(pairs, "source string, n_chars long")
    ref = _ks_reference(pairs)
    got = ks_two_sample(df, "source", "n_chars").collect()
    assert len(got) == 3
    for r in got:
        n_g, n_r, d_num, at_v = ref[r.source]
        assert (r.n_group, r.n_rest) == (n_g, n_r)
        assert r.d_num == str(d_num)
        assert r.at_value == at_v
        assert r.d == round(d_num / (n_g * n_r), 6)
    # the shifted group must dominate the statistic
    d_by_g = {r.source: float(r.d) for r in got}
    assert d_by_g["src2"] > d_by_g["src0"]
    assert d_by_g["src2"] > d_by_g["src1"]


def test_ks_two_sample_identical_and_disjoint(spark):
    from whatdropsnow_etl_spark.operators import ks_two_sample

    # identical distributions: D == 0 at the smallest value
    same = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(same, "source string, n_chars long")
    for r in ks_two_sample(df, "source", "n_chars").collect():
        assert r.d_num == "0" and r.d == 0.0 and r.at_value == 1
    # disjoint supports: D == 1, attained at the low group's max
    dis = [("a", 1), ("a", 2), ("b", 10), ("b", 11)]
    df2 = spark.createDataFrame(dis, "source string, n_chars long")
    got = {r.source: r for r in ks_two_sample(df2, "source", "n_chars").collect()}
    assert got["a"].d == 1.0 and got["a"].at_value == 2
    assert got["b"].d == 1.0 and got["b"].at_value == 2
    # null group / null value rows are excluded, not crashed on
    withnull = dis + [(None, 5), ("a", None)]
    df3 = spark.createDataFrame(withnull, "source string, n_chars long")
    got3 = {r.source: r for r in ks_two_sample(df3, "source", "n_chars").collect()}
    assert set(got3) == {"a", "b"}
    assert got3["a"].n_group == 2 and got3["a"].n_rest == 2


def _exact_knn(vecs, k):
    """Brute-force cosine kNN: {i: [ids ranked by (cos desc, id)]}."""
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return num / (na * nb)

    out = {}
    for i, vi in vecs.items():
        scored = sorted(
            ((cos(vi, vj), -j) for j, vj in vecs.items() if j != i),
            reverse=True,
        )
        out[i] = [-nj for _, nj in scored[:k]]
    return out


def test_nn_descent_converges_to_exact_knn(spark):
    from whatdropsnow_etl_spark.operators import (
        nn_descent_pass,
        ring_seed_graph,
    )

    # 40 unit vectors at golden-angle spacing: well-spread, and the
    # ring seed (adjacent IDS) starts far from the angular truth
    ga = math.pi * (3 - math.sqrt(5))
    vecs = {
        i: [math.cos(i * ga % (2 * math.pi)), math.sin(i * ga % (2 * math.pi))]
        for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: recompute the truth on the rounded values
    stored = {r.vec_id: list(r.embedding) for r in df.collect()}
    truth = _exact_knn(stored, 3)

    def neighbors(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id))
        return {q: [n for _, n in sorted(v)] for q, v in got.items()}

    def recall(nbrs):
        hit = sum(
            len(set(nbrs.get(q, [])) & set(t)) for q, t in truth.items()
        )
        return hit / sum(len(t) for t in truth.values())

    g = ring_seed_graph(df, k=3)
    seed_nbrs = {}
    for r in g.collect():
        seed_nbrs.setdefault(r.query_id, []).append(r.neighbor_id)
    r_prev = recall(seed_nbrs)
    assert r_prev < 0.2  # the ring seed must start badly wrong
    rows = None
    for _ in range(6):
        rows = nn_descent_pass(df, g, k=3).collect()
        r_now = recall(neighbors(rows))
        assert r_now >= r_prev  # a pass never loses recall here
        r_prev = r_now
        if r_now == 1.0:
            break
        # materialize per round (the iteration contract: the pass
        # embeds three copies of the input plan, so lineage grows
        # 4^p when chained lazily — checkpoint between rounds)
        g = spark.createDataFrame(
            [(r.query_id, r.neighbor_id) for r in rows],
            "query_id long, neighbor_id long",
        )
    assert r_prev == 1.0, f"did not converge: recall={r_prev}"
    assert neighbors(rows) == truth  # exact ranked sets, not just recall
    # shape contract: no self loops, rnk dense from 1
    for r in rows:
        assert r.query_id != r.neighbor_id and 1 <= r.rnk <= 3


def test_nn_descent_sampling_escapes_local_fixpoint(spark):
    """r9 (r8 verdict ask #7): on an adversarial layout — two tight
    clusters seeded with two DISJOINT parity rings, so the pure
    neighborhood expansion never crosses the component boundary —
    the deterministic variant stalls at a local fixpoint with
    recall < 1, while deterministic ρ-sampling (id-hash exploration
    candidates, fresh salt per round) converges to exact kNN."""
    from whatdropsnow_etl_spark.operators import nn_descent_pass

    # ids 0..9; cluster A = ids 0..4 near (1, 0), cluster B = ids
    # 5..9 near (0, 1): each id's true 2-NN live in its own cluster
    vecs = {}
    for i in range(5):
        vecs[i] = [1.0, 0.01 * i]
        vecs[5 + i] = [0.01 * i, 1.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    truth = _exact_knn(vecs, 2)

    def neighbors(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id))
        return {q: [n for _, n in sorted(v)] for q, v in got.items()}

    def recall(nbrs):
        hit = sum(
            len(set(nbrs.get(q, [])) & set(t)) for q, t in truth.items()
        )
        return hit / sum(len(t) for t in truth.values())

    # adversarial seed: two disjoint rings over the id PARITIES —
    # every even id's neighborhood (edges, reversal, 2-hop) stays
    # even forever, but almost every true neighbor differs in parity
    # only by coincidence of the layout above (clusters are id
    # ranges, rings are parities, so each ring spans both clusters
    # yet the candidate pool of node 0 never includes odd ids 1/3)
    evens, odds = [0, 2, 4, 6, 8], [1, 3, 5, 7, 9]
    seed = [
        (ring[i], ring[(i + d) % 5])
        for ring in (evens, odds)
        for i in range(5)
        for d in (1, 2)
    ]
    g0 = spark.createDataFrame(seed, "query_id long, neighbor_id long")

    def run(rounds, rho):
        g, rows = g0, None
        for rnd in range(rounds):
            rows = nn_descent_pass(
                df, g, k=2, sample_rho=rho, sample_salt=rnd
            ).collect()
            g = spark.createDataFrame(
                [(r.query_id, r.neighbor_id) for r in rows],
                "query_id long, neighbor_id long",
            )
        return rows

    det = neighbors(run(4, rho=0.0))
    assert recall(det) < 1.0  # stalled: parity components never mix
    # and it IS a fixpoint: one more deterministic round changes nothing
    g_det = spark.createDataFrame(
        [(q, n) for q, ns in det.items() for n in ns],
        "query_id long, neighbor_id long",
    )
    again = neighbors(nn_descent_pass(df, g_det, k=2).collect())
    assert again == det
    sampled = neighbors(run(4, rho=2.0))
    assert recall(sampled) == 1.0
    assert sampled == truth


def test_signed_floor_log2_ratio_exact(spark):
    from whatdropsnow_etl_spark.operators.corpus import (
        signed_floor_log2_ratio,
    )
    from fractions import Fraction

    pairs = [
        (a, b)
        for a in [1, 2, 3, 4, 5, 7, 8, 9, 63, 64, 65, 10**12, 10**12 + 1]
        for b in [1, 2, 3, 5, 8, 16, 63, 64, 127, 128, 10**12]
    ]
    df = spark.createDataFrame(pairs, "num long, den long")
    out = df.select(
        "num",
        "den",
        signed_floor_log2_ratio(F.col("num"), F.col("den")).alias("bits"),
    ).collect()

    def exact_floor_log2(fr):
        # integer-only floor(log2(fraction)): compare against 2^e
        e = fr.numerator.bit_length() - fr.denominator.bit_length()
        if fr < Fraction(2) ** e:
            e -= 1
        assert Fraction(2) ** e <= fr < Fraction(2) ** (e + 1)
        return e

    for r in out:
        assert r.bits == exact_floor_log2(Fraction(r.num, r.den)), (
            r.num,
            r.den,
            r.bits,
        )


def test_dsir_weights_prefers_target_like_docs(spark):
    from whatdropsnow_etl_spark.operators import dsir_weights

    # target vocabulary: medical-ish; pool: half target-like,
    # half boilerplate-like, plus the target docs themselves
    tgt_words = "dose trial cohort serum assay"
    web_words = "click here buy now free"
    rows = []
    for i in range(20):
        rows.append((i, tgt_words if i % 2 == 0 else web_words, "pool"))
    pool = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = pool.where("doc_id % 2 = 0")
    got = dsir_weights(pool, target, n_buckets=64, k=20).collect()
    by_rank = [r.doc_id for r in sorted(got, key=lambda r: r.rank)]
    # every target-like doc outranks every boilerplate doc
    assert all(d % 2 == 0 for d in by_rank[:10])
    assert all(d % 2 == 1 for d in by_rank[10:])
    # scores constant within each class, ranks tie-broken by id
    scores = {r.doc_id: r.score_bits for r in got}
    assert len({scores[d] for d in by_rank[:10]}) == 1
    assert len({scores[d] for d in by_rank[10:]}) == 1
    assert scores[by_rank[0]] > scores[by_rank[-1]]
    assert by_rank[:10] == sorted(by_rank[:10])
    # reference recomputation of the whole-bit formula in python
    import hashlib
    from collections import Counter

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    def fl2(num, den):
        e = num.bit_length() - den.bit_length()
        if den << max(e, 0) > num << max(-e, 0):
            e -= 1
        return e

    pool_toks = {i: (tgt_words if i % 2 == 0 else web_words).split() for i in range(20)}
    c_r = Counter(bucket(t) for ts in pool_toks.values() for t in ts)
    c_t = Counter(bucket(t) for i, ts in pool_toks.items() if i % 2 == 0 for t in ts)
    n_r, n_t = sum(c_r.values()), sum(c_t.values())
    norm = fl2(n_r + 64, n_t + 64)
    for i, ts in pool_toks.items():
        want = sum(fl2(c_t[bucket(t)] + 1, c_r[bucket(t)] + 1) for t in ts)
        want += len(ts) * norm
        assert scores[i] == want, (i, scores[i], want)


def _substring_spans_ref(texts, k, min_count=2):
    """Pure-python reference: maximal merged duplicated k-gram
    ranges per doc, {doc_id: [(start, end)]}."""
    from collections import Counter

    toks = {i: t.lower().split(" ") for i, t in texts.items()}
    grams = Counter()
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            grams[" ".join(ts[i : i + k])] += 1
    out = {}
    for d, ts in toks.items():
        pos = [
            i
            for i in range(len(ts) - k + 1)
            if grams[" ".join(ts[i : i + k])] >= min_count
        ]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        if spans:
            out[d] = [tuple(s) for s in spans]
    return out


def test_exact_substring_spans_shifted_copy_and_self_repeat(spark):
    from whatdropsnow_etl_spark.operators import exact_substring_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"
    texts = {
        # doc 0 carries the passage at offset 3, doc 1 at offset 0 —
        # a SHIFTED copy the non-overlapping C4 grid misses
        0: "alpha beta gamma " + shared + " epsilon zeta",
        1: shared + " eta theta iota kappa",
        # doc 2 repeats its own phrase (within-doc duplication)
        2: "pad one fee fie foe fum fee fie foe fum pad two end here",
        # doc 3 shares nothing
        3: "completely unrelated tokens without any duplication at all",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    k = 4
    got = {}
    for r in exact_substring_spans(df, k=k).collect():
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end)
        )
        assert r.span_tokens == r.span_end - r.span_start
    got = {d: sorted(v) for d, v in got.items()}
    want = _substring_spans_ref(texts, k)
    assert got == want
    # the shifted copy is found in both docs and covers the passage
    assert 0 in got and 1 in got and 3 not in got
    assert got[1][0][0] == 0  # doc 1's span starts at the passage
    # self-repetition found in doc 2: both occurrences covered
    assert 2 in got
    # hashed-key path identical at test scale
    hashed = {}
    for r in exact_substring_spans(df, k=k, hash_grams=True).collect():
        hashed.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert {d: sorted(v) for d, v in hashed.items()} == want


def test_exact_substring_spans_merges_overlaps(spark):
    from whatdropsnow_etl_spark.operators import exact_substring_spans

    # two docs share a 6-token run: with k=4 the three overlapping
    # duplicated windows (pos 1,2,3 in doc 0) must merge to ONE span
    a = "x1 c1 c2 c3 c4 c5 c6 y1 y2"
    b = "z1 z2 c1 c2 c3 c4 c5 c6"
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substring_spans(df, k=4).collect()
    )
    assert got == [(0, 1, 7), (1, 2, 8)]


def test_auc_exact_matches_rank_reference(spark):
    from whatdropsnow_etl_spark.operators import auc_exact

    # deterministic scores with heavy ties across both classes
    rows = [(i, float((i * 7) % 10) / 10.0, (i * 3) % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    got = auc_exact(df, "score", "label").collect()
    assert len(got) == 1
    r = got[0]

    def ref_auc(pairs):
        # P(s_pos > s_neg) + 0.5 P(tie), brute force
        pos = [s for s, y in pairs if y == 1]
        neg = [s for s, y in pairs if y == 0]
        u2 = sum(
            2 if p > n else (1 if p == n else 0) for p in pos for n in neg
        )
        return u2, len(pos), len(neg)

    u2, np_, nn_ = ref_auc([(s, y) for _, s, y in rows])
    assert (r.n_pos, r.n_neg) == (np_, nn_)
    assert r.u2 == str(u2)
    assert r.auc == round(u2 / (2 * np_ * nn_), 6)
    # perfect separation -> 1.0, reversed -> 0.0
    sep = spark.createDataFrame(
        [(i, float(i), 1 if i >= 5 else 0) for i in range(10)],
        "id long, score double, label int",
    )
    assert auc_exact(sep, "score", "label").collect()[0].auc == 1.0
    rev = spark.createDataFrame(
        [(i, float(-i), 1 if i >= 5 else 0) for i in range(10)],
        "id long, score double, label int",
    )
    assert auc_exact(rev, "score", "label").collect()[0].auc == 0.0
    # single-class group emits NULL auc, not a crash
    one = spark.createDataFrame(
        [(1, 0.5, 1), (2, 0.7, 1)], "id long, score double, label int"
    )
    assert auc_exact(one, "score", "label").collect()[0].auc is None


def test_auc_exact_grouped(spark):
    from whatdropsnow_etl_spark.operators import auc_exact

    rows = []
    for i in range(60):
        g = "g%d" % (i % 2)
        # g0: score == label (AUC 1.0); g1: score independent
        y = (i // 2) % 2
        s = float(y) if g == "g0" else float((i * 13) % 7)
        rows.append((g, s, y))
    df = spark.createDataFrame(rows, "grp string, score double, label int")
    got = {r.grp: r for r in auc_exact(df, "score", "label", group_col="grp").collect()}
    assert got["g0"].auc == 1.0
    assert 0.0 <= got["g1"].auc <= 1.0


def test_pareto_frontier_matches_dominance_reference(spark):
    from whatdropsnow_etl_spark.operators import pareto_frontier

    pts = [
        (i, "s%d" % (i % 2), float((i * 17) % 23), float((i * 11) % 19))
        for i in range(120)
    ]
    # add exact co-located frontier duplicates
    pts += [(1000, "s0", 22.0, 18.0), (1001, "s0", 22.0, 18.0)]
    df = spark.createDataFrame(pts, "id long, grp string, x double, y double")
    got = {
        (r.grp, r.id) for r in pareto_frontier(
            df, "x", "y", "id", group_col="grp"
        ).collect()
    }

    want = set()
    for g in {"s0", "s1"}:
        gp = [(i, x, y) for i, gg, x, y in pts if gg == g]
        for i, x, y in gp:
            dominated = any(
                (x2 >= x and y2 >= y and (x2 > x or y2 > y))
                for j, x2, y2 in gp
                if j != i
            )
            if not dominated:
                want.add((g, i))
    assert got == want
    # both co-located duplicates survive
    assert ("s0", 1000) in got and ("s0", 1001) in got
