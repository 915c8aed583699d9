"""Property-based tests (hypothesis) for operator invariants.

Each property generates small random relations driver-side, runs the
operator on Spark, and asserts an invariant that must hold for ANY
input — the layer golden-count tests can't cover. Examples are kept
small (Spark job per example) and derandomized for CI stability.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    latest_wins,
    ngram_jaccard_pairs,
    paginate,
    sessionize,
)

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),  # event_id (may collide; upsert orders by it)
        st.integers(0, 5),  # user_id
        st.integers(0, 10_000),  # ts seconds
        st.floats(0, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=events_strategy)
@PROP
def test_latest_wins_no_dup_keys_and_subset(spark, rows):
    df = spark.createDataFrame(
        [(eid, uid, ts, float(v)) for eid, uid, ts, v in rows],
        "event_id long, user_id long, ts long, value double",
    )
    out = latest_wins(
        df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).collect()
    keys = [r.user_id for r in out]
    assert len(keys) == len(set(keys)), "merged output must have unique keys"
    src = {(r[0], r[1], r[2]) for r in rows}
    assert all((r.event_id, r.user_id, r.ts) in src for r in out)
    # winner per key is the (ts, event_id) max
    best: dict[int, tuple[int, int]] = {}
    for eid, uid, ts, _ in rows:
        if uid not in best or (ts, eid) > best[uid]:
            best[uid] = (ts, eid)
    assert {(r.user_id, (r.ts, r.event_id)) for r in out} == set(best.items())


@given(rows=events_strategy, gap=st.integers(1, 5_000))
@PROP
def test_sessionize_gap_invariant(spark, rows, gap):
    # unique event ids keep the assertion simple
    uniq = {(i, uid, ts, v) for i, (_, uid, ts, v) in enumerate(rows)}
    df = spark.createDataFrame(
        [(eid, uid, ts, float(v)) for eid, uid, ts, v in uniq],
        "event_id long, user_id long, ts_s long, value double",
    ).select(
        "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = sessionize(
        df, "user_id", "ts", "event_id", "value", f"{gap} SECONDS"
    ).collect()
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    n_events_in: dict[int, int] = {}
    for _, uid, _, _ in uniq:
        n_events_in[uid] = n_events_in.get(uid, 0) + 1
    for uid, sessions in per_user.items():
        sessions.sort(key=lambda r: r.session_start_us)
        # sessions partition the user's events
        assert sum(s.n_events for s in sessions) == n_events_in[uid]
        # seq numbering follows start order from 1
        assert [s.session_seq for s in sessions] == list(
            range(1, len(sessions) + 1)
        )
        for s in sessions:
            assert s.session_start_us <= s.session_end_us
        # consecutive sessions are separated by more than the gap
        for a, b in zip(sessions, sessions[1:]):
            assert (b.session_start_us - a.session_end_us) / 1_000_000 > gap


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab "),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=15,
    )
)
@PROP
def test_jaccard_pairs_bounds_and_orientation(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = ngram_jaccard_pairs(df, k=2, threshold=0.3).collect()
    for p in pairs:
        assert p.doc_a < p.doc_b, "pairs must be oriented a < b"
        assert 0.3 <= p.jaccard <= 1.0 + 1e-12
        assert p.n_common >= 1
    assert len({(p.doc_a, p.doc_b) for p in pairs}) == len(pairs), "no dup pairs"


@given(
    n=st.integers(1, 60),
    page=st.integers(1, 8),
    page_size=st.integers(1, 20),
)
@PROP
def test_paginate_partitions_ordered_set(spark, n, page, page_size):
    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = [r.id for r in paginate(df, ["id"], page=page, page_size=page_size).collect()]
    lo = (page - 1) * page_size
    assert got == list(range(n))[lo : lo + page_size]


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=40,
    ),
    n=st.integers(1, 26),
)
@PROP
def test_twostars_components_match_union_find(spark, edges, n):
    """large-star/small-star output == a driver-side union-find over
    ANY random edge list (self-loops and out-of-range edges pruned)."""
    from whatdropsnow_etl_spark.operators.dedup import _components_twostars

    edges = [(a, b) for a, b in edges if a != b and a < n and b < n]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(i, find(i)) for i in range(n)}

    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    ).where(F.col("doc_a") != F.col("doc_b"))
    got = {
        (r["doc_id"], r["component_id"])
        for r in _components_twostars(ids, pairs, max_iter=20).collect()
    }
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=1, max_size=30),
        min_size=1,
        max_size=12,
    )
)
@PROP
def test_simhash_pairs_match_bruteforce(spark, texts):
    """simhash_pairs == a pure-Python brute force of the documented
    semantics: md5-hex-digit-parity votes weighted by term frequency,
    all pairs with hamming <= max_hamming (banding is exact for
    hamming < bands)."""
    import hashlib
    from itertools import combinations

    from whatdropsnow_etl_spark.operators import simhash_pairs

    def fingerprint(text):
        # engine tokenizer contract: split(lower(text), ' '), empty
        # tokens KEPT (matches the DuckDB oracle's string_split)
        toks = text.lower().split(" ")
        votes = [0] * 32
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(32):
                votes[j] += 1 if int(h[j], 16) % 2 else -1
        return sum(1 << j for j in range(32) if votes[j] > 0)

    docs = list(enumerate(texts))
    fps = {i: fingerprint(t) for i, t in docs}
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(df, bits=32, bands=4, max_hamming=3).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # user_id
            st.integers(0, 5_000),  # ts seconds
            st.booleans(),  # trigger?
        ),
        min_size=1,
        max_size=40,
    ),
    window_s=st.sampled_from([60, 600, 3600]),
)
@PROP
def test_interval_overlap_matches_bruteforce(spark, rows, window_s):
    """Bucketized interval join == O(n^2) reference on any input."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import interval_overlap_count

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, u, base + dt.timedelta(seconds=ts), 100.0 if trig else 1.0)
        for i, (u, ts, trig) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["n_windows"]
        for r in interval_overlap_count(
            df, trigger=F.col("value") >= 100.0, window_s=window_s
        ).collect()
    }
    want: dict[int, int] = {}
    for i, u, ts, v in data:
        n = sum(
            1
            for _, wu, wts, wv in data
            if wv >= 100.0 and wu == u and wts <= ts < wts + dt.timedelta(seconds=window_s)
        )
        if n:
            want[i] = n
    assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=40),
        min_size=2,
        max_size=12,
    )
)
@PROP
def test_editdist_pairs_match_bruteforce(spark, texts):
    """Banded blocking loses NO pair the operator's declared filters
    admit: output == brute-force all-pairs run of the same staged
    predicate (length-diff gate, prefix gate, full gate)."""
    from whatdropsnow_etl_spark.operators import editdist_pairs

    max_dist, prefix = 4, 8
    docs = [(i, t, "en", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n_chars long")
    got = {
        (r["lo"], r["hi"], r["dist"])
        for r in editdist_pairs(df, max_dist=max_dist, prefix=prefix).collect()
    }
    want = set()
    for i, (ai, ta, _, la) in enumerate(docs):
        for aj, tb, _, lb in docs[i + 1 :]:
            if abs(la - lb) > max_dist:
                continue
            if _lev(ta[:prefix], tb[:prefix]) > max_dist:
                continue
            d = _lev(ta, tb)
            if d <= max_dist:
                want.add((ai, aj, d))
    assert got == want


@given(
    rate=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_rate_hex_threshold_monotone(rate, ids):
    """_rate_hex: lexicographic compare of md5-prefix vs threshold is
    monotone in the rate and brackets the exact fraction."""
    import hashlib

    from whatdropsnow_etl_spark.operators.sampling import _rate_hex

    hx = _rate_hex(rate)
    # rate 1.0 returns the 'g' sentinel (sorts after every hex
    # prefix, keeps EVERYTHING — the old capped 'ffffffff' dropped
    # md5-prefix-'ffffffff' ids); all other rates are 8 hex chars
    assert hx == "g" if rate >= 1.0 else len(hx) == 8
    kept = sum(
        1 for i in ids if hashlib.md5(str(i).encode()).hexdigest()[:8] < hx
    )
    assert 0 <= kept <= len(ids)
    if rate == 0.0:
        assert kept == 0
    if rate == 1.0:
        assert kept == len(ids)
    # monotone: a higher rate never keeps fewer
    hx2 = _rate_hex(min(1.0, rate + 0.25))
    kept2 = sum(
        1 for i in ids if hashlib.md5(str(i).encode()).hexdigest()[:8] < hx2
    )
    assert kept2 >= kept


texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@given(texts=texts_strategy)
@PROP
def test_normalize_text_idempotent(spark, texts):
    """normalize_text is a projection onto its own image: running it
    twice equals running it once (NFC, the strip and the collapse are
    each idempotent, and they commute on the image)."""
    from whatdropsnow_etl_spark.operators import normalize_text

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    once = normalize_text(docs)
    twice = normalize_text(
        once.select("doc_id", F.col("norm_text").alias("text"))
    )
    a = {r["doc_id"]: r["norm_text"] for r in once.collect()}
    b = {r["doc_id"]: r["norm_text"] for r in twice.collect()}
    assert a == b


@given(
    words=st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=5),
        min_size=1,
        max_size=30,
    )
)
@PROP
def test_hashed_features_permutation_invariant_and_mass_bounded(spark, words):
    """Per-doc hashed features depend only on the doc's token
    multiset: shuffling token order changes nothing, and total
    absolute weight never exceeds the token count (signs can only
    cancel)."""
    from whatdropsnow_etl_spark.operators import hashed_features

    fwd = " ".join(words)
    rev = " ".join(reversed(words))
    docs = spark.createDataFrame(
        [(0, fwd), (1, rev)], "doc_id bigint, text string"
    )
    rows = hashed_features(docs, n_buckets=32).collect()
    by_doc = {0: {}, 1: {}}
    for r in rows:
        by_doc[r["doc_id"]][r["bucket"]] = r["weight"]
    assert by_doc[0] == by_doc[1]
    assert sum(abs(w) for w in by_doc[0].values()) <= len(words)


@given(
    weights=st.lists(st.integers(1, 1000), min_size=1, max_size=60),
    k=st.integers(1, 6),
)
@PROP
def test_balanced_shards_snake_bound_property(spark, weights, k):
    """For ANY weight multiset and shard count: every doc assigned
    exactly once, shard ids within range, and per-shard totals
    differ by at most the max single weight (the snake-deal
    guarantee)."""
    from whatdropsnow_etl_spark.operators import balanced_shards

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_chars bigint")
    out = balanced_shards(df, n_shards=k).collect()
    assert len(out) == len(rows)
    totals: dict[int, int] = {}
    for r in out:
        assert 0 <= r["shard"] < k
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["weight"]
    if len(rows) >= k:
        assert max(totals.values()) - min(totals.values()) <= max(weights)


@given(
    a_rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)),
                    min_size=0, max_size=20),
    b_rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)),
                    min_size=0, max_size=20),
    a_cut=st.integers(0, 99),
    b_cut=st.integers(0, 99),
)
@PROP
def test_incremental_join_identity_property(spark, a_rows, b_rows, a_cut, b_cut):
    """ΔV identity holds for ARBITRARY splits and duplicate keys:
    delta-join == full-recompute EXCEPT ALL old-join, as multisets."""
    from whatdropsnow_etl_spark.operators import incremental_join

    a = spark.createDataFrame(
        [(k, f"a{v}") for k, v in a_rows] or [(None, None)], "k int, av string"
    ).where(F.col("k").isNotNull())
    b = spark.createDataFrame(
        [(k, f"b{v}") for k, v in b_rows] or [(None, None)], "k int, bv string"
    ).where(F.col("k").isNotNull())
    a_old, a_new = a.where(F.col("k") % 100 >= a_cut % 100 // 2), a.where(
        ~(F.col("k") % 100 >= a_cut % 100 // 2)
    )
    b_old, b_new = b.where(F.col("k") >= b_cut % 6), b.where(F.col("k") < b_cut % 6)
    got = sorted(
        map(tuple, incremental_join(a_old, a_new, b_old, b_new, ["k"]).collect())
    )
    want = sorted(
        map(
            tuple,
            a.join(b, "k").exceptAll(a_old.join(b_old, "k")).collect(),
        )
    )
    assert got == want


asof_rows = st.lists(
    st.tuples(
        st.integers(0, 3),       # key
        st.integers(0, 1000),    # ts seconds
    ),
    min_size=1,
    max_size=25,
)


@given(lefts=asof_rows, rights=asof_rows, tol=st.integers(1, 500))
@PROP
def test_asof_nearest_matches_bruteforce(spark, lefts, rights, tol):
    """For every left row the nearest match equals the brute-force
    answer: min |Δts| within tolerance, ties to the backward
    candidate. Right rows are deduped per (key, ts) to honor the
    operator's uniqueness contract."""
    from whatdropsnow_etl_spark.operators import asof_join

    rights = sorted({(k, ts) for k, ts in rights})
    left_df = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lefts)],
        "id long, k long, tsec long",
    ).select("id", "k", F.timestamp_seconds("tsec").alias("ts"))
    right_df = spark.createDataFrame(
        [(k, ts, float(k * 1000 + ts)) for k, ts in rights],
        "k long, tsec long, v double",
    ).select("k", F.timestamp_seconds("tsec").alias("ts"), "v")
    got = {
        r["id"]: r["v"]
        for r in asof_join(
            left_df, right_df, ts_col="ts", by_cols=["k"], value_cols=["v"],
            direction="nearest", tolerance_us=tol * 1_000_000,
        ).collect()
    }
    for i, (k, lts) in enumerate(lefts):
        cands = [
            (abs(lts - rts), 0 if rts <= lts else 1, rts, v_k, v_ts)
            for (v_k, v_ts) in [(rk, rts) for rk, rts in rights if rk == k]
            for rts in [v_ts]
            if abs(lts - rts) <= tol
        ]
        expect = None
        if cands:
            # min distance; tie -> backward (rts <= lts sorts first)
            _, _, _, ck, cts = min(cands)
            expect = float(ck * 1000 + cts)
        assert got[i] == expect, (i, k, lts, got[i], expect)


@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=60
    ),
    n_bins=st.integers(2, 8),
)
@PROP
def test_quantile_bucketize_partition_property(spark, vals, n_bins):
    """Any input: bins partition the non-NULL rows, ids stay in
    [0, n_bins-1], and bins never overlap in value space."""
    from whatdropsnow_etl_spark.operators import quantile_bucketize

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "event_id long, value double"
    )
    rows = sorted(
        quantile_bucketize(df, "value", "event_id", n_bins=n_bins, k=64).collect(),
        key=lambda r: r["bin_id"],
    )
    assert sum(r["n"] for r in rows) == len(vals)
    assert all(0 <= r["bin_id"] < n_bins for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] < b["lo_cents"]


ranked_rows = st.lists(
    st.tuples(
        st.integers(0, 1_000_000),  # id (dedup below)
        st.integers(0, 2),  # group
        st.integers(-50, 50),  # value (heavy ties by design)
    ),
    min_size=1,
    max_size=60,
)


@given(rows=ranked_rows)
@PROP
def test_percentile_rank_decomposition_exact(spark, rows):
    """The sample-sort rank equals the naive single-window
    PERCENT_RANK for ANY value/group layout — ties, skew, tiny
    samples, single-row groups."""
    from pyspark.sql.window import Window

    from whatdropsnow_etl_spark.operators import percentile_rank

    uniq = {r[0]: r for r in rows}.values()
    df = spark.createDataFrame(
        [(i, f"g{g}", float(v)) for i, g, v in uniq],
        "doc_id long, source string, v double",
    )
    got = {
        r.doc_id: r.pct_rank
        for r in percentile_rank(
            df, "v", group_col="source", n_buckets=4, sample_k=8
        ).collect()
    }
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    naive = {
        r.doc_id: r.pr
        for r in df.select(
            "doc_id", F.percent_rank().over(w).alias("pr")
        ).collect()
    }
    assert got == naive


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=10,
    ),
    window=st.integers(1, 4),
)
@PROP
def test_cooccurrence_matches_bruteforce(spark, texts, window):
    """Map-side pair explode equals the O(n^2) per-doc brute force
    for ANY token layout and window size."""
    from collections import Counter

    from whatdropsnow_etl_spark.operators import cooccurrence_pairs

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b): r.n_cooc
        for r in cooccurrence_pairs(df, window=window, top_k=10_000).collect()
    }
    ref: Counter = Counter()
    for t in texts:
        for i in range(len(t)):
            for j in range(i + 1, min(i + window, len(t) - 1) + 1):
                ref[tuple(sorted((t[i], t[j])))] += 1
    assert got == dict(ref)


# pure-python codec properties: no Spark job per example, so these
# afford far more examples than the relation properties above
CODEC = settings(max_examples=150, deadline=None, derandomize=True)


@given(
    data=st.lists(st.integers(0, 255), min_size=1, max_size=4000),
    nsym=st.sampled_from([2, 4, 16, 64, 256]),
)
@CODEC
def test_lzw_round_trip_property(data, nsym):
    """GIF-variant LZW inverts itself for ANY symbol sequence at any
    palette width — incl. the code-width growth boundaries, the
    4096-entry table reset and the KwKwK case hypothesis shrinks to."""
    import numpy as np

    from whatdropsnow_etl_spark.functions.media import (
        _lzw_decode,
        _lzw_encode,
    )

    seq = np.array([d % nsym for d in data], dtype=np.uint8)
    mcs = max(2, (nsym - 1).bit_length())
    dec = _lzw_decode(_lzw_encode(seq, mcs), mcs, len(seq))
    assert (dec == seq).all()


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    ft=st.integers(0, 4),
    interlace=st.integers(0, 1),
    seed=st.integers(0, 10_000),
)
@CODEC
def test_png_round_trip_property(w, h, ft, interlace, seed):
    """The PNG codec inverts every (size, filter, interlace) combo —
    Adam7's empty-pass edges included — bit-exactly."""
    import numpy as np

    from whatdropsnow_etl_spark.functions.media import (
        decode_png_rgb8,
        encode_png_rgb8,
    )

    px = (
        np.random.RandomState(seed)
        .randint(0, 256, (h, w, 3))
        .astype(np.uint8)
    )
    d = decode_png_rgb8(
        encode_png_rgb8(w, h, pixels=px, filter_type=ft, interlace=interlace)
    )
    assert (d["px"] == px).all()


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    ncolor=st.integers(1, 6),
    interlace=st.booleans(),
    seed=st.integers(0, 10_000),
)
@CODEC
def test_gif_round_trip_property(w, h, ncolor, interlace, seed):
    """The GIF codec inverts every (size, palette, interlace) combo."""
    import numpy as np

    from whatdropsnow_etl_spark.functions.media import (
        decode_gif,
        encode_gif87a,
    )

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolor, 3)).astype(np.uint8)
    idx = rng.randint(0, ncolor, (h, w))
    px = pal[idx]
    d = decode_gif(encode_gif87a(w, h, pixels=px, interlace=interlace))
    assert (d["px"] == px).all()


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    n_frames=st.integers(1, 5),
    ncolor=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
@CODEC
def test_animated_gif_round_trip_property(w, h, n_frames, ncolor, seed):
    """The r10 animated codec inverts every (size, frames, palette)
    combo: per-frame pixels recover bit-exactly through the shared
    global palette and per-frame LZW, and the cross-frame sums are
    the sums of the parts."""
    import numpy as np

    from whatdropsnow_etl_spark.functions.media import (
        decode_gif_frames,
        encode_gif89a_frames,
    )

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolor, 3)).astype(np.uint8)
    frames = [pal[rng.randint(0, ncolor, (h, w))] for _ in range(n_frames)]
    d = decode_gif_frames(encode_gif89a_frames(w, h, frames))
    assert d["n_frames"] == n_frames
    for f, g in zip(frames, d["frames"]):
        assert (f == g).all()
    assert d["sum_r"] == sum(
        int(f[:, :, 0].astype(np.int64).sum()) for f in frames
    )
