"""Tests for the round-2 scale operators: exact quantiles,
bucketized interval join, HLL sketch, edit-distance dedup,
pivot/cube plans."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    editdist_pairs,
    exact_group_quantiles,
    hll_count_distinct,
    interval_overlap_count,
)


# --- exact quantiles -------------------------------------------------------


def test_quantiles_match_numpy_type1(spark):
    rng = np.random.default_rng(7)
    rows = [
        Row(g=g, i=i, v=float(round(x, 2)))
        for g in ("a", "b")
        for i, x in enumerate(rng.uniform(0, 500, 301))
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["g"]: r
        for r in exact_group_quantiles(
            df, ["g"], "v", ps=(0.5, 0.9), tiebreak_col="i"
        ).collect()
    }
    for g in ("a", "b"):
        cents = np.sort(
            np.rint(
                np.array([r.v for r in rows if r.g == g]) * 100
            ).astype(np.int64)
        )
        n = len(cents)
        for p, col in ((0.5, "p50_cents"), (0.9, "p90_cents")):
            assert out[g][col] == cents[int(np.floor(p * (n - 1)))]


def test_quantiles_single_row_group(spark):
    df = spark.createDataFrame([Row(g="x", i=0, v=42.5)])
    row = exact_group_quantiles(
        df, ["g"], "v", ps=(0.5, 0.99), tiebreak_col="i"
    ).collect()[0]
    assert row["p50_cents"] == 4250 and row["p99_cents"] == 4250


# --- interval overlap join -------------------------------------------------


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_interval_overlap_boundaries(spark):
    # 10-minute windows; trigger = value >= 100
    rows = [
        # trigger at t=0 opens [0, 10); its own event counts
        Row(event_id=1, user_id=1, ts=_ts(0), value=100.0),
        Row(event_id=2, user_id=1, ts=_ts(9), value=1.0),  # inside both
        # t=10 sits ON window-1's half-open end (excluded) but inside
        # window-2 [8, 18): exactly one match proves the boundary
        Row(event_id=3, user_id=1, ts=_ts(10), value=1.0),
        Row(event_id=4, user_id=2, ts=_ts(5), value=1.0),  # other user: out
        Row(event_id=5, user_id=1, ts=_ts(8), value=200.0),  # second trigger
    ]
    out = {
        r["event_id"]: r["n_windows"]
        for r in interval_overlap_count(
            spark.createDataFrame(rows),
            trigger=F.col("value") >= 100.0,
            window_s=600,
        ).collect()
    }
    assert out == {1: 1, 2: 2, 3: 1, 5: 2}  # 4 matches nothing


def test_interval_overlap_crosses_bucket_boundary(spark):
    # window [55, 65) spans two 10-min buckets; event in the second
    # bucket must still match exactly once (no double count from the
    # explode)
    rows = [
        Row(event_id=1, user_id=1, ts=_ts(55), value=100.0),
        Row(event_id=2, user_id=1, ts=dt.datetime(2024, 1, 1, 1, 4), value=1.0),
    ]
    out = {
        r["event_id"]: r["n_windows"]
        for r in interval_overlap_count(
            spark.createDataFrame(rows),
            trigger=F.col("value") >= 100.0,
            window_s=600,
        ).collect()
    }
    assert out == {1: 1, 2: 1}


# --- HLL sketch ------------------------------------------------------------


def test_hll_within_error_bound(spark):
    n_distinct = 5_000
    df = spark.range(0, n_distinct * 3).select(
        F.lit("g").alias("g"), (F.col("id") % n_distinct).alias("u")
    )
    got = hll_count_distinct(df, ["g"], "u", p=12).collect()[0][
        "approx_distinct"
    ]
    # std err ~1.6% at p=12; 5 sigma keeps flakiness out while still
    # catching algorithmic breakage (off-by-one rho, wrong alpha)
    assert abs(got - n_distinct) / n_distinct < 0.08


def test_hll_registers_merge_across_slices(spark):
    from whatdropsnow_etl_spark.operators import hll_registers

    df = spark.range(0, 2_000).select(
        F.lit("g").alias("g"), F.col("id").alias("u")
    )
    a, b = df.where("u < 1500"), df.where("u >= 500")  # overlapping
    merged = (
        hll_registers(a, ["g"], "u")
        .union(hll_registers(b, ["g"], "u"))
        .groupBy("g", "__reg")
        .agg(F.max("__rho").alias("__rho"))
    )
    direct = hll_registers(df, ["g"], "u")
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


# --- edit-distance dedup ---------------------------------------------------


def test_editdist_finds_cross_band_pair(spark):
    base = "x" * 63  # len 63 -> band 0; base+"yy" len 65 -> band 1
    rows = [
        Row(doc_id=1, text=base, lang="en", n_chars=63),
        Row(doc_id=2, text=base + "yy", lang="en", n_chars=65),
        Row(doc_id=3, text="z" * 63, lang="en", n_chars=63),  # far
        Row(doc_id=4, text=base, lang="fr", n_chars=63),  # other lang
    ]
    out = editdist_pairs(spark.createDataFrame(rows), max_dist=16).collect()
    assert [(r["lo"], r["hi"], r["dist"]) for r in out] == [(1, 2, 2)]


def test_editdist_same_band_pair_emitted_once(spark):
    t = "hello world " * 5
    rows = [
        Row(doc_id=10, text=t, lang="en", n_chars=len(t)),
        Row(doc_id=11, text=t + "!", lang="en", n_chars=len(t) + 1),
    ]
    out = editdist_pairs(spark.createDataFrame(rows), max_dist=16).collect()
    assert len(out) == 1 and out[0]["dist"] == 1


def test_editdist_kernel_string_ids(spark):
    """The r7 pair kernel derives its output id types from the input
    schema (np.minimum orders object arrays lexicographically), so
    string doc ids flow through the full operator."""
    from whatdropsnow_etl_spark.operators import editdist_pairs

    base = "hello world " * 8
    rows = [
        Row(doc_id="doc-a", text=base, lang="en", n_chars=len(base)),
        Row(doc_id="doc-b", text=base + "!", lang="en", n_chars=len(base) + 1),
        Row(doc_id="doc-c", text="z" * len(base), lang="en", n_chars=len(base)),
    ]
    out = editdist_pairs(spark.createDataFrame(rows), max_dist=16).collect()
    assert [(r["lo"], r["hi"], r["dist"]) for r in out] == [
        ("doc-a", "doc-b", 1)
    ]


def test_editdist_huge_char_counts_no_int16_wrap(spark):
    """A single char count past 32767 (~250 KB of English text) must
    not wrap negative in the kernel's histograms: a wrapped vs
    non-wrapped near-duplicate would blow the L1 bound and silently
    drop a TRUE pair (r7 ADVICE — the int16 downcast). 32760 vs
    32770 'a's straddles the int16 boundary on both the char AND
    trigram histograms; distance 10 <= 16 must survive."""
    rows = [
        Row(doc_id=1, text="a" * 32760, lang="en", n_chars=32760),
        Row(doc_id=2, text="a" * 32770, lang="en", n_chars=32770),
    ]
    out = editdist_pairs(spark.createDataFrame(rows), max_dist=16).collect()
    assert [(r["lo"], r["hi"], r["dist"]) for r in out] == [(1, 2, 10)]


def test_editdist_null_rows_excluded_not_crash(spark):
    """NULL text / NULL length rows are dropped before the numpy
    kernel (matching the r6 join shape's null-comparison semantics)
    instead of reaching it as NaN and crashing the task (r7 ADVICE)."""
    t = "hello world " * 5
    rows = [
        Row(doc_id=1, text=t, lang="en", n_chars=len(t)),
        Row(doc_id=2, text=t + "!", lang="en", n_chars=len(t) + 1),
        Row(doc_id=3, text=None, lang="en", n_chars=None),
        Row(doc_id=4, text=None, lang="en", n_chars=60),
        Row(doc_id=5, text=t, lang="en", n_chars=None),
    ]
    out = editdist_pairs(spark.createDataFrame(rows), max_dist=16).collect()
    assert [(r["lo"], r["hi"], r["dist"]) for r in out] == [(1, 2, 1)]


def test_editdist_incremental_equals_full_restriction(spark, tables):
    """Incremental new-pairs maintenance == the full operator's
    pairs restricted to >= 1 batch doc, across every pair class
    (batch-batch same/adjacent band, batch-corpus same/adjacent band
    in BOTH directions), exercised on the real corpus AND a
    hand-built band-boundary set."""
    from whatdropsnow_etl_spark.operators import (
        editdist_pairs,
        editdist_pairs_incremental,
    )

    docs = tables["documents"]
    batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc = {
        (r["lo"], r["hi"], r["dist"])
        for r in editdist_pairs_incremental(batch, corpus).collect()
    }
    full = {
        (r["lo"], r["hi"], r["dist"])
        for r in editdist_pairs(docs).collect()
        if r["lo"] % 5 == 0 or r["hi"] % 5 == 0
    }
    assert inc == full
    # hand-built: batch doc in band 1 pairs DOWN to a corpus doc in
    # band 0 (the direction the full operator covers by symmetry
    # but the incremental must pull in explicitly), and UP to one
    # in band 2
    base = "x" * 63
    b = spark.createDataFrame(
        [Row(doc_id=100, text=base + "yy", lang="en", n_chars=65)]
    )
    c = spark.createDataFrame(
        [
            Row(doc_id=1, text=base, lang="en", n_chars=63),  # band 0
            Row(doc_id=2, text=base + "yyy!", lang="en", n_chars=67),
            Row(doc_id=3, text="z" * 65, lang="en", n_chars=65),  # far
        ]
    )
    got = sorted(
        (r["lo"], r["hi"], r["dist"])
        for r in editdist_pairs_incremental(b, c, max_dist=16).collect()
    )
    assert got == [(1, 100, 2), (2, 100, 2)]


# --- pivot / cube ----------------------------------------------------------


def test_pivot_and_cube_consistent(tables):
    from whatdropsnow_etl_spark.plans.olap import (
        cube_qty_summary,
        pivot_qty_by_status,
    )

    li = tables["lineitem"]
    piv = {r["l_returnflag"]: r for r in pivot_qty_by_status(li).collect()}
    cube = cube_qty_summary(li).collect()
    # cube's (flag, 'O') cells must equal the pivot's O column
    for r in cube:
        if r["status"] == "O" and r["flag"] != "ALL" and r["gid"] == 0:
            assert piv[r["flag"]]["n_o"] == r["n_items"]
            assert piv[r["flag"]]["qty_o"] == pytest.approx(r["sum_qty"])
    # grand total row: gid 3, counts equal table size
    total = [r for r in cube if r["gid"] == 3]
    assert len(total) == 1 and total[0]["n_items"] == li.count()


# --- k-means codebook training ---------------------------------------------


def test_kmeans_codebook_deterministic_and_better_than_standin(spark):
    import numpy as np
    from whatdropsnow_etl_spark.operators import train_kmeans_codebook
    from whatdropsnow_etl_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where(F.col("vec_id") >= 10)
    cb1 = train_kmeans_codebook(corpus, k=8, iters=3)
    cb2 = train_kmeans_codebook(corpus, k=8, iters=3)
    rows1 = sorted((r["vec_id"], tuple(r["embedding"])) for r in cb1.collect())
    rows2 = sorted((r["vec_id"], tuple(r["embedding"])) for r in cb2.collect())
    assert rows1 == rows2  # seeded init + exact pipeline => bit-stable
    assert len(rows1) == 8

    # trained codebook quantizes at least as well as the stand-in
    # (the 8 lowest-id corpus vectors ann_ivf_topk defaults to)
    vecs = np.array([r["embedding"] for r in corpus.collect()], dtype=float)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    def quality(centroids):
        c = np.array(centroids, dtype=float)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        return float(np.mean(np.max(vn @ cn.T, axis=1)))

    trained = [v for _, v in rows1]
    standin = [
        r["embedding"]
        for r in corpus.orderBy("vec_id").limit(8).collect()
    ]
    assert quality(trained) >= quality(standin) - 1e-9


# --- count-min sketch ------------------------------------------------------


def test_cms_never_underestimates_and_bounds_overestimate(spark):
    rows = []
    truth = {}
    for item, n in [("a", 500), ("b", 200), ("c", 50), ("d", 1)]:
        truth[item] = n
        rows += [Row(g="g", x=item)] * n
    df = spark.createDataFrame(rows)
    from whatdropsnow_etl_spark.operators import cms_estimate_counts

    est = {
        r["x"]: r["est_count"]
        for r in cms_estimate_counts(df, df, ["g"], "x", depth=4, width=2048).collect()
    }
    n_total = sum(truth.values())
    for item, n in truth.items():
        assert est[item] >= n  # one-sided: never below truth
        assert est[item] <= n + 2 * n_total / 2048 + 1


def test_cms_registers_merge_by_sum(spark):
    from whatdropsnow_etl_spark.operators import cms_registers

    df = spark.createDataFrame(
        [Row(i=i, g="g", x=str(i % 37)) for i in range(500)]
    )
    a, b = df.where("i < 200"), df.where("i >= 200")
    merged = (
        cms_registers(a, ["g"], "x")
        .unionByName(cms_registers(b, ["g"], "x"))
        .groupBy("g", "__row", "__bucket")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    direct = cms_registers(df, ["g"], "x")
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


# --- KMV sketch ------------------------------------------------------------


def test_kmv_exact_below_k_and_close_above(spark):
    from whatdropsnow_etl_spark.operators.sketches import kmv_count_distinct

    small = spark.range(0, 600).select(
        F.lit("s").alias("g"), (F.col("id") % 100).alias("u")
    )
    got = kmv_count_distinct(small, ["g"], "u", k=256).collect()[0]
    assert got["approx_distinct"] == 100  # < k distinct => exact

    big = spark.range(0, 60_000).select(
        F.lit("b").alias("g"), (F.col("id") % 20_000).alias("u")
    )
    got = kmv_count_distinct(big, ["g"], "u", k=256).collect()[0]
    assert abs(got["approx_distinct"] - 20_000) / 20_000 < 0.25


def test_kmv_registers_merge(spark):
    from whatdropsnow_etl_spark.operators.sketches import kmv_registers
    from pyspark.sql.window import Window

    df = spark.range(0, 5_000).select(
        F.lit("g").alias("g"), F.col("id").alias("u")
    )
    a, b = df.where("u < 3000"), df.where("u >= 2000")  # overlap
    w = Window.partitionBy("g").orderBy("__u")
    merged = (
        kmv_registers(a, ["g"], "u", k=64)
        .unionByName(kmv_registers(b, ["g"], "u", k=64))
        .select("g", "__u")
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 64)
    )
    direct = kmv_registers(df, ["g"], "u", k=64)
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


def test_salted_join_hotkeys_equivalence(spark, tables):
    from whatdropsnow_etl_spark.operators.skew import salted_join_hotkeys

    ev = tables["events"].select("user_id", "value", "event_id")
    cust = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = ev.join(cust, "user_id")
    # low threshold: every key hot; high: every key cold; mid: mixed
    for thr in (0, 3, 10**9):
        salted = salted_join_hotkeys(ev, cust, ["user_id"], hot_threshold=thr, n_salts=4)
        assert salted.count() == plain.count(), thr
        a = sorted(tuple(r) for r in salted.select("event_id", "c_mktsegment").collect())
        b = sorted(tuple(r) for r in plain.select("event_id", "c_mktsegment").collect())
        assert a == b, thr


def test_editdist_band_cap(spark, tables):
    from whatdropsnow_etl_spark.operators import editdist_pairs

    docs = tables["documents"].select(
        "doc_id", "text", "lang", "n_chars"
    )
    base = {
        (r["lo"], r["hi"])
        for r in editdist_pairs(docs, max_dist=8, max_band_docs=None).collect()
    }
    # the DEFAULT cap (2000) sits far above parity-scale block
    # populations, so it is semantics-neutral vs the uncapped path
    same = {
        (r["lo"], r["hi"]) for r in editdist_pairs(docs, max_dist=8).collect()
    }
    assert same == base
    # as is any cap far above band population
    same = {
        (r["lo"], r["hi"])
        for r in editdist_pairs(docs, max_dist=8, max_band_docs=10**6).collect()
    }
    assert same == base
    # cap < 1 is invalid (salting needs >= 1 sub-block)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        editdist_pairs(docs, max_dist=8, max_band_docs=0)
    # a mid cap salts hot blocks into sub-blocks: the surviving set
    # is a strict SUBSET of the exact pairs (never invented pairs),
    # and docs are never wholesale excluded -- a cap of 1 doc per
    # sub-block still yields s = block population, not zero blocks
    sub = {
        (r["lo"], r["hi"])
        for r in editdist_pairs(docs, max_dist=8, max_band_docs=5).collect()
    }
    assert sub <= base


def test_editdist_hub_band_guests_bound_group_memory(spark):
    """r7 verdict ask #9: max_band_docs bounds the applyInPandas
    group (one group == one in-memory pandas frame) by ARRIVALS —
    own docs AND adjacent-band guests. A hub-shaped neighbor band
    (2000 docs in band 1 guesting into a 4-doc band 0) previously
    rode into ONE group; now every group stays ~cap-sized, the
    planted co-salted near-dup pair still surfaces, and output
    remains a subset of the exact uncapped pairs."""
    import pandas as pd

    from whatdropsnow_etl_spark.operators import editdist_pairs
    from whatdropsnow_etl_spark.operators.dedup import _editdist_members

    cap = 100
    # band 0: short docs (len < 16 at band_width=16); band 1 hub:
    # len-20 docs, mutually far apart (distinct char content)
    hub_n = 2000
    rows = []
    for i in range(hub_n):
        # 20 chars from a rotating alphabet: consecutive docs differ
        # in (almost) every char histogram bucket
        txt = "".join(
            chr(ord("a") + ((i * 7 + j * 11) % 26)) for j in range(20)
        )
        rows.append(Row(doc_id=1000 + i, text=txt, lang="en",
                        n_chars=20))
    # the planted near-dup pair in band 0 — ids chosen CO-SALTED
    # below so the pair survives sub-blocking deterministically.
    # s = max(ceil(own/cap), ceil(arrivals/(2*cap)))
    s_expected = max(
        (4 + cap - 1) // cap,
        (4 + hub_n + 2 * cap - 1) // (2 * cap),
    )
    probe = spark.createDataFrame(
        [Row(doc_id=i) for i in range(1, 400)]
    ).select(
        "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(s_expected)).alias("m")
    ).collect()
    by_salt: dict[int, list[int]] = {}
    for r in probe:
        by_salt.setdefault(int(r["m"]), []).append(int(r["doc_id"]))
    pair_ids = next(v for v in by_salt.values() if len(v) >= 2)[:2]
    far_ids = [i for i in range(1, 400) if i not in pair_ids][:2]
    rows += [
        Row(doc_id=pair_ids[0], text="hello brave new", lang="en", n_chars=15),
        Row(doc_id=pair_ids[1], text="hello brave new", lang="en", n_chars=15),
        Row(doc_id=far_ids[0], text="zzzzzzzzzzzzzzz", lang="en", n_chars=15),
        Row(doc_id=far_ids[1], text="qqqqqqqqqqqqqqq", lang="en", n_chars=15),
    ]
    docs = spark.createDataFrame(rows)
    # (1) peak group size is cap-bounded (hash variance slack): the
    # OLD own-only count gave s=1 for band 0 and ONE 2004-row group
    members = _editdist_members(
        docs, 16, True, "doc_id", "text", "lang", "n_chars", cap, 8
    )
    sizes = (
        members.groupBy("lg", "band", "salt").count().agg(
            F.max("count").alias("m")
        ).collect()[0]["m"]
    )
    # the contract: group peak ~2*cap (+ hash variance slack); the
    # old own-only count gave ONE 2004-row group here
    assert sizes <= 3 * cap, sizes
    # (2) the co-salted planted pair survives sub-blocking
    got = editdist_pairs(docs, max_dist=8, max_band_docs=cap).collect()
    pairs = {(r["lo"], r["hi"]) for r in got}
    assert (min(pair_ids), max(pair_ids)) in pairs
    # (3) never invents pairs: subset of the exact uncapped run
    exact = {
        (r["lo"], r["hi"])
        for r in editdist_pairs(docs, max_dist=8, max_band_docs=None).collect()
    }
    assert pairs <= exact


def test_editdist_qgram_prefilter_is_lossless(spark, tables):
    """The r6 byte-trigram histogram prefilter is an EXACT bound
    (lev <= d implies bucketed trigram L1 <= 12d, 6d both-ASCII),
    so switching it on changes nothing — (lo, hi, dist) identical —
    at every cap, including the salted path, and including
    multi-byte (non-ASCII) text where the looser bound applies."""
    from whatdropsnow_etl_spark.operators import editdist_pairs

    docs = tables["documents"].select("doc_id", "text", "lang", "n_chars")
    for kwargs in ({}, {"max_band_docs": 5}):
        on = {
            tuple(r)
            for r in editdist_pairs(docs, max_dist=8, **kwargs).collect()
        }
        off = {
            tuple(r)
            for r in editdist_pairs(
                docs, max_dist=8, qgram_prefilter=False, **kwargs
            ).collect()
        }
        assert on == off, kwargs
    # non-ASCII: accented twins within distance must survive the
    # 12d bound (one char edit = up to 2 UTF-8 bytes here)
    rows = [
        (1, "café au lait avec du sucre brun " * 3, "fr", 93),
        (2, "cafè au lait avec du sucre brun " * 3, "fr", 93),
        (3, "voiture rouge très rapide sur la route " * 2, "fr", 80),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    got = {
        (r["lo"], r["hi"])
        for r in editdist_pairs(df, max_dist=8).collect()
    }
    assert (1, 2) in got and (1, 3) not in got


def test_kmv_merge_rollup_equals_direct_sketch(spark):
    """The mergeability contract: per-day sketches merged up to
    event_type give the SAME estimates as sketching the whole table
    directly — KMV registers are hash values, so union + re-truncate
    is identical to the one-shot sketch. k is set well below the
    distinct-user count so the (k-1)/u_k estimate path (not the
    exact-below-k path) is the one being compared."""
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators import (
        kmv_count_distinct,
        kmv_merge_rollup,
        kmv_registers,
    )
    from whatdropsnow_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    k = 32
    daily = kmv_registers(ev, ["event_type", "day"], "user_id", k=k)
    merged = kmv_merge_rollup(daily, ["event_type"], k=k)
    direct = kmv_count_distinct(ev, ["event_type"], "user_id", k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # two-level composition: the same merge over a re-sliced register
    # table gives the same answer again (rollups compose losslessly)
    two_level = kmv_merge_rollup(
        daily.withColumn("month", F.trunc("day", "month")).select(
            "event_type", "month", "__u"
        ),
        ["event_type"],
        k=k,
    )
    assert sorted(map(tuple, two_level.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_merge_rollup_equals_direct_sketch(spark):
    """MAX(rho) per register position IS the HLL merge: per-day
    register tables merged up to event_type estimate identically to
    sketching the whole table in one shot."""
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators import (
        hll_count_distinct,
        hll_merge_rollup,
        hll_registers,
    )
    from whatdropsnow_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_registers(ev, ["event_type", "day"], "user_id", p=8)
    merged = hll_merge_rollup(daily, ["event_type"], p=8)
    direct = hll_count_distinct(ev, ["event_type"], "user_id", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
