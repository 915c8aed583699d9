"""Semantic invariants for the relational core operators (sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.operators import (
    filter_out_recently_added,
    fk_integrity_report,
    ilike_search,
    latest_wins,
    moving_avg,
    paginate,
    sessionize,
    topn_per_group,
)
from whatdropsnow_etl_spark.operators.integrity import valid_only
from whatdropsnow_etl_spark.operators.pagination import paginate_after


def test_latest_wins_unique_keys(tables):
    out = latest_wins(
        tables["events"],
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    n_keys = out.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys
    # the kept row carries the max ts of its group
    mx = tables["events"].groupBy("user_id", "event_type").agg(F.max("ts").alias("mx"))
    joined = out.join(mx, ["user_id", "event_type"])
    assert joined.where(F.col("ts") != F.col("mx")).count() == 0


def test_incremental_antijoin_disjoint(tables):
    ev = tables["events"]
    out = filter_out_recently_added(ev, ev, ["user_id", "event_type"], "ts", "12 HOURS")
    cutoff = ev.agg(F.expr("max(ts) - INTERVAL 12 HOURS").alias("c")).collect()[0][0]
    recent = (
        ev.where(F.col("ts") > F.lit(cutoff))
        .select("user_id", "event_type")
        .distinct()
    )
    assert out.join(recent, ["user_id", "event_type"], "inner").count() == 0
    assert out.count() + recent.count() == (
        ev.select("user_id", "event_type").distinct().count()
    )


def test_fk_integrity_counts_partition(tables):
    present = tables["part"].where(F.col("p_partkey") % 7 != 0)
    rep = fk_integrity_report(
        tables["lineitem"], present, "l_partkey", "p_partkey", "l_returnflag"
    )
    row = rep.agg(
        F.sum("n_total").alias("t"), F.sum("n_valid").alias("v"), F.sum("n_orphan").alias("o")
    ).collect()[0]
    assert row["t"] == tables["lineitem"].count()
    assert row["v"] + row["o"] == row["t"]
    assert row["o"] > 0  # the %7 filter really removed parents
    assert valid_only(tables["lineitem"], present, "l_partkey", "p_partkey").count() == row["v"]


def test_paginate_disjoint_and_ordered(tables):
    ev = tables["events"].select("event_id")
    p1 = {r[0] for r in paginate(ev, ["event_id"], 1, 50).collect()}
    p2 = {r[0] for r in paginate(ev, ["event_id"], 2, 50).collect()}
    assert len(p1) == 50 and len(p2) == 50 and not (p1 & p2)
    assert max(p1) < min(p2)
    # cursor pagination agrees with offset pagination
    c2 = {r[0] for r in paginate_after(ev, "event_id", max(p1), 50).collect()}
    assert c2 == p2


def test_ilike_search_matches(tables):
    out = ilike_search(tables["part"], "p_name", "RED")
    assert out.count() > 0
    assert out.where(~F.lower("p_name").contains("red")).count() == 0


def test_topn_per_group_bound(tables):
    out = topn_per_group(tables["part"], "p_brand", "p_retailprice", "p_partkey", 3)
    per_group = out.groupBy("p_brand").count()
    assert per_group.where(F.col("count") > 3).count() == 0


def test_moving_avg_bounds(tables):
    out = moving_avg(tables["events"], "user_id", "ts", "event_id", "value", 3)
    bad = out.where(
        (F.col("mov_avg") < tables["events"].agg(F.min("value")).collect()[0][0])
        | (F.col("mov_avg") > tables["events"].agg(F.max("value")).collect()[0][0])
    )
    assert bad.count() == 0


def test_sessionize_invariants(tables):
    out = sessionize(tables["events"], "user_id", "ts", "event_id", "value")
    assert out.where(F.col("session_end_us") < F.col("session_start_us")).count() == 0
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == tables["events"].count()
    # sessions of one user never overlap: start of session n+1 is
    # strictly after end of session n
    w_ok = out.alias("a").join(
        out.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.session_seq") + 1 == F.col("b.session_seq"))
        & (F.col("b.session_start_us") <= F.col("a.session_end_us")),
    )
    assert w_ok.count() == 0


def test_salted_groupby_sum_equals_plain(tables):
    from whatdropsnow_etl_spark.operators import salted_groupby_sum
    from whatdropsnow_etl_spark.functions.money import money

    ev = tables["events"].select("event_type", "value")
    salted = salted_groupby_sum(
        ev,
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            "sv": F.sum(money("value")),
        },
        n_salts=8,
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(money("value")).alias("sv")
    )
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b


def test_salted_join_equals_plain(tables):
    from whatdropsnow_etl_spark.operators import salted_join

    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice")
    ords = tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, ords, ["l_orderkey"], n_salts=4)
    plain = li.join(ords, ["l_orderkey"])
    assert salted.count() == plain.count()
    a = sorted([tuple(r) for r in salted.collect()], key=repr)
    b = sorted([tuple(r) for r in plain.collect()], key=repr)
    assert a == b


def test_asof_join_semantics(spark):
    from whatdropsnow_etl_spark.operators import asof_join

    def ts(s):
        return F.lit(s).cast("timestamp")

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00"),
         (3, "2024-01-01 09:00:00"), (4, "2024-01-02 10:00:00")],
        "id long, t string",
    ).select("id", F.col("t").cast("timestamp").alias("ts"), F.lit(7).alias("k"))
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", 100.0), ("2024-01-01 11:00:00", 200.0)],
        "t string, price double",
    ).select(F.col("t").cast("timestamp").alias("ts"), "price", F.lit(7).alias("k"))

    def run(**kw):
        rows = asof_join(
            left, right, ts_col="ts", by_cols=["k"], value_cols=["price"], **kw
        ).collect()
        return {r["id"]: (r["price"], r["matched_ts_us"] is not None) for r in rows}

    back = run()
    # tie at 10:00 matches; 09:00 has no earlier right row; 12:00
    # takes the 11:00 quote; next-day still matches backward
    assert back[1] == (100.0, True)
    assert back[2] == (200.0, True)
    assert back[3] == (None, False)
    assert back[4] == (200.0, True)

    fwd = run(direction="forward")
    assert fwd[1] == (100.0, True)  # ties match forward too
    assert fwd[3] == (100.0, True)  # 09:00 -> next quote at 10:00
    assert fwd[2] == (None, False)  # nothing after 12:00
    assert fwd[4] == (None, False)

    tol = run(tolerance_us=3600 * 1_000_000)
    assert tol[2] == (200.0, True)  # 12:00 - 11:00 = exactly 1h
    assert tol[4] == (None, False)  # next day: out of tolerance

    near = run(direction="nearest")
    assert near[1] == (100.0, True)  # exact tie -> dist 0 both ways
    assert near[3] == (100.0, True)  # 09:00: only forward exists
    assert near[2] == (200.0, True)  # 12:00: only backward exists
    assert near[4] == (200.0, True)  # next day: backward, no tolerance

    # tolerance excludes the far next-day backward match
    near_tol = run(direction="nearest", tolerance_us=3600 * 1_000_000)
    assert near_tol[4] == (None, False)


def test_asof_join_nearest_prefers_closer_and_ties_backward(spark):
    from whatdropsnow_etl_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:30:00")],
        "id long, t string",
    ).select("id", F.col("t").cast("timestamp").alias("ts"), F.lit(7).alias("k"))
    right = spark.createDataFrame(
        # 09:50 is 10 min before left#1; 10:25 is 25 min after it but
        # only 5 min before left#2; 10:35 is 5 min after left#2 (tie)
        [("2024-01-01 09:50:00", 1.0), ("2024-01-01 10:25:00", 2.0),
         ("2024-01-01 10:35:00", 3.0)],
        "t string, price double",
    ).select(F.col("t").cast("timestamp").alias("ts"), "price", F.lit(7).alias("k"))
    got = {
        r["id"]: r["price"]
        for r in asof_join(
            left, right, ts_col="ts", by_cols=["k"], value_cols=["price"],
            direction="nearest",
        ).collect()
    }
    assert got[1] == 1.0  # 10 min back beats 25 min forward
    assert got[2] == 2.0  # 5-min tie both ways -> backward wins


def test_asof_join_respects_keys(spark):
    from whatdropsnow_etl_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 2, "2024-01-01 10:00:00")],
        "id long, k long, t string",
    ).select("id", "k", F.col("t").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0)], "k long, t string, v double"
    ).select("k", F.col("t").cast("timestamp").alias("ts"), "v")
    got = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, ts_col="ts", by_cols=["k"], value_cols=["v"]
        ).collect()
    }
    assert got == {1: 5.0, 2: None}  # key 2 never sees key 1's rows


def test_bucketed_tables_join_without_shuffle(spark, tables):
    """Bucketed writes are the co-located-join scale knob (SURVEY §6):
    both fact tables bucketed on the join key join with ZERO exchange
    in the plan — at 100 TB that's the difference between a full
    network shuffle of the big side and a local merge."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            tables["orders"]
            .select("o_orderkey", "o_totalprice")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("b_orders")
        )
        (
            tables["lineitem"]
            .select("l_orderkey", "l_quantity")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("b_lineitem")
        )
        li, od = spark.table("b_lineitem"), spark.table("b_orders")
        joined = li.join(od, li.l_orderkey == od.o_orderkey).select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it actually computes
        assert joined.count() == tables["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_splits_skewed_join_partitions(spark):
    """With skew-join thresholds scaled to test data, AQE detects the
    hot key at runtime and splits its partition (skew=true in the
    executed SortMergeJoin) — the runtime complement to the explicit
    salting in operators/skew.py."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 60_000).selectExpr(
            # one hot key (0) holding ~90% of rows, the rest spread.
            # pad must be non-constant: skew detection reads
            # COMPRESSED map-output sizes, and a hot partition of
            # identical values compresses under any threshold
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 100 END AS k",
            "md5(cast(id AS string)) AS pad",
        )
        right = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
        joined = left.join(right, "k").select("k", "pad", "v")
        # collect() drives THIS DataFrame's query execution (count()
        # would execute a separate plan and leave this one unrun)
        assert len(joined.collect()) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not mark the skewed join"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_native_session_window_matches_custom_sessionize(spark, tables):
    """Spark's built-in session_window and the lag/cumsum islands
    sessionize must agree on every session boundary (same gap, real
    timestamps — exact-gap boundary semantics differ only at
    diff == gap, which microsecond data never hits)."""
    from whatdropsnow_etl_spark.operators import sessionize
    from whatdropsnow_etl_spark.plans.olap import session_window_native

    events = tables["events"]
    native = {
        (r["user_id"], r["session_start_us"], r["n_events"], r["sum_value"])
        for r in session_window_native(events, gap="30 minutes").collect()
    }
    custom = {
        (r["user_id"], r["session_start_us"], r["n_events"], r["sum_value"])
        for r in sessionize(
            events, "user_id", "ts", "event_id", "value", gap="30 MINUTES"
        ).collect()
    }
    assert len(native) > 0
    assert native == custom


def test_fixed_size_sample_deterministic(tables):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators import fixed_size_sample

    docs = tables["documents"]
    a = fixed_size_sample(docs, n=20).collect()
    b = fixed_size_sample(docs, n=20).collect()
    assert len(a) == 20 and sorted(a) == sorted(b)
    # nested: the 10-sample is a prefix-subset of the 20-sample
    small = {r["doc_id"] for r in fixed_size_sample(docs, n=10).collect()}
    big = {r["doc_id"] for r in a}
    assert small <= big
    # n larger than the corpus returns everything
    assert fixed_size_sample(docs, n=10**9).count() == docs.count()


def test_rollup_state_merge_equals_full(tables):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators.incremental import (
        merge_rollup_states,
        rollup_report,
        rollup_state,
    )

    ev = tables["events"]
    keys = ["event_type"]
    full = rollup_report(rollup_state(ev, keys), keys)
    # three arbitrary disjoint slices merge to the identical report
    parts = [
        rollup_state(ev.where(F.col("event_id") % 3 == i), keys)
        for i in range(3)
    ]
    merged = rollup_report(merge_rollup_states(parts, keys), keys)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b
    # merge order is immaterial (associativity via exact sums)
    merged2 = rollup_report(
        merge_rollup_states([parts[2], parts[0], parts[1]], keys), keys
    )
    assert sorted(map(tuple, merged2.collect())) == a


def test_key_skew_report_contract(tables):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators.skew import key_skew_report

    ev = tables["events"]
    out = key_skew_report(ev, "event_type", top_k=3).collect()
    assert len(out) == 3
    # ranks are 1..3 and counts are non-increasing
    assert [r["rnk"] for r in out] != [] and sorted(r["rnk"] for r in out) == [1, 2, 3]
    ordered = sorted(out, key=lambda r: r["rnk"])
    assert all(
        ordered[i]["n"] >= ordered[i + 1]["n"] for i in range(len(ordered) - 1)
    )
    # cum_share is the running sum of share (to rounding) and <= 1
    run = 0.0
    for r in ordered:
        run += r["n"]
        assert r["cum_share"] <= 1.0 + 1e-9
    # share denominator is the FULL corpus, not the top-k slice
    tot = ev.count()
    assert abs(ordered[0]["share"] - ordered[0]["n"] / tot) < 1e-6


def test_schema_drift_report_detects_null_surge(spark):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.operators.integrity import schema_drift_report

    old = spark.range(0, 100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    # new batch: v goes 50% NULL and collapses to 2 distinct values
    new = spark.range(0, 100).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN CAST(id % 2 AS DOUBLE) END AS v"
    )
    rep = {r["column"]: r for r in schema_drift_report(old, new, ["id", "v"]).collect()}
    assert rep["id"]["null_rate_delta"] == 0.0
    assert rep["v"]["null_rate_delta"] == 0.5
    assert rep["v"]["new_distinct"] == 1  # only 0.0 survives the CASE
    assert rep["id"]["distinct_ratio"] == 1.0


def test_snapshot_diff_classification(spark):
    from whatdropsnow_etl_spark.operators import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k bigint, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, None), (5, 50.0)],
        "k bigint, v double",
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL == NULL under eqNullSafe
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_null_vs_value_is_changed(spark):
    from whatdropsnow_etl_spark.operators import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k bigint, v double")
    new = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    [r] = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert r["status"] == "changed"


def test_snapshot_diff_null_key_matches_itself(spark):
    # A NULL-keyed row must diff against its counterpart (eqNullSafe
    # key join), not double-report as added+removed.
    from whatdropsnow_etl_spark.operators import snapshot_diff

    old = spark.createDataFrame([(None, 1.0), (2, 2.0)], "k bigint, v double")
    new = spark.createDataFrame([(None, 9.0), (2, 2.0)], "k bigint, v double")
    rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert len(rows) == 2
    got = {r["k"]: r["status"] for r in rows}
    assert got == {None: "changed", 2: "unchanged"}


def test_join_cardinality_report_predicts_output(spark):
    from whatdropsnow_etl_spark.operators import join_cardinality_report

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k bigint"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (2,), (4,)], "k bigint"
    )
    rows = join_cardinality_report(left, right, "k", "k", top_k=5).collect()
    got = {r["join_key"]: (r["n_left"], r["n_right"], r["n_pairs"]) for r in rows}
    # keys only on one side never appear (they emit zero join rows)
    assert set(got) == {1, 2}
    assert got[1] == (3, 2, 6) and got[2] == (1, 1, 1)
    # the prediction equals the actual join output size
    actual = left.join(right, "k").count()
    assert sum(v[2] for v in got.values()) == actual


def test_dataset_fingerprint_properties(spark):
    from whatdropsnow_etl_spark.operators import dataset_fingerprint

    rows = [(1, "a"), (2, "b"), (3, None)]
    df = spark.createDataFrame(rows, "k bigint, v string")

    def fp(d):
        [r] = dataset_fingerprint(d).collect()
        return (r["n_rows"], r["xor_hash"], r["sum_hash"])

    base = fp(df)
    # order/partitioning-insensitive
    assert fp(df.orderBy(F.col("k").desc()).repartition(7)) == base
    # any row change moves it
    assert fp(spark.createDataFrame([(1, "a"), (2, "B"), (3, None)], "k bigint, v string")) != base
    # NULL vs empty string cannot collide
    assert fp(spark.createDataFrame([(1, "a"), (2, "b"), (3, "")], "k bigint, v string")) != base
    # the sum fold catches duplicate-multiplicity changes XOR misses
    dup2 = spark.createDataFrame(rows + rows, "k bigint, v string")
    n, x, s = fp(dup2)
    assert n == 6 and s != base[2]
    # prefix-coded rendering: separator-bearing values can't realign
    # across column boundaries, and a literal sentinel-like string
    # is distinguishable from NULL
    a = spark.createDataFrame([("a\x1fb", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b\x1fc")], "x string, y string")
    assert fp(a) != fp(b)
    lit_n = spark.createDataFrame([(1, "N")], "k bigint, v string")
    real_null = spark.createDataFrame([(1, None)], "k bigint, v string")
    assert fp(lit_n) != fp(real_null)


def test_asof_join_null_valued_right_row_not_chimeric(spark):
    """A right row whose VALUE is NULL must match as (its ts, NULL),
    never pair its timestamp with an older row's value."""
    from whatdropsnow_etl_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "id long, t string"
    ).select("id", F.col("t").cast("timestamp").alias("ts"), F.lit(7).alias("k"))
    right = spark.createDataFrame(
        [("2024-01-01 09:00:00", 5.0), ("2024-01-01 10:00:00", None)],
        "t string, price double",
    ).select(F.col("t").cast("timestamp").alias("ts"), "price", F.lit(7).alias("k"))
    for direction in ("backward", "nearest"):
        [r] = asof_join(
            left, right, ts_col="ts", by_cols=["k"], value_cols=["price"],
            direction=direction,
        ).collect()
        assert r["price"] is None, direction
        # matched the 10:00 row, not the 09:00 one
        assert r["matched_ts_us"] == 1704103200000000, direction


def test_zorder_key_hand_interleave(spark):
    from pyspark.sql import functions as F
    from whatdropsnow_etl_spark.functions.layout import zorder_key

    # a=0b101, b=0b011 -> z bits: a at even positions, b at odd:
    # a bits (1,0,1) -> 1<<0, 0<<2, 1<<4 ; b bits (1,1,0) -> 1<<1, 1<<3, 0<<5
    # z = 1 + 2 + 8 + 16 = 27
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    [r] = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=3).alias("z")
    ).collect()
    assert r["z"] == 27


def test_zorder_key_width_guard(spark):
    import pytest
    from pyspark.sql import functions as F
    from whatdropsnow_etl_spark.functions.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)


def test_zorder_layout_bounds_both_dims(spark):
    """On a 64x64 uniform grid every z-file must cover a narrow range
    of BOTH dimensions — the pruning property a linear sort cannot
    give (sorting by a leaves b's per-file range at full span)."""
    from whatdropsnow_etl_spark.operators import zorder_layout_report

    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_layout_report(df, "a", "b").collect()
    assert len(out) == 256
    assert sum(r["n_rows"] for r in out) == 64 * 64
    for r in out:
        # top-4 z bits per dim -> 16 cells of width 4 along each axis
        assert r["max_a"] - r["min_a"] <= 3, r
        assert r["max_b"] - r["min_b"] <= 3, r


def test_zorder_layout_degenerate_constant_dim(spark):
    from whatdropsnow_etl_spark.operators import zorder_layout_report

    rows = [(a, 7) for a in range(100)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_layout_report(df, "a", "b").collect()
    assert sum(r["n_rows"] for r in out) == 100
    # constant dim buckets to 0 everywhere; layout degrades to a
    # clean 1-D range partition on the other dim
    for r in out:
        assert r["min_b"] == r["max_b"] == 7
