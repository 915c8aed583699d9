"""Event-analytics operators: funnel, retention, robust outliers,
cross-source dup rates, length histogram."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, v) for i, (ts, u, t, v) in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_event_funnel_orders_strictly(spark):
    from whatdropsnow_etl_spark.operators import event_funnel

    rows = [
        # user 1 completes all three stages in order
        ("2024-01-01 10:00:00", 1, "signup", 1.0),
        ("2024-01-01 11:00:00", 1, "click", 1.0),
        ("2024-01-01 12:00:00", 1, "purchase", 1.0),
        # user 2 clicked BEFORE signing up — stage 2 not reached
        ("2024-01-01 09:00:00", 2, "click", 1.0),
        ("2024-01-01 10:00:00", 2, "signup", 1.0),
        # user 3 skipped click — purchase doesn't count
        ("2024-01-01 10:00:00", 3, "signup", 1.0),
        ("2024-01-01 11:00:00", 3, "purchase", 1.0),
        # user 4 never signed up
        ("2024-01-01 10:00:00", 4, "click", 1.0),
        ("2024-01-01 11:00:00", 4, "purchase", 1.0),
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in event_funnel(_events(spark, rows)).collect()
    }
    assert got == {"signup": 3, "click": 1, "purchase": 1}


def test_retention_cohorts_counts_distinct_users(spark):
    from whatdropsnow_etl_spark.operators import retention_cohorts

    rows = [
        # users 1,2 first seen in week 0 (1970-01-01 is a bucket start)
        ("1970-01-01 10:00:00", 1, "view", 1.0),
        ("1970-01-02 10:00:00", 2, "view", 1.0),
        # user 1 returns in week 1 twice (distinct per cell)
        ("1970-01-08 10:00:00", 1, "view", 1.0),
        ("1970-01-09 10:00:00", 1, "view", 1.0),
        # user 3 first seen in week 1, returns week 2
        ("1970-01-10 10:00:00", 3, "view", 1.0),
        ("1970-01-15 10:00:00", 3, "view", 1.0),
    ]
    got = {
        (r["cohort_day"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (7, 0): 1, (7, 1): 1}


def test_numeric_outliers_flags_extremes(spark):
    from whatdropsnow_etl_spark.operators import numeric_outliers

    vals = [10.0] * 5 + [11.0] * 5 + [9.0] * 4 + [1000.0]  # one outlier
    rows = [("2024-01-01 10:00:00", i, "buy", v) for i, v in enumerate(vals)]
    r = numeric_outliers(_events(spark, rows)).collect()[0]
    assert r["n"] == 15
    assert r["median_cents"] == 1000  # median of cents
    assert r["mad_cents"] == 100
    assert r["lo_cents"] == 500 and r["hi_cents"] == 1500
    assert r["n_outliers"] == 1  # only the 1000.0 value


def test_dup_rate_by_source_partitions_pairs(spark, tables):
    from whatdropsnow_etl_spark.operators import (
        dup_rate_by_source,
        minhash_lsh_pairs,
    )

    docs = tables["documents"]
    pairs = minhash_lsh_pairs(docs)
    rates = dup_rate_by_source(docs, pairs).collect()
    # every candidate pair lands in exactly one (source, source) cell
    assert sum(r["n_pairs"] for r in rates) == pairs.count()
    assert all(r["source_a"] <= r["source_b"] for r in rates)


def test_length_histogram_shares_sum_to_one(spark, tables):
    from whatdropsnow_etl_spark.operators import length_histogram

    docs = tables["documents"]
    hist = length_histogram(docs).collect()
    by_source: dict[str, float] = {}
    n_docs = 0
    for r in hist:
        assert r["bucket_lo"] % 16 == 0
        by_source[r["source"]] = by_source.get(r["source"], 0.0) + r["frac_docs"]
        n_docs += r["n_docs"]
    assert n_docs == docs.count()
    for src, frac in by_source.items():
        assert abs(frac - 1.0) < 1e-9, src


def test_event_transitions_counts_and_probs(spark):
    """Hand-checkable transition matrix: per-user consecutive pairs
    only, probabilities normalize per prev_type."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a
        (1, 1, t0, "a"), (2, 1, t0 + dt.timedelta(minutes=1), "b"),
        (3, 1, t0 + dt.timedelta(minutes=2), "a"),
        # user 2: a -> a
        (4, 2, t0, "a"), (5, 2, t0 + dt.timedelta(minutes=1), "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p"])
        for r in event_transitions(ev).collect()
    }
    # transitions: (a,b) x1, (b,a) x1, (a,a) x1 -> from 'a': b .5, a .5
    assert out[("a", "b")] == (1, 0.5)
    assert out[("a", "a")] == (1, 0.5)
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 3


def test_event_transitions_tiebreak_same_ts(spark):
    """Two events at the identical timestamp order by event_id, so
    the transition direction is deterministic."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(2, 1, t0, "late"), (1, 1, t0, "early")],
        "event_id bigint, user_id bigint, ts timestamp, event_type string",
    )
    out = [(r["prev_type"], r["next_type"]) for r in event_transitions(ev).collect()]
    assert out == [("early", "late")]


def test_funnel_latency_hand_case(spark):
    """Two users convert signup->click at 60s and 120s; one goes on
    to purchase 30s later. Type-1 quantiles over {60s, 120s}: BOTH
    p50 and p90 pick rank floor(p*(n-1))+1 = 1 -> 60s (the lower
    type-1 value; no interpolation)."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import funnel_latency

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "signup"),
        (2, 1, t0 + dt.timedelta(seconds=60), "click"),
        (3, 1, t0 + dt.timedelta(seconds=90), "purchase"),
        (4, 2, t0, "signup"),
        (5, 2, t0 + dt.timedelta(seconds=120), "click"),
        (6, 3, t0, "signup"),  # never converts
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = {
        (r["stage_from"], r["stage_to"]): r for r in funnel_latency(ev).collect()
    }
    sc = out[("signup", "click")]
    assert sc["n_users"] == 2
    assert sc["p50_us"] == 60_000_000 and sc["p90_us"] == 60_000_000
    cp = out[("click", "purchase")]
    assert cp["n_users"] == 1
    assert cp["p50_us"] == cp["p90_us"] == 30_000_000


def test_sliding_window_membership(spark):
    """An event at minute 40 of an hour lands in exactly 4 sliding
    windows (1h window, 15m slide) whose starts cover (ts-1h, ts]."""
    import datetime as dt

    from whatdropsnow_etl_spark.plans.olap import sliding_window_agg

    ts = dt.datetime(2024, 1, 1, 10, 40, 0)
    ev = spark.createDataFrame(
        [(1, ts, 1, "click", 2.0)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    rows = sliding_window_agg(ev).collect()
    assert len(rows) == 4
    starts = sorted(r["win_start_us"] for r in rows)
    us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    want = [((us // 900_000_000) - k) * 900_000_000 for k in range(3, -1, -1)]
    assert starts == want
    assert all(r["n_events"] == 1 and r["sum_value"] == 2.0 for r in rows)


def test_freshness_report_lag(spark):
    """Lag is measured against the freshest group; the freshest
    group itself reports 0."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import freshness_report

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, 1, t0, "live"),
            (2, 1, t0 + dt.timedelta(hours=2), "live"),
            (3, 2, t0, "stale"),
        ],
        "event_id bigint, user_id bigint, ts timestamp, event_type string",
    )
    out = {r["event_type"]: r for r in freshness_report(ev).collect()}
    assert out["live"]["lag_us"] == 0 and out["live"]["n_rows"] == 2
    assert out["stale"]["lag_us"] == 2 * 3600 * 1_000_000


def test_daily_active_users_rollup(spark):
    """Subtotal (type NULL) counts distinct users across types; no
    grand-total row leaks through."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import daily_active_users

    d1 = dt.datetime(2024, 1, 1, 10)
    rows = [
        (1, 1, d1, "a"), (2, 1, d1, "b"),   # user 1, two types
        (3, 2, d1, "a"),
        (4, 3, d1 + dt.timedelta(days=1), "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = {(str(r["day"]), r["event_type"]): (r["n_users"], r["n_events"])
           for r in daily_active_users(ev).collect()}
    assert out[("2024-01-01", None)] == (2, 3)   # users 1,2 over 3 events
    assert out[("2024-01-01", "a")] == (2, 2)
    assert out[("2024-01-01", "b")] == (1, 1)
    assert out[("2024-01-02", None)] == (1, 1)
    assert (None, None) not in {(d, t) for d, t in out}  # no grand total


def test_value_histogram_bins(spark):
    """Bin edges are exact at boundaries: value 50.0 goes to bin 1
    (lo-inclusive), 49.99 stays in bin 0; negatives floor down."""
    ev = spark.createDataFrame(
        [(1, 49.99), (2, 50.0), (3, 0.0), (4, -0.01)],
        "event_id bigint, value double",
    )
    from whatdropsnow_etl_spark.operators import value_histogram

    out = {r["bin_id"]: r for r in value_histogram(ev).collect()}
    assert out[0]["n"] == 2 and out[0]["lo"] == 0.0 and out[0]["hi"] == 50.0
    assert out[1]["n"] == 1 and out[1]["lo"] == 50.0
    assert out[-1]["n"] == 1 and out[-1]["lo"] == -50.0


def test_event_rate_spikes_densified_trailing(spark):
    """A burst after a quiet period flags; the quiet hours count as
    zeros in the trailing mean (densified spine); buckets without a
    full trailing window never flag."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import event_rate_spikes

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hours 0..23: 1 event each (baseline); hour 24: silent;
    # hour 30: 10-event burst
    for h in range(24):
        eid += 1
        rows.append((eid, 1, t0 + dt.timedelta(hours=h), "a"))
    for i in range(10):
        eid += 1
        rows.append((eid, 1, t0 + dt.timedelta(hours=30, minutes=i), "a"))
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = event_rate_spikes(ev, trailing=24, threshold_x=2.0).collect()
    spikes = {r["hour_start_us"]: r for r in out}
    burst_us = int(
        (t0 + dt.timedelta(hours=30)).replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    assert burst_us in spikes
    r = spikes[burst_us]
    # trailing 24h before hour 30: hours 6..23 have 1 event (18), 24..29 zero
    assert r["n_events"] == 10 and r["trailing_mean"] == 0.75
    # nothing inside the first 24 hours can flag (no full window)
    assert all(
        hs >= burst_us - 6 * 3_600_000_000 for hs in spikes
    )


def test_funnel_within_deadline(spark):
    """A user converting after the deadline counts in the unbounded
    funnel but NOT in the bounded one."""
    import datetime as dt

    from whatdropsnow_etl_spark.operators import event_funnel, funnel_within

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "signup"),
        (2, 1, t0 + dt.timedelta(hours=2), "click"),      # in time
        (3, 2, t0, "signup"),
        (4, 2, t0 + dt.timedelta(days=3), "click"),       # too late
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    bounded = {r["stage"]: r["n_users"] for r in
               funnel_within(ev, within="24 hours").collect()}
    unbounded = {r["stage"]: r["n_users"] for r in event_funnel(ev).collect()}
    assert unbounded["click"] == 2
    assert bounded["click"] == 1
    assert bounded["signup"] == 2


def test_trend_report_hand_slope(spark):
    from whatdropsnow_etl_spark.operators import trend_report

    # type "a": 1 event on day 0, 2 on day 1, 3 on day 2 -> exact
    # slope 1 event/day: num = 3*8 - 3*6 = 6, den = 3*5 - 9 = 6.
    # type "b": a single day -> den = 0 (undefined slope, emitted).
    rows = []
    for day, n in [(1, 1), (2, 2), (3, 3)]:
        rows += [(f"2024-01-0{day} 10:00:0{i}", 7, "a", 1.0) for i in range(n)]
    rows.append(("2024-01-05 10:00:00", 7, "b", 1.0))
    got = {r["event_type"]: r for r in trend_report(_events(spark, rows)).collect()}
    a = got["a"]
    assert (a["n_days"], a["sum_count"]) == (3, 6)
    assert (a["slope_num"], a["slope_den"]) == (6, 6)
    b = got["b"]
    assert (b["n_days"], b["slope_num"], b["slope_den"]) == (1, 0, 0)


def test_trend_report_anchor_invariance(spark):
    from whatdropsnow_etl_spark.operators import trend_report

    rows = [
        ("2024-01-01 10:00:00", 1, "a", 1.0),
        ("2024-01-02 10:00:00", 1, "a", 1.0),
        ("2024-01-02 11:00:00", 1, "a", 1.0),
        ("2024-01-04 10:00:00", 1, "a", 1.0),
    ]
    shifted = [(ts.replace("2024-01", "2024-03"), u, t, v) for ts, u, t, v in rows]
    [r1] = trend_report(_events(spark, rows)).collect()
    [r2] = trend_report(_events(spark, shifted)).collect()
    # re-anchoring makes the slope depend only on the day OFFSETS
    assert (r1["slope_num"], r1["slope_den"]) == (r2["slope_num"], r2["slope_den"])


def test_top_event_paths_windows_and_users(spark):
    from whatdropsnow_etl_spark.operators import top_event_paths

    rows = [
        # user 1: a b c d -> paths "a>b>c", "b>c>d"
        ("2024-01-01 10:00:00", 1, "a", 1.0),
        ("2024-01-01 10:01:00", 1, "b", 1.0),
        ("2024-01-01 10:02:00", 1, "c", 1.0),
        ("2024-01-01 10:03:00", 1, "d", 1.0),
        # user 2: a b c -> "a>b>c" again (distinct user)
        ("2024-01-01 11:00:00", 2, "a", 1.0),
        ("2024-01-01 11:01:00", 2, "b", 1.0),
        ("2024-01-01 11:02:00", 2, "c", 1.0),
        # user 3: too short for any length-3 path
        ("2024-01-01 12:00:00", 3, "a", 1.0),
        ("2024-01-01 12:01:00", 3, "b", 1.0),
    ]
    got = {
        r["path"]: (r["n"], r["n_users"])
        for r in top_event_paths(_events(spark, rows)).collect()
    }
    assert got == {"a > b > c": (2, 2), "b > c > d": (1, 1)}


def test_top_event_paths_never_crosses_users(spark):
    from whatdropsnow_etl_spark.operators import top_event_paths

    # consecutive global rows but different users: no window forms
    rows = [
        ("2024-01-01 10:00:00", 1, "a", 1.0),
        ("2024-01-01 10:01:00", 2, "b", 1.0),
        ("2024-01-01 10:02:00", 3, "c", 1.0),
    ]
    assert top_event_paths(_events(spark, rows)).collect() == []


def test_last_touch_attribution_semantics(spark):
    from whatdropsnow_etl_spark.operators import last_touch_attribution

    rows = [
        # user 1: click then purchase next day -> credited to click
        ("2024-01-01 10:00:00", 1, "click", 0.0),
        ("2024-01-02 10:00:00", 1, "purchase", 10.0),
        # user 2: view 10 days before purchase -> outside 7d -> direct
        ("2024-01-01 10:00:00", 2, "view", 0.0),
        ("2024-01-11 10:00:00", 2, "purchase", 5.0),
        # user 3: purchase with NO prior event at all -> direct
        ("2024-01-05 10:00:00", 3, "purchase", 2.5),
        # user 4: a prior PURCHASE never credits itself; the view
        # before it does (last non-conversion touch wins)
        ("2024-01-03 09:00:00", 4, "view", 0.0),
        ("2024-01-03 10:00:00", 4, "purchase", 1.0),
        ("2024-01-04 10:00:00", 4, "purchase", 2.0),
    ]
    out = {
        r["touch_type"]: (r["n_conversions"], r["total_value"])
        for r in last_touch_attribution(_events(spark, rows)).collect()
    }
    assert out == {
        "click": (1, 10.0),
        "direct": (2, 7.5),
        "view": (2, 3.0),
    }


def test_hourly_acf_hand_computed(spark):
    from whatdropsnow_etl_spark.operators import hourly_acf

    # one event per hour -> hourly series in cents: 100, 200, 300, 400
    rows = [
        ("2024-01-01 00:30:00", 1, "click", 1.0),
        ("2024-01-01 01:30:00", 1, "click", 2.0),
        ("2024-01-01 02:30:00", 1, "click", 3.0),
        ("2024-01-01 03:30:00", 1, "click", 4.0),
    ]
    out = {
        r["lag"]: r
        for r in hourly_acf(_events(spark, rows), lags=2).collect()
    }
    # lag 1 pairs: x=(200,300,400), y=(100,200,300)  [cents]
    # n=3 sx=900 sy=600 sxy=200_000 sxx=290_000 syy=140_000
    r1 = out[1]
    assert r1["n_pairs"] == 3
    assert int(r1["cov_num"]) == 3 * 200_000 - 900 * 600
    assert int(r1["varx_num"]) == 3 * 290_000 - 900 * 900
    assert int(r1["vary_num"]) == 3 * 140_000 - 600 * 600
    # a perfectly linear series has ACF exactly 1 at every lag
    import math

    acf1 = int(r1["cov_num"]) / math.sqrt(
        int(r1["varx_num"]) * int(r1["vary_num"])
    )
    assert abs(acf1 - 1.0) < 1e-12


def test_hourly_acf_constant_series_zero_variance(spark):
    from whatdropsnow_etl_spark.operators import hourly_acf

    rows = [
        ("2024-01-01 00:30:00", 1, "view", 5.0),
        ("2024-01-01 01:30:00", 1, "view", 5.0),
        ("2024-01-01 02:30:00", 1, "view", 5.0),
    ]
    out = {
        r["lag"]: r for r in hourly_acf(_events(spark, rows), lags=1).collect()
    }
    r1 = out[1]
    # constant series: variance terms are '0' strings, never NULL
    assert r1["varx_num"] == "0" and r1["vary_num"] == "0"
    assert r1["cov_num"] == "0"
    assert r1["n_pairs"] == 2


def test_densify_hours_fills_gaps(spark):
    from whatdropsnow_etl_spark.operators import densify_hours

    rows = [
        ("2024-01-01 00:10:00", 1, "click", 1.0),
        # hour 01 empty for click
        ("2024-01-01 02:10:00", 1, "click", 2.0),
        ("2024-01-01 02:20:00", 2, "click", 3.0),
        # 'view' only ever at hour 00 -> hours 01, 02 zero-filled
        ("2024-01-01 00:30:00", 3, "view", 4.0),
    ]
    out = {
        (r["event_type"], r["hour_us"]): (r["n_events"], r["sum_value"])
        for r in densify_hours(_events(spark, rows)).collect()
    }
    h0 = 1704067200000000  # 2024-01-01 00:00 UTC in micros
    hour = 3600 * 1_000_000
    # full grid: 2 types x 3 hours
    assert len(out) == 6
    assert out[("click", h0)] == (1, 1.0)
    assert out[("click", h0 + hour)] == (0, 0.0)
    assert out[("click", h0 + 2 * hour)] == (2, 5.0)
    assert out[("view", h0)] == (1, 4.0)
    assert out[("view", h0 + hour)] == (0, 0.0)
    assert out[("view", h0 + 2 * hour)] == (0, 0.0)


def test_profile_events_hyphenated_column_name(spark):
    """The stack() expression backtick-quotes generated references, so
    a column name that is not a bare identifier profiles instead of
    parsing as subtraction or failing."""
    from whatdropsnow_etl_spark.operators.integrity import (
        profile_numeric_columns,
    )

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], ["unit-price"]
    )
    [r] = profile_numeric_columns(df, ["unit-price"]).collect()
    assert r["column"] == "unit-price"
    assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (3, 1, 2)
    assert r["min_v"] == 1.0 and r["max_v"] == 2.0
