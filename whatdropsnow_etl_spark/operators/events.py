"""Event-stream analytics: funnels, retention cohorts, robust outliers.

The product-analytics battery a reference user runs over the event
log once it is in an engine that can aggregate it (the reference
lands events in Postgres and stops; these are the queries that come
next). All three are pure DataFrame compositions — no UDFs, no
collects — and each has an exact DuckDB oracle twin.

Scale notes (100 TB events):
- funnel/retention shuffle on ``user_id`` (high cardinality, the
  natural key); stage-to-stage joins are co-partitioned on it so AQE
  reuses the exchange.
- outliers reuse the exact-quantile window selection
  (`quantiles.py`): one hash-partition shuffle per pass while a
  single group's rows fit an executor — the documented exact twin of
  the approx_percentile scale path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .quantiles import exact_group_quantiles


def event_funnel(
    events: DataFrame,
    stages: Sequence[str] = ("signup", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: users counted at stage i must have
    an event of stage i's type STRICTLY AFTER their stage i-1 entry
    time (first qualifying occurrence wins — re-entries don't help).

    One filtered aggregate per stage, chained by a co-partitioned
    ``user_col`` join carrying the previous stage's entry time; no
    window over all events, no per-user state. Output: one row per
    stage — (stage_idx, stage, n_users), n_users monotonically
    non-increasing.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    reached: list[DataFrame] = []
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    reached.append(cur)
    for stage in stages[1:]:
        cur = (
            events.where(F.col(type_col) == stage)
            .join(cur, user_col)
            .where(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        reached.append(cur)
    counts = None
    for i, (stage, df) in enumerate(zip(stages, reached)):
        one = df.agg(
            F.lit(i + 1).cast("bigint").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = one if counts is None else counts.unionByName(one)
    return counts


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucket by the day-bucket of
    their FIRST event (cohort); each (cohort, offset) cell counts the
    distinct users of that cohort active ``offset`` buckets later.

    Two aggregates and one co-partitioned join on ``user_col`` —
    first-seen per user, join back, distinct (cohort, offset, user),
    count. Day arithmetic is integer (epoch days / bucket_days), so
    the twin is drift-free. Output: (cohort_day, week_offset,
    n_users) with cohort_day = bucket start in epoch days.
    """
    days = F.floor(F.unix_date(F.col(ts_col).cast("date")) / bucket_days)
    firsts = (
        events.select(F.col(user_col).alias("__u"), days.alias("__b"))
        .groupBy("__u")
        .agg(F.min("__b").alias("__cohort"))
    )
    return (
        events.select(F.col(user_col).alias("__u"), days.alias("__b"))
        .join(firsts, "__u")
        .select(
            (F.col("__cohort") * bucket_days).cast("bigint").alias("cohort_day"),
            (F.col("__b") - F.col("__cohort")).cast("bigint").alias("week_offset"),
            "__u",
        )
        .distinct()
        .groupBy("cohort_day", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def numeric_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Robust per-group outlier report: median / MAD fences.

    Mean/stddev fences break exactly when outliers are present (the
    outliers inflate the fence); median ± k·MAD is the standard
    robust alternative. Both statistics are exact type-1 quantiles
    over integer cents (`exact_group_quantiles`), so the whole
    report is integer-exact and engine-portable — no float quantile
    interpolation anywhere.

    Two ranked-window passes (median, then MAD over |v - med|) and
    one final aggregate. Output per group: n, median_cents,
    mad_cents, lo_cents / hi_cents fences, n_outliers.
    """
    med = exact_group_quantiles(
        events, [group_col], value_col, ps=(0.5,), tiebreak_col=id_col,
        scale=scale,
    ).select(group_col, F.col("p50_cents").alias("median_cents"))
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    dev = (
        events.select(group_col, id_col, cents.alias("__c"))
        .join(F.broadcast(med), group_col)
        .select(
            group_col,
            id_col,
            "__c",
            "median_cents",
            F.abs(F.col("__c") - F.col("median_cents")).alias("__adev"),
        )
        .persist()
    )
    # ^ r10 perf (PERF.md r9 backlog): the deviation relation feeds
    # the MAD quantile pass AND the fence join — Catalyst does not
    # dedupe subplans, so each reference re-ran the events scan +
    # median quantile pass (~3 lineage evaluations, 13.8 s at sf1).
    # Lazy persist (the rank_correlation precedent): narrow relation
    # (group, id, cents, median, |dev|), computed once per execution.
    mad = exact_group_quantiles(
        dev, [group_col], "__adev", ps=(0.5,), tiebreak_col=id_col, scale=1
    ).select(group_col, F.col("p50_cents").alias("mad_cents"))
    fenced = dev.join(F.broadcast(mad), group_col).select(
        group_col,
        "__c",
        "median_cents",
        "mad_cents",
        (F.col("median_cents") - k * F.col("mad_cents")).alias("__lo"),
        (F.col("median_cents") + k * F.col("mad_cents")).alias("__hi"),
    )
    return fenced.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("median_cents").alias("median_cents"),
        F.max("mad_cents").alias("mad_cents"),
        F.max("__lo").alias("lo_cents"),
        F.max("__hi").alias("hi_cents"),
        F.sum(
            F.when(
                (F.col("__c") < F.col("__lo")) | (F.col("__c") > F.col("__hi")), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    )


def dup_rate_by_source(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication report: aggregate candidate near-dup
    pairs into per-(source, source) counts — which corpora duplicate
    each other (mirror detection, licensing triage, mix planning).

    ``pairs`` is any (doc_a, doc_b) relation — MinHash-LSH candidates
    in the registry query. Two joins against the narrow (id, source)
    projection (broadcast when the doc dim fits, hash otherwise) and
    one small aggregate; source pairs are unordered (lo/hi sorted).
    Output: (source_a <= source_b, n_pairs).
    """
    src = docs.select(F.col(id_col), F.col(source_col))
    a = src.select(F.col(id_col).alias("doc_a"), F.col(source_col).alias("__sa"))
    b = src.select(F.col(id_col).alias("doc_b"), F.col(source_col).alias("__sb"))
    return (
        pairs.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every (prev_type -> next_type) pair, how many
    consecutive-event transitions occurred and what share of
    prev_type's outgoing edges it is — the journey-analysis /
    next-event-prediction baseline over a product event log.

    One window per user (``lag`` over (ts, tiebreak) — parallel
    across users, the natural high-cardinality key) feeding one
    #types^2-bounded aggregate; the per-prev normalizer is a second
    window over that tiny aggregate, not over events. Deterministic
    (total per-user order via the tiebreak column), no UDFs.
    Emits (prev_type, next_type, n_transitions, p) with p rounded
    to 6 decimals.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_prev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_prev).cast("double"),
            6,
        ).alias("p"),
    )


def funnel_latency(
    events: DataFrame,
    stages: Sequence[str] = ("signup", "click", "purchase"),
    ps: Sequence[float] = (0.5, 0.9),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Stage-to-stage conversion latency quantiles: for each adjacent
    funnel step, how long converting users took — the
    time-to-convert distribution product analytics reads next to the
    funnel counts (is the drop-off a leak or just a slow step?).

    Stage entry times chain exactly like :func:`event_funnel` (first
    qualifying event STRICTLY AFTER the previous stage's entry);
    converting users' latencies in epoch-microseconds then feed
    :func:`~.quantiles.exact_group_quantiles` with scale=1 — the
    engine-exact integer type-1 rank selection, no interpolation.
    Per adjacent pair: (stage_from, stage_to, n_users, p50_us,
    p90_us). Latency relations are #converting-users-sized; the
    quantile window partitions by stage pair.
    """
    from ..functions.timeutil import ts_micros

    if len(stages) < 2:
        raise ValueError("need at least 2 stages")
    entry = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    lat_parts: list[DataFrame] = []
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.where(F.col(type_col) == stage)
            .join(entry, user_col)
            .where(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t2"), F.max("__t").alias("__t"))
        )
        lat_parts.append(
            nxt.select(
                F.lit(stages[i - 1]).alias("stage_from"),
                F.lit(stage).alias("stage_to"),
                (ts_micros(F.col("__t2")) - ts_micros(F.col("__t"))).alias(
                    "__lat_us"
                ),
            )
        )
        entry = nxt.select(user_col, F.col("__t2").alias("__t"))
    lats = lat_parts[0]
    for part in lat_parts[1:]:
        lats = lats.unionByName(part)
    q = exact_group_quantiles(
        lats, ["stage_from", "stage_to"], "__lat_us", ps=ps, scale=1
    )
    counts = lats.groupBy("stage_from", "stage_to").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    renames = {
        f"p{str(p).replace('0.', '').ljust(2, '0')}_cents":
        f"p{str(p).replace('0.', '').ljust(2, '0')}_us"
        for p in ps
    }
    out = q.join(F.broadcast(counts), ["stage_from", "stage_to"])
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.select("stage_from", "stage_to", "n_users", *renames.values())


def daily_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact distinct-user rollup: DAU per day AND per (day, type)
    in ONE grouping-sets pass — the activity report every event
    product ships, with the subtotal and the breakdown sharing a
    single scan.

    COUNT(DISTINCT user) under grouping sets is the textbook
    scale hazard: Spark plans it as an Expand (one replica per
    grouping set) + two-phase distinct aggregate, so the shuffle
    carries (day[, type], user) partial-distinct keys — never a
    driver-side set, and skew spreads over the user dimension.
    Expressed as ROLLUP(day, type) minus the grand-total row
    (grouping_id drops it pre-aggregate-output; the oracle uses the
    equivalent explicit GROUPING SETS). The subtotal row carries
    type NULL. Emits (day, event_type, n_users, n_events).
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    return (
        events.select(day, F.col(type_col), F.col(user_col))
        .rollup("day", type_col)
        .agg(
            F.countDistinct(user_col).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.grouping_id().alias("__gid"),
        )
        .where(F.col("__gid") < 3)
        .drop("__gid")
    )


def value_histogram(
    events: DataFrame,
    value_col: str = "value",
    bin_width: float = 50.0,
) -> DataFrame:
    """Equi-width numeric histogram of a metric column: fixed-width
    bins (scale-free — no global min/max pass, no NTILE global
    rank), one map-side-combined aggregate. Bin id =
    floor(value / width) on integer cents so the bin edge is exact
    in both engines (float division at a boundary like 50.0 would
    put 49.999999... cents on engine-dependent sides). Emits
    (bin_id, lo, hi, n) — lo/hi as exact cent-derived doubles.
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    width_cents = int(round(bin_width * 100))
    if width_cents <= 0:
        raise ValueError(
            f"bin_width must be >= 0.005 (one cent), got {bin_width}"
        )
    bin_id = F.floor(cents / width_cents).cast("bigint")
    return (
        events.select(bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin_id",
            (F.col("bin_id") * width_cents / 100.0).alias("lo"),
            ((F.col("bin_id") + 1) * width_cents / 100.0).alias("hi"),
            "n",
        )
    )


def event_rate_spikes(
    events: DataFrame,
    trailing: int = 24,
    threshold_x: float = 2.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Volume-spike detection per event type: hourly counts against
    the trailing-``trailing``-hour mean, flagging buckets whose rate
    exceeds ``threshold_x`` times it — the replay-storm / bot-flood
    / duplicate-ingestion monitor (the batch twin of what the drift
    sink's uniqueness gate catches online).

    The hour axis is DENSIFIED first: a types × hour-sequence spine
    (one 1-row min/max aggregate broadcast into a map-side
    sequence-explode; #types·#hours rows — calendar-sized, never
    event-sized) left-joined with the real counts, so silent hours
    correctly drag the trailing mean down instead of being skipped
    — a spike after a quiet night is a spike. Trailing mean uses
    exact integer sums divided once; buckets without a full
    trailing window never flag. Emits flagged buckets only:
    (event_type, hour_start_us, n_events, trailing_mean).
    """
    from pyspark.sql.window import Window

    from ..functions.timeutil import ts_micros

    hour_us = 3_600_000_000
    bucket = (F.floor(ts_micros(F.col(ts_col)) / hour_us) * hour_us).cast("bigint")
    counts = (
        events.select(F.col(type_col), bucket.alias("hour_start_us"))
        .groupBy(type_col, "hour_start_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # PER-TYPE bounds, rolled up from the calendar-sized counts
    # relation (no second corpus scan for the type list): a type
    # launched mid-corpus densifies only over ITS OWN life, so its
    # launch ramp isn't compared against pre-launch zero-fill (the
    # global-bounds form flagged every early hour of a new type as
    # a spike)
    bounds = counts.groupBy(type_col).agg(
        F.min("hour_start_us").alias("__lo"),
        F.max("hour_start_us").alias("__hi"),
    )
    spine = bounds.select(
        type_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(hour_us))
        ).alias("hour_start_us"),
    )
    dense = spine.join(counts, [type_col, "hour_start_us"], "left").select(
        type_col,
        "hour_start_us",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )
    w_trail = (
        Window.partitionBy(type_col)
        .orderBy("hour_start_us")
        .rowsBetween(-trailing, -1)
    )
    scored = dense.select(
        type_col,
        "hour_start_us",
        "n_events",
        F.sum("n_events").over(w_trail).alias("__tsum"),
        F.count(F.lit(1)).over(w_trail).alias("__tn"),
    )
    return (
        scored.where(
            (F.col("__tn") == trailing)
            & (
                F.col("n_events").cast("double")
                > F.lit(float(threshold_x)) * F.col("__tsum") / F.lit(float(trailing))
            )
        )
        .select(
            type_col,
            "hour_start_us",
            "n_events",
            F.round(F.col("__tsum") / F.lit(float(trailing)), 6).alias(
                "trailing_mean"
            ),
        )
    )


def funnel_within(
    events: DataFrame,
    stages: Sequence[str] = ("signup", "click", "purchase"),
    within: str = "24 hours",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Deadline-bounded conversion funnel: stage i counts only users
    whose qualifying event lands STRICTLY AFTER the previous stage's
    entry AND within ``within`` of it — the funnel variant product
    teams actually report ("converted within 24 h"), where the
    unbounded funnel overstates conversion by counting users who
    wandered back weeks later.

    Same chained per-stage aggregate shape as :func:`event_funnel`
    (one filtered aggregate + co-partitioned user join per stage, no
    corpus-wide window); the deadline is one extra predicate on the
    already-joined pair. Emits (stage_idx, stage, n_users),
    monotonically non-increasing.

    Anchoring contract — FIRST-TOUCH: each stage's entry is the
    EARLIEST qualifying event (the Amplitude-style convention, and
    what the DuckDB twin computes). This is deliberately NOT
    exists-any-compliant-chain semantics: a user whose early stage-i
    event expires the window but whose LATER stage-i event would
    have chained through is not counted ("did the user convert
    within 24 h of their first click", not "of any click"). The
    any-chain variant needs a per-user sequential scan; first-touch
    is a per-stage aggregate.
    """
    n, unit = within.split()
    _us = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    within_us = int(n) * _us[unit.rstrip("s")] * 1_000_000

    from ..functions.timeutil import ts_micros

    if not stages:
        raise ValueError("stages must be non-empty")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_micros(F.col(ts_col))).alias("__t"))
    )
    out = [(1, stages[0], cur)]
    for i, stage in enumerate(stages[1:], start=2):
        cur = (
            events.where(F.col(type_col) == stage)
            .select(F.col(user_col), ts_micros(F.col(ts_col)).alias("__e"))
            .join(cur, user_col)
            .where(
                (F.col("__e") > F.col("__t"))
                & (F.col("__e") <= F.col("__t") + F.lit(within_us))
            )
            .groupBy(user_col)
            .agg(F.min("__e").alias("__t"))
        )
        out.append((i, stage, cur))
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).cast("bigint").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("n_users"),
        )
        for idx, name, df in out
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def trend_report(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group least-squares trend of the daily event count, in
    exact integer arithmetic — "is traffic for this event type
    growing or shrinking, and how fast" without ever leaving BIGINT.

    The OLS slope over points (x=day, y=count) is
    ``(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)``; both numerator and
    denominator are integer-valued when x and y are integers, so the
    operator emits the exact fraction (``slope_num``, ``slope_den``)
    instead of a float quotient — engine-bitwise-portable, and the
    caller divides at display time. Days are re-anchored per group
    (``x = day - min(day) over group``) so the sums stay far from
    BIGINT overflow even with years of history and billions of
    events per day (x is bounded by the window span, not the epoch).

    Plan shape: one map-side day truncation, one (group, day)
    partial-aggregated count (combine before shuffle), a #groups-
    sized window for the anchor, then a #groups-row final aggregate.
    Nothing corpus-sized crosses the wire after the first combine.
    The slope sign convention: positive = growing.

    Output: (group, n_days, sum_count, slope_num, slope_den) — all
    BIGINT; slope = slope_num / slope_den (den is 0 when n_days < 2,
    emitted as-is rather than NULLed so the caller sees the
    undefined-slope case explicitly).
    """
    day = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(86400.0)
    ).cast("long")
    daily = (
        events.select(F.col(group_col).alias("grp"), day.alias("__day"))
        .groupBy("grp", "__day")
        .agg(F.count(F.lit(1)).alias("__y"))
    )
    w = Window.partitionBy("grp")
    anchored = daily.withColumn(
        "__x", (F.col("__day") - F.min("__day").over(w)).cast("long")
    )
    # moment sums and the num/den products run in DECIMAL(38,0) (the
    # hourly_acf convention): n_days·Σxy at "years of history,
    # billions of events/day" scale exceeds BIGINT, and Spark 4's
    # default ANSI mode turns that silent wrap into a job-killing
    # overflow — the final cast back to BIGINT is safe for any
    # emit-able slope fraction (document: |num| < 9.2e18)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = anchored.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("__y").alias("sum_count"),
        F.sum("__x").alias("__sx"),
        F.sum(dec("__x") * dec("__x")).alias("__sxx"),
        F.sum(dec("__x") * dec("__y")).alias("__sxy"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("sum_count").cast("bigint").alias("sum_count"),
        (
            dec("n_days") * F.col("__sxy") - dec("__sx") * dec("sum_count")
        ).cast("bigint").alias("slope_num"),
        (
            dec("n_days") * F.col("__sxx") - dec("__sx") * dec("__sx")
        ).cast("bigint").alias("slope_den"),
    )


def top_event_paths(
    events: DataFrame,
    k: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common length-``k`` event-type paths — the sequence
    generalization of event_transitions (order-1 Markov): "view >
    click > purchase" ranked against every other 3-step journey,
    the path-mining staple behind funnel discovery (event_funnel
    CHECKS a hypothesized order; this FINDS the orders worth
    hypothesizing).

    Windows are per-user consecutive runs ordered by (ts, id) — the
    id tiebreak makes same-timestamp runs deterministic, matching
    event_transitions' convention. One user-partitioned window
    (lead × (k-1), linear in rows), a map-side-combined path count,
    then a sort-limit heap cut to ``top_k`` — no global sort.
    Emits (path 'a > b > c', n, n_users) ordered by n DESC with
    path ASC tiebreak; n_users counts distinct users who ever took
    the path (path-keyed exact distinct — the sketch escape hatch
    at extreme scale is kmv/hll, same note as daily_active_users).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, k)
    ]
    runs = events.select(
        F.col(user_col).alias("__u"),
        F.concat_ws(" > ", *steps).alias("path"),
        steps[-1].isNotNull().alias("__complete"),
    ).where(F.col("__complete"))
    counted = runs.groupBy("path").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("__u")).alias("n_users"),
    )
    return (
        counted.orderBy(F.col("n").desc(), F.col("path"))
        .limit(top_k)
        .select("path", F.col("n").cast("bigint"), F.col("n_users").cast("bigint"))
    )


def last_touch_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    within_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch conversion attribution: each ``conversion`` event
    is credited to the user's most recent PRECEDING non-conversion
    event type, provided that touch happened within ``within_days``
    of the conversion; conversions with no qualifying touch are
    credited to ``'direct'`` (the standard marketing-attribution
    last-touch model; the reference lands raw events and stops —
    this is the query its users run next).

    One window pass per user carries the running last non-conversion
    (type, ts) via ``last(..., ignorenulls=True)`` over rows
    UNBOUNDED PRECEDING..1 PRECEDING — no self-join, no per-user
    collect. Ties in ``ts`` break on ``event_id`` so the order (and
    the DuckDB twin) is total. Scale shape: ONE shuffle on
    ``user_id`` (high cardinality — the natural event-log partition
    key; per-user partitions are session-sized, never corpus-sized),
    then a 5-ish-row final aggregate. Conversion values sum as exact
    decimals (functions/money.py pattern) so the DOUBLE output is
    engine- and partitioning-independent.

    Emits (touch_type, n_conversions, total_value) — one row per
    crediting event type plus 'direct'.
    """
    from ..functions.money import exact_sum

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_conv = F.col(type_col) != conversion
    touch_type = F.last(F.when(non_conv, F.col(type_col)), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(non_conv, F.col(ts_col)), ignorenulls=True).over(w)
    conv = (
        events.select(
            F.col(type_col),
            F.col(ts_col),
            F.col(value_col),
            touch_type.alias("__tt"),
            touch_ts.alias("__tts"),
        )
        .where(F.col(type_col) == conversion)
        .select(
            F.coalesce(
                F.when(
                    F.col("__tts")
                    >= F.col(ts_col) - F.expr(f"INTERVAL {int(within_days)} DAYS"),
                    F.col("__tt"),
                ),
                F.lit("direct"),
            ).alias("touch_type"),
            F.col(value_col),
        )
    )
    return conv.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        exact_sum(value_col).alias("total_value"),
    )


def hourly_acf(
    events: DataFrame,
    lags: int = 3,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Autocorrelation of the hourly value series per event type, at
    lags 1..``lags`` -- the seasonality/burstiness diagnostic for an
    event stream (high lag-24 ACF means diurnal load; near-zero ACF
    everywhere means the load is memoryless, so rate-spike
    thresholds can be stationary).

    Two-level scale shape: the corpus-sized work is ONE shuffle --
    the (type, hour) aggregate with map-side partial combine;
    everything after runs on the bounded hourly series (#hours x
    #types rows -- calendar-sized, NOT corpus-sized, so the per-type
    lag window partition is bounded by the time range no matter how
    many events). Hours with no events are compressed out of the
    sequence; join a calendar spine first if zero-filled ACF is
    wanted.

    Exact-fraction output (the trend_report idiom): the Pearson
    numerator and the two variance terms of acf(k) =
    ``cov / sqrt(varx * vary)`` are integer-valued in cents, so the
    operator emits them EXACTLY -- as DECIMAL(38,0) rendered to
    VARCHAR (the dataset_fingerprint idiom; BIGINT would sit within
    35% of overflow already at sf1, and any float path is
    engine-order-dependent). The caller divides at display time:
    ``acf = cov_num / sqrt(varx_num * vary_num)``. Pairs are
    (x = series[t], y = series[t-k]) over observed hours in order.

    Emits (event_type, lag, n_pairs, cov_num, varx_num, vary_num);
    the fraction terms are '0'-safe strings, never NULL (a constant
    series yields varx_num = '0' -- the undefined-ACF case is
    visible, not NULLed).
    """
    from ..functions.money import money

    hourly = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("__h"),
    ).agg(
        (F.sum(money(value_col)) * 100)
        .cast("decimal(20,0)")
        .alias("__svc")
    )
    w = Window.partitionBy("event_type").orderBy("__h")
    lag_cols = [
        F.lag("__svc", k).over(w).alias(f"__l{k}") for k in range(1, lags + 1)
    ]
    lagged = hourly.select("event_type", "__svc", *lag_cols)

    aggs = []
    for k in range(1, lags + 1):
        lk = F.col(f"__l{k}")
        # a pair exists only when BOTH ends are non-NULL (an hour
        # whose events all carry NULL value sums to a NULL __svc):
        # gating every aggregate on the same condition keeps n_pairs
        # consistent with the sums — a one-sided count silently
        # corrupted cov = n·sxy − sx·sy
        valid = lk.isNotNull() & F.col("__svc").isNotNull()
        x = F.when(valid, F.col("__svc"))
        y = F.when(valid, lk)
        aggs += [
            F.count(y).alias(f"n{k}"),
            F.sum(x).cast("decimal(38,0)").alias(f"sx{k}"),
            F.sum(y).cast("decimal(38,0)").alias(f"sy{k}"),
            F.sum(x * y).cast("decimal(38,0)").alias(f"sxy{k}"),
            F.sum(x * x).cast("decimal(38,0)").alias(f"sxx{k}"),
            F.sum(y * y).cast("decimal(38,0)").alias(f"syy{k}"),
        ]
    per_type = lagged.groupBy("event_type").agg(*aggs)

    stack_args = ", ".join(
        f"{k}, n{k}, sx{k}, sy{k}, sxy{k}, sxx{k}, syy{k}"
        for k in range(1, lags + 1)
    )
    stacked = per_type.select(
        "event_type",
        F.expr(
            f"stack({lags}, {stack_args})"
            " AS (lag, n_pairs, sx, sy, sxy, sxx, syy)"
        ),
    )
    n = F.col("n_pairs").cast("decimal(10,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    cov = F.coalesce(n * F.col("sxy") - F.col("sx") * F.col("sy"), zero)
    varx = F.coalesce(n * F.col("sxx") - F.col("sx") * F.col("sx"), zero)
    vary = F.coalesce(n * F.col("syy") - F.col("sy") * F.col("sy"), zero)
    return stacked.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        cov.cast("decimal(38,0)").cast("string").alias("cov_num"),
        varx.cast("decimal(38,0)").cast("string").alias("varx_num"),
        vary.cast("decimal(38,0)").cast("string").alias("vary_num"),
    )


def densify_hours(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly aggregate on a gap-free calendar spine: every (type,
    hour) cell between the corpus' first and last hour exists, with
    zeros where no events landed — the densify step time-series
    consumers (ACF on a true regular grid, rate-spike baselines,
    charting) need before treating the series as regularly sampled.

    Scale shape: the corpus-sized work is ONE (type, hour) aggregate
    with map-side combine; the spine is built lazily from a 1-row
    bounds aggregate crossed (broadcast, Q11 scalar-subquery
    pattern) with the distinct type list and exploded — everything
    after the first aggregate is calendar-sized (#hours x #types),
    never corpus-sized, and no job runs at composition. Hours are
    emitted as epoch-micros BIGINT (the house timestamp convention);
    value sums are decimal-exact doubles, zero-filled.

    Emits (event_type, hour_us, n_events, sum_value).
    """
    from ..functions.money import money
    from ..functions.timeutil import ts_micros

    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.groupBy(
            F.col(type_col).alias("event_type"), hour.alias("__h")
        )
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(money(value_col)).cast("double").alias("__sv"),
        )
    )
    bounds = hourly.agg(
        F.min("__h").alias("__mn"), F.max("__h").alias("__mx")
    )
    # type list from the calendar-sized hourly relation (its exchange
    # is already materialized for the join side) — the aggregate
    # drops no types, and a second corpus-wide distinct() scan is
    # pure waste at the module's design scale
    types = hourly.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("__mn", "__mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("__h"),
        )
    )
    return (
        spine.join(hourly, ["event_type", "__h"], "left")
        .select(
            "event_type",
            ts_micros(F.col("__h")).alias("hour_us"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("__sv"), F.lit(0.0)).alias("sum_value"),
        )
    )


def user_event_sequences(
    events: DataFrame,
    max_len: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user ordered interaction history, truncated to the most
    recent ``max_len`` events — the feature builder behind
    sequential recommenders and behavioral LLM-training examples
    (SASRec/BERT4Rec-style "last-N actions" sequences).

    One user-partitioned window keeps the last N events (row_number
    over (ts, id) DESC — user_id is the high-cardinality key, so
    the window parallelizes; the per-user state is then N-bounded
    by construction), then one groupBy collects, sorts by the SAME
    (ts, id) order and joins into the sequence string — collect_list
    is unordered across partitions, so the deterministic order
    comes from array_sort over (ts_us, id) sort keys, never from
    arrival order.

    Output: (user_id, n_events bigint, seq string) — seq is
    space-joined event types, OLDEST of the kept window first
    (training consumes history forward).
    """
    from ..functions.timeutil import ts_micros

    w = Window.partitionBy(user_col).orderBy(
        F.desc("__us"), F.desc("__id")
    )
    kept = (
        events.select(
            F.col(user_col),
            F.col(type_col),
            ts_micros(F.col(ts_col)).alias("__us"),
            F.col(id_col).alias("__id"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_len)
    )
    return kept.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__us"), F.col("__id"), F.col(type_col)
                        )
                    )
                ),
                lambda s: s[type_col],
            ),
            " ",
        ).alias("seq"),
    )


def user_lifecycle(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily growth accounting — every DAU decomposed into
    new / retained / resurrected, plus the churn complement (the
    "where did yesterday's users go" table every activity dashboard
    opens with; Reforge/a16z growth-accounting identity:
    DAU(d) = new(d) + retained(d) + resurrected(d), and
    churned(d) = DAU(d-1) − retained(d)).

    No reference twin — the reference (397 LoC ETL) lands events and
    stops; extends SURVEY §2.2's events family.

    Semantics: a user is ACTIVE on a day if they have >=1 event that
    day. On each active day the user is NEW (no prior active day),
    RETAINED (active yesterday too) or RESURRECTED (prior activity,
    but a gap >= 2 days). A user CHURNS on day d+1 when active on d
    and not on d+1; the last observed day in the relation emits no
    churn (the future is unknown — standard growth-accounting
    convention, pinned in pytest). The identity churned(d) =
    dau(d-1) − retained(d) therefore holds on every interior day and
    is asserted by the test.

    Scale shape: the raw event log collapses FIRST in one
    map-side-combined distinct to the (user, day) activity relation
    (bounded by users × active-days — orders of magnitude below the
    event count); the lag/lead windows partition by user (high
    cardinality, no hot partition) over that collapsed relation; the
    final aggregate is day-sized. The one global scalar (the max
    observed day, needed to suppress last-day churn) is a 1-row
    broadcast cross join — the Q11 pattern, never a collect.

    Output: (day date, dau, new_users, retained_users,
    resurrected_users, churned_users — all bigint), one row per
    active day, plus churn-only rows when a day's activity is empty
    but yesterday's users all left (dau=0 days appear only then).
    """
    act = (
        events.select(
            F.col(user_col).alias("__u"),
            F.to_date(F.col(ts_col)).alias("__d"),
        )
        .where(F.col("__u").isNotNull() & F.col("__d").isNotNull())
        .distinct()
    )
    return lifecycle_from_activity(
        act.select(F.col("__u").alias("user_id"), F.col("__d").alias("day"))
    )


def lifecycle_from_activity(activity: DataFrame) -> DataFrame:
    """The post-activity half of :func:`user_lifecycle`: growth
    accounting from a DISTINCT (user_id, day) activity relation.
    The activity set is a MONOID under union + distinct, so a
    streaming maintainer (streaming/lifecycle.py) folds per-batch
    activity into persisted state and calls this per trigger —
    identical to the full-relation operator by construction (shared
    code path, pinned by the streaming twin)."""
    act = activity.select(
        F.col("user_id").alias("__u"), F.col("day").alias("__d")
    )
    w = Window.partitionBy("__u").orderBy("__d")
    prev_d = F.lag("__d").over(w)
    next_d = F.lead("__d").over(w)
    classed = act.select(
        "__u",
        "__d",
        F.when(prev_d.isNull(), F.lit("new"))
        .when(F.datediff(F.col("__d"), prev_d) == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("__cls"),
        next_d.alias("__next"),
    )
    per_day = classed.groupBy(F.col("__d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau"),
        F.sum((F.col("__cls") == "new").cast("bigint"))
        .cast("bigint")
        .alias("new_users"),
        F.sum((F.col("__cls") == "retained").cast("bigint"))
        .cast("bigint")
        .alias("retained_users"),
        F.sum((F.col("__cls") == "resurrected").cast("bigint"))
        .cast("bigint")
        .alias("resurrected_users"),
    )
    max_day = act.agg(F.max("__d").alias("__maxd"))
    churn = (
        classed.where(
            F.col("__next").isNull()
            | (F.datediff(F.col("__next"), F.col("__d")) > 1)
        )
        .select(F.date_add(F.col("__d"), 1).alias("day"))
        .crossJoin(F.broadcast(max_day))
        .where(F.col("day") <= F.col("__maxd"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned_users"))
    )
    return (
        per_day.join(churn, "day", "full")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            F.coalesce("new_users", F.lit(0))
            .cast("bigint")
            .alias("new_users"),
            F.coalesce("retained_users", F.lit(0))
            .cast("bigint")
            .alias("retained_users"),
            F.coalesce("resurrected_users", F.lit(0))
            .cast("bigint")
            .alias("resurrected_users"),
            F.coalesce("churned_users", F.lit(0))
            .cast("bigint")
            .alias("churned_users"),
        )
    )


def entry_exit_report(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap: str = "30 MINUTES",
) -> DataFrame:
    """Per-event-type session entry/exit/bounce report — the landing
    page / exit page / bounce-rate table of web analytics, over the
    same gap-based sessions :func:`~..operators.windows.sessionize`
    emits (identical boundary rule: new session when the gap from the
    previous event exceeds ``gap``; (ts, id) total order inside a
    user, so first/last are deterministic under ties).

    No reference twin; extends SURVEY §2.2's events family.

    A session ENTERS at its first event's type, EXITS at its last,
    and BOUNCES when it has exactly one event (that event is both
    entry and exit — counted in all three columns, the GA
    convention). Rates are the two final double divisions (6 dp,
    the cosine-family rounding); all counts are exact bigints.

    Scale shape: one user-partitioned window pass assigns session
    ids (high-cardinality key), a second picks each session's first
    and last rows via min/max over (epoch-micros, id) packed structs
    inside ONE groupBy — never a re-sort of raw events; the final
    aggregate is event-type-sized. No collects, no UDFs.

    Output: (event_type, entries, exits, bounces, sessions,
    entry_share, bounce_rate) — entry_share = entries / total
    sessions; bounce_rate = bounces / entries for that type (NULL
    when the type never opens a session).
    """
    from ..functions.timeutil import ts_micros

    w = Window.partitionBy("__u").orderBy(F.col("__ts"), F.col("__id"))
    prev = F.lag("__ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col("__ts") - prev > F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    numbered = (
        events.select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__ts"),
            F.col(id_col).alias("__id"),
            F.col(type_col).alias("__t"),
        )
        .withColumn("__new", is_new)
        .withColumn("__sess", F.sum("__new").over(wcum).cast("bigint"))
    )
    sessions = numbered.groupBy("__u", "__sess").agg(
        F.min(
            F.struct(
                ts_micros(F.col("__ts")).alias("us"),
                F.col("__id").alias("id"),
                F.col("__t").alias("t"),
            )
        )["t"].alias("__entry"),
        F.max(
            F.struct(
                ts_micros(F.col("__ts")).alias("us"),
                F.col("__id").alias("id"),
                F.col("__t").alias("t"),
            )
        )["t"].alias("__exit"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    total = sessions.agg(
        F.count(F.lit(1)).cast("bigint").alias("__total")
    )
    entries = sessions.groupBy(F.col("__entry").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("entries"),
        F.sum((F.col("__n") == 1).cast("bigint"))
        .cast("bigint")
        .alias("bounces"),
    )
    exits = sessions.groupBy(F.col("__exit").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("exits")
    )
    return (
        entries.join(exits, "event_type", "full")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            F.coalesce("entries", F.lit(0)).cast("bigint").alias("entries"),
            F.coalesce("exits", F.lit(0)).cast("bigint").alias("exits"),
            F.coalesce("bounces", F.lit(0)).cast("bigint").alias("bounces"),
            F.col("__total").alias("sessions"),
            F.round(
                F.coalesce("entries", F.lit(0)).cast("double")
                / F.col("__total").cast("double"),
                6,
            ).alias("entry_share"),
            F.when(
                F.coalesce("entries", F.lit(0)) > 0,
                F.round(
                    F.coalesce("bounces", F.lit(0)).cast("double")
                    / F.coalesce("entries", F.lit(1)).cast("double"),
                    6,
                ),
            ).alias("bounce_rate"),
        )
    )


def _sampled_ntile(
    scored: DataFrame,
    key_cols: list,
    n_tiles: int,
    out_name: str,
    n_buckets: int = 64,
    sample_k: int = 1024,
) -> DataFrame:
    """One exact NTILE assignment over the STRICT composite order
    ``key_cols`` (which must end in the unique user id) without a
    single-partition corpus window — percentile_rank's sample-sort
    decomposition (ordering.py) applied to NTILE semantics.

    Because the composite key is UNIQUE, sample boundaries cut the
    key space into ~n/n_buckets balanced buckets with NO tie
    collapse (the documented heavy-tie caveat of value-keyed
    percentile_rank cannot bite: the id component breaks every tie).
    rank = (running count of earlier buckets — a window over the
    n_buckets-row histogram) + (row_number within own bucket), and
    the tile applies SQL NTILE's exact remainder rule in integer
    arithmetic: with q = N div n and rem = N mod n, the first rem
    tiles take q+1 rows — bit-identical to the window form, pinned
    in pytest including the N < n_tiles degenerate case.

    Emits (__u, <out_name>)."""
    from .ordering import _boundary_expr, _bucket_of

    rows = scored.select("__u", F.struct(*key_cols).alias("__k"))
    samp = (
        rows.select("__k", F.md5(F.col("__u").cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample_k)
    )
    arr = samp.agg(
        F.array_sort(F.collect_list("__k")).alias("__arr"),
        F.count(F.lit(1)).alias("__n"),
    )
    bounds = arr.select(
        _boundary_expr(n_buckets, "__arr", "__n").alias("__bnds")
    )
    bucketed = rows.crossJoin(F.broadcast(bounds)).select(
        "__u", "__k", _bucket_of("__bnds", "__k").alias("__bkt")
    ).persist()
    # ^ r10: referenced by the histogram AND the rank join-back —
    # the _bucketed_rank lesson applied here (lazy, narrow relation)
    hist = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.partitionBy()
    offsets = hist.select(
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_tot).alias("__n_all"),
    )
    w_local = Window.partitionBy("__bkt").orderBy("__k")
    ranked = (
        bucketed.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "__rank",
            (F.col("__off") + F.row_number().over(w_local)).cast("bigint"),
        )
        .withColumn("__q", F.expr(f"__n_all div {n_tiles}"))
        .withColumn("__rem", F.col("__n_all") % n_tiles)
    )
    tile = F.expr(
        "CASE WHEN __rank <= __rem * (__q + 1) "
        "THEN (__rank + __q) div (__q + 1) "
        "ELSE __rem + (__rank - __rem * (__q + 1) + __q - 1) div __q END"
    )
    return ranked.select("__u", tile.cast("bigint").alias(out_name))


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
    scale_ranks: bool = False,
) -> DataFrame:
    """RFM segmentation — the classic customer-value grid (Hughes
    1994; every CRM/retention playbook): score each user 1..n_tiles
    on Recency (1 = most recent), Frequency and Monetary (1 =
    highest), then report the segment grid. "Champions" are (1,1,1);
    (5,1,1)-ish cells are the at-risk high-value users a win-back
    campaign targets.

    No reference twin — extends SURVEY §2.2's events family.

    Determinism: recency is whole DAYS from the max observed event
    date (a 1-row broadcast, the Q11 pattern — never a wall clock,
    so reruns reproduce); monetary sums VALUE as exact integer
    cents; every ntile orders by a TOTAL order ((metric, user_id)),
    so tile assignment is bit-deterministic and both engines agree
    on NTILE's early-tiles-get-the-remainder split.

    Scale shape: the event log collapses FIRST in one map-combined
    groupBy to the per-user (recency, frequency, cents) relation;
    the three ntile windows run over THAT relation. By default they
    are unpartitioned (tiles are defined over the whole user
    population) — fine at report scale (<= ~1e8 users, a single
    sort of a 3-column relation). ``scale_ranks=True`` is the 1e9-
    user path: each ntile routes through percentile_rank's
    sample-sort decomposition over the strict (metric, user) order
    (_sampled_ntile — balanced buckets, histogram offsets,
    per-bucket row_number), so no single-partition corpus window
    exists and the three tile relations hash-join back on the
    high-cardinality user id. Bit-identical to the window form by
    construction (exact NTILE remainder rule in integer arithmetic)
    — pinned in pytest. The output is at most n_tiles³ rows.

    Output: (r_score, f_score, m_score, n_users, sum_cents) — one
    row per non-empty RFM cell.
    """
    from ..functions.money import dec
    from ..functions.timeutil import ts_micros

    per_user = (
        events.select(
            F.col(user_col).alias("__u"),
            F.to_date(F.col(ts_col)).alias("__d"),
            F.col(value_col).alias("__v"),
        )
        .where(F.col("__u").isNotNull() & F.col("__d").isNotNull())
        .groupBy("__u")
        .agg(
            F.max("__d").alias("__last"),
            F.count(F.lit(1)).cast("bigint").alias("__freq"),
            # all-NULL spend coalesces to 0 cents: a NULL here would
            # sort under engine-DEFAULT null order inside the ntile
            # (Spark DESC=last, ASC=first vs DuckDB's last/last) —
            # the one place the twins could silently diverge
            F.coalesce(F.sum(dec("__v")) * 100, F.lit(0))
            .cast("bigint")
            .alias("__cents"),
        )
    )
    ref = per_user.agg(F.max("__last").alias("__ref"))
    scored = per_user.crossJoin(F.broadcast(ref)).withColumn(
        "__rec", F.datediff(F.col("__ref"), F.col("__last")).cast("bigint")
    )
    if scale_ranks:
        scored = scored.persist()
        # ^ r10: the three _sampled_ntile decompositions (each a
        # sample pass + bucket histogram + rank join) plus the final
        # select reference this relation ~10x — without the lazy
        # persist the events scan + per-user aggregate re-ran per
        # reference (18.2 s at sf1; the rank_correlation lesson).
        # Scoped to the scale path so the default window path's plan
        # is untouched.
        # (metric, user) composite keys; DESC metrics negate (counts
        # and cents are non-negative bigints — no overflow edge)
        r_t = _sampled_ntile(
            scored, [F.col("__rec"), F.col("__u")], n_tiles, "r_score"
        )
        f_t = _sampled_ntile(
            scored, [(-F.col("__freq")).alias("__m"), F.col("__u")],
            n_tiles, "f_score",
        )
        m_t = _sampled_ntile(
            scored, [(-F.col("__cents")).alias("__m"), F.col("__u")],
            n_tiles, "m_score",
        )
        tiled = (
            scored.select("__u", "__cents")
            .join(r_t, "__u")
            .join(f_t, "__u")
            .join(m_t, "__u")
        )
    else:
        w_r = Window.orderBy(F.col("__rec").asc(), F.col("__u").asc())
        w_f = Window.orderBy(F.col("__freq").desc(), F.col("__u").asc())
        w_m = Window.orderBy(F.col("__cents").desc(), F.col("__u").asc())
        tiled = scored.select(
            "__u",
            "__cents",
            F.ntile(n_tiles).over(w_r).cast("bigint").alias("r_score"),
            F.ntile(n_tiles).over(w_f).cast("bigint").alias("f_score"),
            F.ntile(n_tiles).over(w_m).cast("bigint").alias("m_score"),
        )
    return tiled.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("__cents").cast("bigint").alias("sum_cents"),
    )


def interevent_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-event-time statistics and the Goh–Barabási
    burstiness score B = (σ−μ)/(σ+μ) over the gap distribution
    (Goh & Barabási 2008, EPL 81) — the USER-grain twin of
    fano_burstiness's per-type hourly dispersion: B → 1 for bursty
    actors (bots firing in spurts, incident storms), ≈ 0 for
    Poisson-random arrivals, → −1 for metronomic schedulers. The
    standard bot/automation screen next to event_rate_spikes.

    No reference twin — extends SURVEY §2.2's events family.

    Exactness: gaps are exact integer MICROSECONDS from a lag window
    over the (ts, event_id) total order; the per-user moments
    (n_gaps, Σd BIGINT, Σd² DECIMAL(38,0)-as-VARCHAR — a 3e11-µs gap
    squares past int64) are exact integer sums, so cv =
    √(n·Σd² − (Σd)²)/Σd and B = (√v − Σd)/(√v + Σd) with
    v = n·Σd² − (Σd)² are a fixed sequence of correctly-rounded IEEE
    ops on identical inputs — bit-equal across engines (the
    rank_correlation sqrt contract). Users with one event have no
    gaps and emit no row; a user whose gaps are ALL zero
    (simultaneous bursts only) emits NULL cv/burstiness (μ = 0).

    Scale shape: the lag window partitions by user — high
    cardinality, no hot key — and everything after is one
    map-combined per-user aggregate. No collects, no UDFs.

    Output: (user_id, n_gaps, sum_dt_us, sumsq_dt VARCHAR, cv,
    burstiness), cv/burstiness rounded 6dp.
    """
    from ..functions.timeutil import ts_micros

    dec = "decimal(38,0)"
    w = Window.partitionBy("__u").orderBy("__t", "__id")
    gaps = (
        events.select(
            F.col(user_col).alias("__u"),
            ts_micros(F.col(ts_col)).alias("__t"),
            F.col(id_col).alias("__id"),
        )
        .where(F.col("__u").isNotNull() & F.col("__t").isNotNull())
        .withColumn("__dt", F.col("__t") - F.lag("__t").over(w))
        .where(F.col("__dt").isNotNull())
    )
    m = gaps.groupBy(F.col("__u").alias(user_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("__dt").cast("bigint").alias("sum_dt_us"),
        F.sum(F.col("__dt").cast(dec) * F.col("__dt").cast(dec))
        .cast(dec)
        .alias("__ss"),
    )
    return interevent_from_moments(m, user_col=user_col)


def interevent_from_moments(
    m: DataFrame, user_col: str = "user_id", ss_col: str = "__ss"
) -> DataFrame:
    """The post-moments half of :func:`interevent_stats` — cv and
    Goh–Barabási burstiness from the exact per-user gap moments
    (n_gaps BIGINT, sum_dt_us BIGINT, Σd² DECIMAL(38,0)). Split out
    (the fano_from_histogram convention) so streaming maintenance
    (streaming/interevent.py) reports through the SAME arithmetic
    the batch operator runs — batch-folded == full-relation exactly.
    Users with zero gaps (single event so far) emit no row, matching
    the batch operator's lag-window construction."""
    dec = "decimal(38,0)"
    v = (
        F.col("n_gaps").cast(dec) * F.col(ss_col)
        - F.col("sum_dt_us").cast(dec) * F.col("sum_dt_us").cast(dec)
    ).cast("double")
    s = F.col("sum_dt_us").cast("double")
    return m.where(F.col("n_gaps") > 0).select(
        user_col,
        "n_gaps",
        "sum_dt_us",
        F.col(ss_col).cast(dec).cast("string").alias("sumsq_dt"),
        F.when(F.col("sum_dt_us") > 0, F.round(F.sqrt(v) / s, 6)).alias(
            "cv"
        ),
        F.when(
            F.col("sum_dt_us") > 0,
            F.round((F.sqrt(v) - s) / (F.sqrt(v) + s), 6),
        ).alias("burstiness"),
    )


def weekly_seasonality(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-type (day-of-week × hour-of-day) seasonality profile —
    the periodicity screen next to hourly_acf (which detects THAT a
    cycle exists; this reports its SHAPE): each cell's share of the
    type's events and its lift vs the uniform 1/168 baseline. The
    standard traffic-shaping/anomaly-baseline input — an alert
    should compare an hour against its weekly cell, not the global
    mean — and the weekday/weekend split a crawl scheduler reads.

    No reference twin — extends SURVEY §2.2's events family.

    Exactness: day-of-week and hour come from pure integer epoch
    arithmetic in UTC with FLOOR semantics (functions.timeutil.
    epoch_day_cell) — dow = floor(us / 86 400e6 + 4) mod 7 (epoch
    day 0 was a Thursday; 0 = Sunday), hour = pmod(us, 86 400e6)
    div 3 600e6 — no calendar/timezone library in either engine, and
    the oracle mirrors the same pmod construction, so cell
    assignment is bit-identical for ALL epochs including pre-1970
    (truncating div/% would shift dow and go negative on hour there
    — the ADVICE-r10 divergence). Counts are exact BIGINTs; share =
    n/n_type and lift = n·168/n_type are rounded display divisions.

    Scale shape: ONE map-combined groupBy to the <= types×168 cell
    histogram; per-type totals aggregate from the CELLS (not a
    second corpus pass) and join back categorically. No windows, no
    UDFs, no collects.

    Output: (event_type, dow, hour, n_events, n_type, share, lift).
    """
    from ..functions.timeutil import epoch_day_cell, ts_micros

    us = ts_micros(F.col(ts_col))
    dow, hour = epoch_day_cell(F.col("__us"))
    cells = (
        events.select(
            F.col(type_col).alias("event_type"), us.alias("__us")
        )
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select("event_type", dow.alias("dow"), hour.alias("hour"))
        .groupBy("event_type", "dow", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    return seasonality_from_cells(cells)


def seasonality_from_cells(
    cells: DataFrame, count_col: str = "n_events"
) -> DataFrame:
    """The post-histogram half of :func:`weekly_seasonality` — shares
    and lift from the (event_type, dow, hour, count) cell relation.
    Split out (the fano_from_histogram convention) so streaming
    maintenance (streaming/seasonality.py) reports through the SAME
    arithmetic the batch operator runs."""
    cells = cells.select(
        "event_type",
        "dow",
        "hour",
        F.col(count_col).cast("bigint").alias("n_events"),
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n_events").cast("bigint").alias("n_type")
    )
    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        "n_type",
        F.round(
            F.col("n_events").cast("double") / F.col("n_type").cast("double"),
            6,
        ).alias("share"),
        F.round(
            (F.col("n_events") * 168).cast("double")
            / F.col("n_type").cast("double"),
            6,
        ).alias("lift"),
    )


def seasonal_anomalies(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    threshold: float = 2.0,
) -> DataFrame:
    """Hour buckets that deviate from their own weekly-seasonal
    baseline — the anomaly screen weekly_seasonality's profile
    exists to feed: an alert should compare Monday-09:00 against
    OTHER Monday-09:00s, not the global mean (event_rate_spikes'
    blind spot: a normal Monday peak looks like a spike vs the
    week-long average). One row per (type, calendar day, hour)
    bucket whose count sits >= ``threshold`` standard deviations
    from its (dow, hour) cell's per-week mean.

    No reference twin — extends SURVEY §2.2's events family.

    Exactness: buckets and cells come from the floor/pmod epoch
    arithmetic every seasonality op shares (timeutil.epoch_day_cell
    / epoch_floor_index — correct pre-1970 too). With W = distinct
    observed epoch-weeks (global), a cell's W weekly observations
    are its observed bucket counts plus implied zeros, so mean and
    population variance need only S1 = Σn, S2 = Σn² over OBSERVED
    buckets: z = (W·n − S1) / sqrt(W·S2 − S1²) — integer numerator,
    sqrt of an exact BIGINT, one rounded division (IEEE sqrt/div are
    correctly rounded, so bit-identical across engines). The
    threshold compares the 6-dp ROUNDED |z| so keep/flag cannot
    straddle a 1-ulp divergence (the semantic_decontaminate gate
    discipline). Partial weeks at the span edges dilute cell means
    toward zero — documented, shared with the oracle by identical
    construction.

    Scale shape: ONE map-combined groupBy to the (type, day, hour)
    bucket histogram (the only corpus-sized shuffle); cell stats and
    the week count aggregate from the histogram (types × 168 and
    1-row broadcast); the z filter is a categorical join back onto
    the histogram. No windows, no UDFs, no collects.

    Output: (event_type, day, dow, hour, n_events, n_weeks,
    cell_total, z) for buckets with positive cell variance and
    |z| >= threshold, z rounded 6dp.
    """
    from ..functions.timeutil import epoch_floor_index, ts_micros

    us = ts_micros(F.col(ts_col))
    base = (
        events.select(
            F.col(type_col).alias("event_type"), us.alias("__us")
        )
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select(
            "event_type",
            epoch_floor_index(F.col("__us"), 86_400_000_000).alias("day"),
            (
                F.pmod(F.col("__us"), F.lit(86_400_000_000))
                / F.lit(3_600_000_000)
            )
            .cast("bigint")
            .alias("hour"),
        )
    )
    buckets = base.groupBy("event_type", "day", "hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    return anomalies_from_buckets(buckets, threshold=threshold)


def anomalies_from_buckets(
    buckets: DataFrame,
    threshold: float = 2.0,
    count_col: str = "n_events",
) -> DataFrame:
    """The post-histogram half of :func:`seasonal_anomalies` — the
    cell-baseline z-score sweep from the (event_type, day, hour,
    count) bucket histogram, which is a MONOID under union +
    groupBy-sum (rows land in the same bucket regardless of which
    micro-batch carries them). Split out (the fano_from_histogram
    convention) so streaming maintenance (streaming/anomaly.py)
    reports through the SAME arithmetic the batch operator runs.

    Week membership and dow derive from the day index alone (pure
    integer pmod), so the half needs no timestamps."""
    b = buckets.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("hour").cast("bigint").alias("hour"),
        F.col(count_col).cast("bigint").alias("n_events"),
    ).persist()
    weeks = b.select(
        ((F.col("day") - F.pmod(F.col("day"), F.lit(7))) / F.lit(7))
        .cast("bigint")
        .alias("__wk")
    ).agg(F.count_distinct("__wk").cast("bigint").alias("n_weeks"))
    cells = b.groupBy(
        "event_type",
        F.pmod(F.col("day") + 4, F.lit(7)).cast("bigint").alias("__dow"),
        "hour",
    ).agg(
        F.sum("n_events").cast("bigint").alias("__s1"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .cast("bigint")
        .alias("__s2"),
    )
    num = (
        F.col("n_weeks") * F.col("n_events") - F.col("__s1")
    ).cast("double")
    den = F.sqrt(
        (
            F.col("n_weeks") * F.col("__s2")
            - F.col("__s1") * F.col("__s1")
        ).cast("double")
    )
    z = F.round(num / den, 6)
    out = (
        b.withColumn(
            "__dow",
            F.pmod(F.col("day") + 4, F.lit(7)).cast("bigint"),
        )
        .join(cells, ["event_type", "__dow", "hour"])
        .crossJoin(F.broadcast(weeks))
        .where(
            (
                F.col("n_weeks") * F.col("__s2")
                - F.col("__s1") * F.col("__s1")
                > 0
            )
            & (F.abs(z) >= F.lit(threshold))
        )
        .select(
            "event_type",
            "day",
            F.col("__dow").alias("dow"),
            "hour",
            "n_events",
            "n_weeks",
            F.col("__s1").alias("cell_total"),
            z.alias("z"),
        )
    )
    # b feeds buckets, cells AND weeks — expose the lazy pin for
    # caller release (the pagerank_update_pass convention).
    out._cached_inputs = [b]
    return out


def event_xcorr(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_lag: int = 2,
) -> DataFrame:
    """Lagged Pearson cross-correlation between the hourly count
    series of every ordered event-type pair — the lead/lag screen
    hourly_acf (self-lag) and fano_burstiness (dispersion) don't
    cover: does `view` at hour t predict `purchase` at t+l? A
    pipeline reads the lag of the correlation peak as the funnel's
    time constant.

    No reference twin — extends SURVEY §2.2's events family.

    Semantics: with the global inclusive hour span [m, M] (H hours,
    missing hours are real zeros — never densified), for lag l the
    x-series is type_a's counts over hours [m, M-l] and the
    y-series type_b's counts over [m+l, M], n = H - l matched
    points. Moments over a restricted window come from per-type
    totals minus l-bounded edge tails (at most max_lag rows per
    type), so nothing corpus-sized is ever re-scanned.

    Exactness: counts and all moment sums are exact integers carried
    as DECIMAL(38,0); the correlation is computed in doubles off the
    decimal moments exactly like corr_matrix (one sqrt of the
    variance product, correctly-rounded IEEE ops, identical
    operation order in the oracle), rounded 6dp.

    Scale shape: ONE map-combined (type, hour) groupBy is the only
    corpus-sized shuffle; everything downstream runs on the
    types × active-hours histogram (broadcast-joined lag spine and
    bounds, histogram equi-self-join on the shifted hour). No
    windows, no UDFs, no collects.

    Output: (type_a, type_b, lag, n_hours, sum_xy, corr) for every
    ordered pair of distinct types and lag 0..max_lag; corr NULL
    when either window's variance is zero.
    """
    from ..functions.timeutil import epoch_floor_index, ts_micros

    us = ts_micros(F.col(ts_col))
    hourly = (
        events.select(
            F.col(type_col).alias("event_type"), us.alias("__us")
        )
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select(
            "event_type",
            epoch_floor_index(F.col("__us"), 3_600_000_000).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return xcorr_from_hourly(hourly, max_lag=max_lag)


def xcorr_from_hourly(hist: DataFrame, max_lag: int = 2) -> DataFrame:
    """The post-histogram half of :func:`event_xcorr` — bounds, edge
    tails, the shifted-hour self-join and the moment algebra from
    the (event_type, hour, n) hourly histogram, a MONOID under union
    + groupBy-sum. Split out (the fano_from_histogram convention) so
    streaming maintenance (streaming/xcorr.py) reports through the
    SAME arithmetic the batch operator runs."""
    dec = "decimal(38,0)"
    spark = hist.sparkSession
    hourly = hist.select(
        F.col("event_type").alias("__t"),
        F.col("hour").cast("bigint").alias("__h"),
        F.col("n").cast("bigint").alias("__c"),
    ).persist()
    bounds = hourly.agg(
        F.min("__h").alias("__m"), F.max("__h").alias("__mx")
    )
    lags = spark.range(0, int(max_lag) + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    totals = hourly.groupBy("__t").agg(
        F.sum("__c").cast(dec).alias("__tot"),
        F.sum(F.col("__c") * F.col("__c")).cast(dec).alias("__totsq"),
    )
    # edge tails: per (type, lag) the mass OUTSIDE the lag-l window
    edges = hourly.crossJoin(F.broadcast(bounds)).crossJoin(
        F.broadcast(lags)
    )
    tail = (
        edges.where(F.col("__h") > F.col("__mx") - F.col("lag"))
        .groupBy("__t", "lag")
        .agg(
            F.sum("__c").cast(dec).alias("__ts"),
            F.sum(F.col("__c") * F.col("__c")).cast(dec).alias("__tss"),
        )
    )
    head = (
        edges.where(F.col("__h") < F.col("__m") + F.col("lag"))
        .groupBy("__t", "lag")
        .agg(
            F.sum("__c").cast(dec).alias("__hs"),
            F.sum(F.col("__c") * F.col("__c")).cast(dec).alias("__hss"),
        )
    )
    zero = F.lit(0).cast(dec)
    x_side = (
        totals.crossJoin(F.broadcast(lags))
        .join(tail, ["__t", "lag"], "left")
        .select(
            F.col("__t").alias("type_a"),
            "lag",
            (F.col("__tot") - F.coalesce(F.col("__ts"), zero)).alias("__sx"),
            (F.col("__totsq") - F.coalesce(F.col("__tss"), zero)).alias(
                "__sxx"
            ),
        )
    )
    y_side = (
        totals.crossJoin(F.broadcast(lags))
        .join(head, ["__t", "lag"], "left")
        .select(
            F.col("__t").alias("type_b"),
            "lag",
            (F.col("__tot") - F.coalesce(F.col("__hs"), zero)).alias("__sy"),
            (F.col("__totsq") - F.coalesce(F.col("__hss"), zero)).alias(
                "__syy"
            ),
        )
    )
    a = hourly.select(
        F.col("__t").alias("type_a"),
        F.col("__h").alias("__ha"),
        F.col("__c").alias("__ca"),
    )
    bqs = hourly.select(
        F.col("__t").alias("type_b"),
        F.col("__h").alias("__hb"),
        F.col("__c").alias("__cb"),
    )
    sxy = (
        a.crossJoin(F.broadcast(lags))
        .join(
            bqs,
            (F.col("__hb") == F.col("__ha") + F.col("lag"))
            & (F.col("type_b") != F.col("type_a")),
        )
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.sum(F.col("__ca").cast(dec) * F.col("__cb").cast(dec))
            .cast(dec)
            .alias("__sxy")
        )
    )
    pairs = (
        x_side.join(
            y_side.withColumnRenamed("lag", "__lg"),
            (F.col("__lg") == F.col("lag"))
            & (F.col("type_b") != F.col("type_a")),
        )
        .drop("__lg")
        .join(sxy, ["type_a", "type_b", "lag"], "left")
        .crossJoin(F.broadcast(bounds))
    )
    n = (F.col("__mx") - F.col("__m") + 1 - F.col("lag")).cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    pxy = F.coalesce(F.col("__sxy"), zero)
    num = n * pxy.cast("double") - sx * sy
    dd = (n * sxx - sx * sx) * (n * syy - sy * sy)
    out = pairs.select(
        "type_a",
        "type_b",
        "lag",
        (F.col("__mx") - F.col("__m") + 1 - F.col("lag"))
        .cast("bigint")
        .alias("n_hours"),
        pxy.cast("bigint").alias("sum_xy"),
        F.when(dd > 0, F.round(num / F.sqrt(dd), 6)).alias("corr"),
    )
    # hourly feeds bounds/totals/edges and both self-join sides —
    # expose the lazy pin for caller release.
    out._cached_inputs = [hourly]
    return out


def mann_kendall_trend(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall nonparametric trend test + Theil-Sen slope over
    per-type DAILY counts (Mann 1945, Kendall 1975; Sen 1968) — the
    outlier-robust companion to trend_report's OLS fraction: one
    whale day drags a least-squares slope arbitrarily; the MK
    statistic counts ORDER relations (S = Σ_{i<j} sign(y_j − y_i))
    and the Theil-Sen slope is the MEDIAN pairwise slope, both
    immune to any single day's magnitude.

    No reference twin — extends SURVEY §2.2's events family.

    Exactness: the day axis is densified (silent days are real
    zeros — a monotone decline INTO silence must count), pairs come
    from the bounded day-histogram self-join (i < j over span-days
    rows — calendar², never events²); S, the pair count and the tie
    count are exact BIGINTs, tau-a = S / n_pairs is ONE rounded
    division. The Theil-Sen slope takes the type-1 lower-median of
    the pairwise slopes (y_j−y_i)/(x_j−x_i): each slope is a single
    correctly-rounded IEEE division and the median picks ONE of them
    by rank (row_number over (slope, i, j) — total order, no
    interpolation, no float summation), so the result is
    bit-deterministic across engines and partitionings.

    Scale shape: one map-combined (type, day) count, the types ×
    span-days² bounded self-join, one median window per type
    (calendar-sized partitions). No UDFs, no collects.

    Output: (event_type, n_days, s_stat, n_pairs, n_tied_pairs,
    tau, sen_slope) — tau/sen_slope rounded 6dp.
    """
    from pyspark.sql.window import Window

    from ..functions.timeutil import epoch_floor_index, ts_micros

    us = ts_micros(F.col(ts_col))
    counts = (
        events.select(
            F.col(type_col).alias("event_type"), us.alias("__us")
        )
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select(
            "event_type",
            epoch_floor_index(F.col("__us"), 86_400_000_000).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .persist()
    )
    bounds = counts.agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    types = counts.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(
                "day"
            ),
        )
    )
    dense = spine.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("y"),
    )
    a = dense.select(
        "event_type", F.col("day").alias("__xi"), F.col("y").alias("__yi")
    )
    b = dense.select(
        F.col("event_type").alias("__e2"),
        F.col("day").alias("__xj"),
        F.col("y").alias("__yj"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("__e2"))
        & (F.col("__xj") > F.col("__xi")),
    ).select(
        "event_type",
        "__xi",
        "__xj",
        F.signum((F.col("__yj") - F.col("__yi")).cast("double"))
        .cast("bigint")
        .alias("__sgn"),
        (
            (F.col("__yj") - F.col("__yi")).cast("double")
            / (F.col("__xj") - F.col("__xi")).cast("double")
        ).alias("__slope"),
    )
    ws = Window.partitionBy("event_type").orderBy(
        "__slope", "__xi", "__xj"
    )
    # ranked feeds both the stats aggregate and the median pick —
    # lazy persist so the pair join + rank window run once (the
    # rank_correlation subplan-reuse lesson; calendar-pair-sized).
    ranked = pairs.withColumn("__rn", F.row_number().over(ws)).persist()
    stats = ranked.groupBy("event_type").agg(
        F.sum("__sgn").cast("bigint").alias("s_stat"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum((F.col("__sgn") == 0).cast("bigint"))
        .cast("bigint")
        .alias("n_tied_pairs"),
    )
    # type-1 lower median: the slope at rank floor((n_pairs+1)/2)
    med = (
        ranked.join(
            F.broadcast(
                stats.select(
                    "event_type", F.col("n_pairs").alias("__np")
                )
            ),
            "event_type",
        )
        .where(F.col("__rn") == F.floor((F.col("__np") + 1) / 2))
        .select("event_type", F.col("__slope").alias("__med"))
    )
    ndays = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    out = (
        stats.join(F.broadcast(ndays), "event_type")
        .join(F.broadcast(med), "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "n_pairs",
            "n_tied_pairs",
            F.when(
                F.col("n_pairs") > 0,
                F.round(
                    F.col("s_stat").cast("double")
                    / F.col("n_pairs").cast("double"),
                    6,
                ),
            ).alias("tau"),
            F.round(F.col("__med"), 6).alias("sen_slope"),
        )
    )
    out._cached_inputs = [counts, ranked]
    return out


def cusum_changepoints(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    threshold_ppm: int = 200_000,
) -> DataFrame:
    """Two-sided CUSUM level-shift detection over per-type DAILY
    counts (Page 1954) — the sustained-drift monitor between
    event_rate_spikes (single-bucket spikes vs a trailing mean) and
    trend_report (global slope): a 20% ingestion drop spread over a
    week never trips a spike gate, but its cumulative deficit grows
    linearly and CUSUM flags it.

    No reference twin — extends SURVEY §2.2's events family.

    Exactness: the sequential recurrence S_t = max(0, S_{t-1} + d_t)
    is NOT a prefix sum, but the closed form
    S_t = prefix_t − min(0, min_{τ≤t} prefix_τ) is — so both sides
    become one cumulative-sum window plus one running-min/max window
    over the densified day axis (silent days are real zeros — a
    deficit IS the signal). Everything stays integer by working in
    n-scaled units: d_t = n·x_t − T (n = span days, T = type total;
    mean-centered deviations without a division), and the flag
    compares 10⁶·S_t > threshold_ppm·T·n exactly — no float enters
    until the display column S_t/n (rounded 6dp). threshold_ppm is
    the flagged cumulative excess as PPM of the type's TOTAL volume
    (200000 = flag once 20% of total volume has accumulated off-mean).

    Scale shape: one map-combined (type, day) count is the only
    corpus-sized shuffle; the spine is types × span-days (broadcast
    1-row bounds, the event_rate_spikes pattern); the two windows
    partition per type over span-days rows — calendar-sized
    partitions, never event-sized. No UDFs, no collects.

    Output: (event_type, day, n_events, cusum_up, cusum_down,
    flag_up, flag_down) for every (type, day) in the densified span;
    cusum columns in count units rounded 6dp.
    """
    from pyspark.sql.window import Window

    from ..functions.timeutil import epoch_floor_index, ts_micros

    us = ts_micros(F.col(ts_col))
    counts = (
        events.select(
            F.col(type_col).alias("event_type"), us.alias("__us")
        )
        .where(F.col("event_type").isNotNull() & F.col("__us").isNotNull())
        .select(
            "event_type",
            epoch_floor_index(F.col("__us"), 86_400_000_000).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .persist()
    )
    bounds = counts.agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    types = counts.groupBy("event_type").agg(
        F.sum("n_events").cast("bigint").alias("__t")
    )
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "__t",
            F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias(
                "day"
            ),
            (F.col("__d1") - F.col("__d0") + 1).alias("__n"),
        )
    )
    dense = spine.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        "__t",
        "__n",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
    )
    d = F.col("__n") * F.col("n_events") - F.col("__t")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = dense.withColumn("__pre", F.sum(d).over(wc))
    scored = pre.select(
        "event_type",
        "day",
        "n_events",
        "__t",
        "__n",
        (
            F.col("__pre")
            - F.least(F.lit(0).cast("bigint"), F.min("__pre").over(wc))
        ).alias("__su"),
        (
            F.greatest(F.lit(0).cast("bigint"), F.max("__pre").over(wc))
            - F.col("__pre")
        ).alias("__sd"),
    )
    gate = F.lit(int(threshold_ppm)).cast("bigint") * F.col("__t") * F.col(
        "__n"
    )
    million = F.lit(1_000_000).cast("bigint")
    out = scored.select(
        "event_type",
        "day",
        "n_events",
        F.round(
            F.col("__su").cast("double") / F.col("__n").cast("double"), 6
        ).alias("cusum_up"),
        F.round(
            F.col("__sd").cast("double") / F.col("__n").cast("double"), 6
        ).alias("cusum_down"),
        (million * F.col("__su") > gate).alias("flag_up"),
        (million * F.col("__sd") > gate).alias("flag_down"),
    )
    # counts feeds bounds, totals and the dense join — expose the
    # lazy pin for caller release.
    out._cached_inputs = [counts]
    return out


def fano_burstiness(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event-type burstiness as the exact Fano factor
    (variance-to-mean ratio of hourly counts): 1 for a Poisson
    arrival process, > 1 for bursty types (incident storms,
    crawler waves, batch jobs), < 1 for regular/throttled ones.
    The binning-free spike screen next to event_rate_spikes (which
    flags WHICH hours spiked; this scores HOW bursty a type is
    overall) and hourly_acf (periodicity, not dispersion).

    No reference twin — extends SURVEY §2.2's events family.

    Exactness: over the inclusive global hour span [min_h, max_h]
    (n hours — a 1-row broadcast bounds aggregate, the Q11
    pattern), with hourly counts x_i (missing hours are real zeros:
    they contribute to n but not to Σx, so no spine densification
    is ever materialized), Fano = s²/mean with the population
    variance — as the exact integer fraction
    (n·Σx² − (Σx)²) / (n·Σx). Both sides are DECIMAL(38,0),
    VARCHAR-rendered (the KS/AUC/Gini numerator convention); the
    statistic is ONE rounded double division. Bit-deterministic
    across engines and partitionings.

    Scale shape: one map-combined (type, hour) count is the only
    corpus-sized shuffle; the per-type moment aggregate runs over
    the hour histogram (types × active hours); the bounds cross is
    1-row broadcast. No windows, no collects, no UDFs.

    Output: (event_type, n_hours, n_events, fano_num VARCHAR,
    fano_den VARCHAR, fano DOUBLE) — fano NULL for a type with
    zero events in span (cannot occur by construction: types come
    from the events themselves).
    """
    hourly = (
        events.select(
            F.col(type_col).alias("__t"),
            F.date_trunc("hour", F.col(ts_col)).alias("__h"),
        )
        .where(F.col("__t").isNotNull() & F.col("__h").isNotNull())
        .groupBy("__t", "__h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__x"))
    )
    return fano_from_histogram(
        hourly.select(
            F.col("__t").alias(type_col),
            F.col("__h").alias("hour"),
            F.col("__x").alias("n"),
        ),
        type_col,
    )


def fano_from_histogram(
    hist: DataFrame,
    type_col: str = "event_type",
    hour_col: str = "hour",
    count_col: str = "n",
) -> DataFrame:
    """The post-histogram half of :func:`fano_burstiness`: the exact
    Fano fraction from a (type, hour, count) histogram. The
    histogram is a MONOID under union + groupBy-sum, so a streaming
    maintainer (streaming/fano.py) folds batch histograms and calls
    this per trigger — identical to the full-relation operator by
    construction (shared code path, pinned by the streaming twin).

    Timezone contract: the inclusive hour span is computed in
    WALL-CLOCK terms (datediff·24 + hour-of-day delta), matching the
    oracle's ``date_diff('hour', ...)``. For a TIMESTAMP_NTZ hour
    column that is timezone-independent by construction; for a
    TIMESTAMP (instant) column the wall-clock rendering depends on
    the session timezone, so a UTC session is REQUIRED and asserted
    here — a DST gap/overlap in any other zone would silently
    disagree with the oracle's naive arithmetic."""
    hourly = hist.select(
        F.col(type_col).alias("__t"),
        F.col(hour_col).alias("__h"),
        F.col(count_col).cast("bigint").alias("__x"),
    )
    if dict(hourly.dtypes)["__h"] == "timestamp":
        tz = hist.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise ValueError(
                "fano_from_histogram requires a UTC session timezone "
                f"for TIMESTAMP hour columns (got {tz!r}); cast the "
                "hour column to TIMESTAMP_NTZ for timezone-"
                "independent wall-clock spans"
            )
    bounds = hourly.agg(
        (
            F.datediff(F.to_date(F.max("__h")), F.to_date(F.min("__h")))
            * F.lit(24)
            + (F.hour(F.max("__h")) - F.hour(F.min("__h")))
            + 1
        )
        .cast("bigint")
        .alias("__n")
    )
    dec38 = "decimal(38,0)"
    moments = hourly.groupBy(F.col("__t").alias(type_col)).agg(
        F.sum("__x").cast(dec38).alias("__sx"),
        F.sum(F.col("__x") * F.col("__x")).cast(dec38).alias("__sxx"),
    )
    num = (
        F.col("__n").cast(dec38) * F.col("__sxx")
        - F.col("__sx") * F.col("__sx")
    )
    den = F.col("__n").cast(dec38) * F.col("__sx")
    return moments.crossJoin(F.broadcast(bounds)).select(
        type_col,
        F.col("__n").alias("n_hours"),
        F.col("__sx").cast("bigint").alias("n_events"),
        num.cast(dec38).cast("string").alias("fano_num"),
        den.cast(dec38).cast("string").alias("fano_den"),
        F.when(
            F.col("__sx") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("fano"),
    )
