"""Foreign-key integrity reporting.

Reference parity: db.py:63-67 — offers referencing missing products
are skipped (logged), not fatal. Spark-first: instead of catching
per-batch FK violations, classify every child row in one pass with a
LEFT JOIN against the parent keys and report valid/orphan counts;
``valid_only`` gives the tolerant-load projection (the rows the
reference would have kept).

Scale: parent key set is projected to its key column only →
broadcast join, zero shuffle on the child (fact) side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_integrity_report(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    group_by: str,
) -> DataFrame:
    """Per-``group_by`` counts of FK-valid vs orphan child rows."""
    parent_keys = parent.select(F.col(pk).alias("__pk")).distinct()
    joined = child.join(
        F.broadcast(parent_keys), child[fk] == F.col("__pk"), "left"
    )
    return (
        joined.groupBy(group_by)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("__pk").alias("n_valid"),
            (F.count(F.lit(1)) - F.count("__pk")).alias("n_orphan"),
        )
    )


def valid_only(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Tolerant-load projection: child rows whose FK exists (semi join)."""
    parent_keys = parent.select(F.col(pk).alias("__pk")).distinct()
    return child.join(F.broadcast(parent_keys), child[fk] == F.col("__pk"), "left_semi")


def profile_numeric_columns(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Dataset profile for numeric columns in ONE scan: every
    per-column statistic is an aggregate in a single wide
    aggregation row (Catalyst computes them all map-side in the same
    pass), then `stack` unpivots to one row per column. Profiling N
    columns costs one table scan, not N — the difference between a
    nightly data-quality job that reads 100 TB once and one that
    reads it per column.

    Output per column: n_rows, n_null, n_distinct (exact),
    min/max/sum as DOUBLE (sum decimal-exact first, so the double is
    engine-portable).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}__nulls"
            ),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
            F.sum(F.col(c).cast("decimal(28,2)")).cast("double").alias(
                f"{c}__sum"
            ),
        ]
    wide = df.agg(*aggs)
    # backtick-quote the generated references: a column name that is
    # not a bare identifier ('unit-price', a space, …) would otherwise
    # parse as an expression (subtraction) or fail outright — the
    # aliases above were created via .alias() and survive any name
    stack_expr = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__dist`,"
        f" `{c}__min`, `{c}__max`, `{c}__sum`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr})"
            " AS (column, n_rows, n_null, n_distinct, min_v, max_v, sum_v)"
        )
    )


def schema_drift_report(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Column-level drift between two snapshots of the same logical
    table — the check an ingestion pipeline runs on every new batch
    before appending it to 100 TB of history.

    One profiling scan per side (the wide-aggregate trick from
    :func:`profile_numeric_columns`), joined on column name. Output
    per column: row counts, null-RATE on each side and the delta,
    distinct counts and their ratio — the signals that catch a
    upstream schema/semantics change (a column silently going
    all-NULL, an enum collapsing, an id column losing uniqueness)
    before it lands.

    Type changes surface structurally: profiling casts to double, so
    a column that stops being castable shows NULL min/max with a
    null-rate jump. Presence changes (added/removed columns) are
    driver-side schema facts — compare ``df.columns`` directly; this
    relation covers the value-level drift of the shared columns.
    """
    po = profile_numeric_columns(old, cols).select(
        "column",
        F.col("n_rows").alias("old_n"),
        (F.col("n_null").cast("double") / F.col("n_rows")).alias("__onr"),
        F.col("n_distinct").alias("old_distinct"),
    )
    pn = profile_numeric_columns(new, cols).select(
        "column",
        F.col("n_rows").alias("new_n"),
        (F.col("n_null").cast("double") / F.col("n_rows")).alias("__nnr"),
        F.col("n_distinct").alias("new_distinct"),
    )
    return po.join(pn, "column").select(
        "column",
        "old_n",
        "new_n",
        F.round("__onr", 6).alias("old_null_rate"),
        F.round("__nnr", 6).alias("new_null_rate"),
        F.round(F.col("__nnr") - F.col("__onr"), 6).alias("null_rate_delta"),
        "old_distinct",
        "new_distinct",
        F.round(
            F.col("new_distinct").cast("double")
            / F.greatest(F.col("old_distinct"), F.lit(1)),
            6,
        ).alias("distinct_ratio"),
    )


def dataset_fingerprint(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Order-insensitive content fingerprint of a dataset: ONE row
    (n_rows, xor_hash, sum_hash) that two pipeline runs can compare
    to prove they produced the identical multiset of rows — the
    reproducibility primitive behind "the refactor was a no-op" and
    "the rerun matched", without ever sorting or collecting the data.

    Per row: md5 over the joined column renderings, truncated to 60
    bits. Each rendering is LENGTH-PREFIXED (``V<len>:<value>``,
    NULL is the bare token ``N``), which makes the concatenation a
    prefix code — injective for ANY value content, including values
    that themselves contain the join separator or control
    characters (a plain separator-join would let
    ('a\\x1fb','c') collide with ('a','b\\x1fc'), and a literal
    NULL-sentinel string collide with NULL). Two independent ORDER-INSENSITIVE folds:
    - ``xor_hash``: bit_xor of the row hashes — insensitive to
      partitioning and row order, but an even number of identical
      rows cancels;
    - ``sum_hash``: DECIMAL(38)-exact sum of the row hashes
      (overflow-free to ~1e18 rows), which catches exactly the
      duplicate-multiplicity changes XOR misses.
    Together with n_rows a collision requires simultaneous xor-,
    sum- and count-preservation — not constructible by accident.

    Map-only + one 1-row aggregate; both folds are commutative, so
    the result is bit-identical across partitionings, engines and
    runs. Caveat: column RENDERING must be engine-stable — BIGINT
    and STRING columns are exact; canonicalize floats/timestamps
    (ts_micros, ROUND) upstream before fingerprinting them.

    ``group_cols`` emits one fingerprint row PER GROUP — the
    manifest shape for partitioned datasets: fingerprint each
    date/source partition, then a rerun compares manifests and
    re-validates only the partitions whose rows moved, never the
    whole 100 TB (the group columns join the hash like every other
    column, so moving a row BETWEEN groups changes both groups'
    rows).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    group_cols = list(group_cols or [])

    def _render(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
        )

    parts = [_render(c) for c in cols]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15), 16, 10
    ).cast("bigint")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("__h").alias("xor_hash"),
        F.sum(F.col("__h").cast("decimal(38,0)")).cast("string").alias("sum_hash"),
    ]
    keyed = df.select(*group_cols, h.alias("__h"))
    if group_cols:
        return keyed.groupBy(*group_cols).agg(*aggs)
    return keyed.agg(*aggs)


def freshness_report(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-group data freshness: row count, latest event time, and
    lag behind the freshest group — the staleness dashboard every
    multi-source ingestion runs (a source whose lag grows is a dead
    feed long before volume alarms fire). Data-derived reference
    (global max ts) so replays are deterministic — no wall clock.

    One map-side-combined aggregate to #groups rows, then the global
    max via a window over that tiny relation. Emits
    (group, n_rows, latest_us, lag_us).
    """
    from pyspark.sql.window import Window

    from ..functions.timeutil import ts_micros

    per = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(ts_micros(F.col(ts_col))).alias("latest_us"),
    )
    w_all = Window.partitionBy()
    return per.select(
        group_col,
        "n_rows",
        "latest_us",
        (F.max("latest_us").over(w_all) - F.col("latest_us")).alias("lag_us"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity suppression over a set of quasi-identifier
    columns — the privacy gate a training corpus passes before
    release: any combination of quasi-identifiers shared by fewer
    than k rows could single out an individual, so those equivalence
    classes are suppressed into one ``*`` residual bucket instead of
    being published.

    Classes with n >= k keep their values (suppressed=false,
    n_classes=1); all smaller classes merge into a single row with
    every quasi-identifier replaced by ``*``, carrying the merged
    row count and how many distinct classes were folded in. The
    residual row appears only when at least one class is below k, so
    a fully-anonymous table reports exactly its classes.

    Plan: one map-side-combined groupBy to #classes rows; the
    suppression split and residual fold both run on that tiny
    relation (a #classes-sized aggregate), so nothing corpus-sized
    is touched twice. All counts BIGINT-exact.
    """
    cls = df.groupBy(*[F.col(c).cast("string").alias(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    safe = cls.where(F.col("__n") >= k).select(
        *quasi_cols,
        F.col("__n").cast("bigint").alias("n_rows"),
        F.lit(1).cast("bigint").alias("n_classes"),
        F.lit(False).alias("suppressed"),
    )
    residual = (
        cls.where(F.col("__n") < k)
        .agg(
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        )
        .where(F.col("n_classes") > 0)
        .select(
            *[F.lit("*").alias(c) for c in quasi_cols],
            "n_rows",
            "n_classes",
            F.lit(True).alias("suppressed"),
        )
    )
    return safe.unionByName(residual)


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_min: int = 2,
) -> DataFrame:
    """l-diversity audit over quasi-identifier classes — the screen
    k-anonymity misses (Machanavajjhala et al. 2007): a class can
    hold k rows and STILL leak if every row shares one sensitive
    value (the homogeneity attack — "all 12 people in this
    (zip, age) cell have the same diagnosis"). Reports, per
    equivalence class: row count, distinct sensitive values l, the
    top sensitive value's share (the skewness the strict entropy
    variant guards), and whether the class meets ``l_min``.

    No reference twin — extends SURVEY §2.3's privacy family
    (k_anonymity_report's companion audit; run both before release).

    Exactness: counts are exact BIGINTs from two map-combined
    groupBys (class × sensitive, then class); top-share is ONE
    rounded division off MAX(per-value count). The (class,
    sensitive) relation is the only corpus-sized shuffle; the class
    rollup aggregates from it (never a second corpus pass, never a
    window).

    Output: (quasi_cols..., n_rows, n_sensitive, top_share, diverse)
    — diverse = n_sensitive >= l_min.
    """
    cs = df.groupBy(
        *[F.col(c).cast("string").alias(c) for c in quasi_cols],
        F.col(sensitive_col).cast("string").alias("__s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    cls = cs.groupBy(*quasi_cols).agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
        F.max("__n").cast("bigint").alias("__top"),
    )
    return cls.select(
        *quasi_cols,
        "n_rows",
        "n_sensitive",
        F.round(
            F.col("__top").cast("double") / F.col("n_rows").cast("double"),
            6,
        ).alias("top_share"),
        (F.col("n_sensitive") >= F.lit(int(l_min))).alias("diverse"),
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    dec_type: str = "decimal(12,2)",
) -> DataFrame:
    """Pearson correlation matrix over numeric columns, exact and
    engine-deterministic — the feature-redundancy / drift-diagnosis
    pass run before training on tabular features.

    One corpus scan computes every moment (count, per-column sums,
    all pairwise product sums) in a SINGLE aggregate — the classic
    one-pass sufficient-statistics trick, so k columns cost k(k+3)/2
    map-side-combined sums, never k^2 scans. The 6-or-so output rows
    then unfold from the one-row moment relation with an explode (no
    second pass). Built-in ``corr()`` is a double SUM under the hood
    — nondeterministic across partition orders, so each run (and
    each engine) would hash differently; instead every sum is
    decimal-exact (the money contract, functions/money.py) cast to
    double ONCE, and the final corr arithmetic is a fixed sequence
    of IEEE ops on identical doubles — bit-equal on any engine, any
    partitioning.

    ``dec_type`` must hold the inputs exactly (2-dp money / rates
    by default) and their pairwise products within 38 digits.

    Output: (col_x, col_y, corr double), one row per unordered pair
    x < y in the given column order.
    """
    cols = list(cols)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec_type)).cast("double").alias(f"s_{c}"))
    for i, x in enumerate(cols):
        for y in cols[i:]:
            aggs.append(
                F.sum(F.col(x).cast(dec_type) * F.col(y).cast(dec_type))
                .cast("double")
                .alias(f"p_{x}_{y}")
            )
    moments = df.agg(*aggs)

    def var_term(c: str):
        return F.col("n") * F.col(f"p_{c}_{c}") - F.col(f"s_{c}") * F.col(f"s_{c}")

    pairs = []
    for i, x in enumerate(cols):
        for y in cols[i + 1 :]:
            num = F.col("n") * F.col(f"p_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
            den = F.sqrt(var_term(x) * var_term(y))
            pairs.append(
                F.struct(
                    F.lit(x).alias("col_x"),
                    F.lit(y).alias("col_y"),
                    (num / den).alias("corr"),
                )
            )
    return moments.select(F.explode(F.array(*pairs)).alias("e")).select(
        "e.col_x", "e.col_y", "e.corr"
    )


def distribution_shift_report(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int = 10,
    sample_k: int = 1024,
    scale: int = 100,
) -> DataFrame:
    """Per-bin distribution comparison between two snapshots of a
    numeric column — the binning/counting half of a PSI
    (population stability index) drift check, the standard ML-ops
    gate between a training-time feature distribution and what
    production is serving now. schema_drift_report catches nulls
    and cardinality; this catches the SHAPE moving.

    Bin boundaries come from the OLD side's deterministic
    bottom-k-by-md5 sample quantiles (the quantile_bucketize
    contract — old is the reference distribution, so new-side mass
    piling into edge bins is exactly the signal); both sides then
    bucket map-only against the broadcast boundary array, one
    map-combined count each, and the report joins on a bin spine so
    empty bins still show. Values compare in integer
    ``scale``-ths (cents by default) so both engines bin
    identically.

    PSI itself is sum((share_new - share_old) * ln(share_new /
    share_old)) — a LOG over n_bins numbers: compute it driver-side
    from this (tiny) relation. The corpus-scale work (sampling,
    binning, counting) is all here; the log stays out of the
    engine-determinism surface (the bigram_surprisal argument).

    Output: (bin, n_old, n_new, share_old, share_new, share_delta),
    bins 0..n_bins-1; shares are exact-integer divisions (0.0 when
    a side is empty).
    """
    def cents(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.round(F.col(value_col) * scale, 0).cast("long").alias("__c"),
        ).where(F.col("__c").isNotNull())

    old_c, new_c = cents(old), cents(new)
    samp = (
        old_c.select("__c", F.md5(F.col("__id").cast("string")).alias("__h"))
        .orderBy("__h", "__c")
        .limit(sample_k)
    )
    arr = samp.agg(
        F.array_sort(F.collect_list("__c")).alias("__arr"),
        F.count(F.lit(1)).alias("__n"),
    )
    bounds = arr.select(
        F.array(
            *[
                F.when(
                    F.col("__n") > 0,
                    F.element_at(
                        "__arr",
                        (
                            F.floor(F.lit(i / n_bins) * (F.col("__n") - 1)) + 1
                        ).cast("int"),
                    ),
                )
                for i in range(1, n_bins)
            ]
        ).alias("__bnds")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(bounds))
            .select(
                F.size(
                    F.filter(F.col("__bnds"), lambda b: b <= F.col("__c"))
                ).cast("bigint").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    ).select(F.col("bin").cast("bigint").alias("bin"))
    joined = (
        spine.join(binned(old_c, "n_old"), "bin", "left")
        .join(binned(new_c, "n_new"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
    )
    # totals as windows over the n_bins-row report (lazy, bounded) —
    # never a composition-time count() (the plan-audit laziness rule)
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    share_old = F.when(
        F.sum("n_old").over(w) > 0,
        F.col("n_old").cast("double") / F.sum("n_old").over(w).cast("double"),
    ).otherwise(F.lit(0.0))
    share_new = F.when(
        F.sum("n_new").over(w) > 0,
        F.col("n_new").cast("double") / F.sum("n_new").over(w).cast("double"),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "bin",
        "n_old",
        "n_new",
        share_old.alias("share_old"),
        share_new.alias("share_new"),
        (share_new - share_old).alias("share_delta"),
    )


def benford_check(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixup screen for financial and
    measured quantities (naturally-occurring multi-scale positives
    follow P(d) = log10(1 + 1/d); flat or spiky first digits mean
    synthetic, truncated, or unit-mangled data).

    Digit extraction is string-free-of-floats: values round to
    integer ``scale``-ths first (SCALING by a power of ten never
    changes the leading significant digit — but the ROUNDING does
    quantize: a value within one decade of 1/scale can shift its
    leading digit, e.g. 0.095 → round(9.5) = 10 → digit 1 at
    scale=100, and positives below 0.5/scale round to 0 and are
    excluded entirely; pick ``scale`` ≥ 10/min-magnitude so the
    quantization artifacts stay out of the tested digits), and the
    leading digit is the first character of the BIGINT's decimal
    rendering — identical across engines, where double-to-string
    formatting is not. Non-positive values are excluded (Benford
    applies to positive magnitudes). One map-combined 9-row
    aggregate; the expected shares fold in as driver literals
    (constants, not engine math).

    Output: (digit 1-9, n, share, expected, delta) — share and
    delta are exact-integer divisions against the kept-row total.
    """
    import math

    from pyspark.sql.window import Window

    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    kept = df.select(cents.alias("__c")).where(F.col("__c") > 0)
    digit = F.substring(F.col("__c").cast("string"), 1, 1).cast("bigint")
    counts = kept.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # unpartitioned window over the <=9-row digit relation only
    w_tot = F.sum("n").over(Window.partitionBy())
    expected = F.element_at(
        F.array(
            *[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)]
        ),
        F.col("digit").cast("int"),
    )
    return counts.select(
        "digit",
        "n",
        (F.col("n").cast("double") / w_tot.cast("double")).alias("share"),
        expected.alias("expected"),
        (
            F.col("n").cast("double") / w_tot.cast("double") - expected
        ).alias("delta"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov statistic of an
    integer-valued column against the REST of the relation — the
    nonparametric drift screen that catches any distributional
    difference (location, spread, shape) without binning choices:
    D = max_x |F_group(x) − F_rest(x)|. distribution_shift_report
    compares two snapshots through sampled bins; this compares each
    slice to its complement exactly, the "is this source's length
    profile unlike everything else?" question a corpus curator asks
    before weighting sources.

    No reference twin — the reference (397 LoC ETL) has no
    statistics; extends SURVEY §2.3's integrity family.

    Exactness: with c_g(x) = group count at value x, n_g the group
    total, the vertical gap at x is |cum_g·n_rest − cum_rest·n_g| /
    (n_g·n_rest) — the NUMERATOR is exact integer arithmetic, so the
    argmax (and the statistic as one final double division) is
    bit-deterministic across engines and partitionings; products are
    DECIMAL(38,0) so 10^12-row inputs stay inside the 38-digit cap.
    ``at_value`` is the smallest value attaining the max (ties break
    low, pinned).

    Scale shape: the corpus collapses in ONE map-side-combined
    groupBy to the (group, value) histogram; every later stage —
    the per-value total, the group×value spine (distinct groups
    crossJoin'd onto the value spine, group side broadcast:
    categorical cardinality), the cumulative windows — runs over
    histogram-sized relations partitioned by group. No window ever
    sees raw rows; a 100 TB input with bounded value range pays the
    one aggregate plus bounded-size joins.

    Output: (group_col, n_group, n_rest, d_num VARCHAR-rendered
    exact numerator, at_value, d) — d is the one double division,
    rounded to 6 places like the cosine family.

    The post-histogram math is :func:`ks_from_histogram` — the
    streaming twin folds batch histograms (union + sum, an exact
    monoid) and reuses the SAME code path, so batch-folded and
    full-relation reports are identical by construction.
    """
    h = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("bigint").alias("__v"),
        )
        .where(F.col("__g").isNotNull() & F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    return ks_from_histogram(
        h.select(
            F.col("__g").alias(group_col),
            F.col("__v").alias(value_col),
            F.col("__c").alias("n"),
        ),
        group_col,
        value_col,
    )


def ks_from_histogram(
    hist: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str = "n",
) -> DataFrame:
    """The post-histogram half of :func:`ks_two_sample`: per-group KS
    vs rest from an exact (group, value, count) histogram. The
    histogram is a MONOID under union + groupBy-sum, so a streaming
    maintainer folds batch histograms and calls this per trigger —
    identical output to the full-relation operator by construction
    (shared code path, pytest-pinned by the streaming twin)."""
    from pyspark.sql.window import Window

    h = hist.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("bigint").alias("__v"),
        F.col(count_col).cast("bigint").alias("__c"),
    )
    tot = h.groupBy("__v").agg(F.sum("__c").cast("bigint").alias("__cv"))
    groups = h.select("__g").distinct()
    grid = (
        tot.crossJoin(F.broadcast(groups))
        .join(h, ["__g", "__v"], "left")
        .select(
            "__g",
            "__v",
            F.coalesce("__c", F.lit(0)).cast("bigint").alias("__c"),
            "__cv",
        )
    )
    w_cum = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("__g")
    dec = "decimal(38,0)"
    cum_g = F.sum("__c").over(w_cum).cast(dec)
    cum_t = F.sum("__cv").over(w_cum).cast(dec)
    n_g = F.sum("__c").over(w_all).cast(dec)
    n_all = F.sum("__cv").over(w_all).cast(dec)
    scored = grid.select(
        "__g",
        "__v",
        n_g.alias("__ng"),
        (n_all - n_g).alias("__nr"),
        F.abs(
            cum_g * (n_all - n_g) - (cum_t - cum_g) * n_g
        ).alias("__dnum"),
    )
    w_pick = Window.partitionBy("__g").orderBy(
        F.col("__dnum").desc(), F.col("__v").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__g").alias(group_col),
            F.col("__ng").cast("bigint").alias("n_group"),
            F.col("__nr").cast("bigint").alias("n_rest"),
            F.col("__dnum").cast("string").alias("d_num"),
            F.col("__v").alias("at_value"),
            F.round(
                F.col("__dnum").cast("double")
                / (F.col("__ng").cast("double") * F.col("__nr").cast("double")),
                6,
            ).alias("d"),
        )
    )


def histogram_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group distribution OVERLAP coefficient vs the rest of the
    relation — Σ_v min(p_group(v), p_rest(v)) ∈ [0, 1]: 1 means the
    two distributions coincide, 0 disjoint support. The integral
    companion to :func:`ks_two_sample` (KS reports the WORST vertical
    gap — sensitive to one sharp local difference; overlap reports
    how much total mass the distributions share — the "how much of
    this source looks like everything else" number a mix planner
    weights by).

    No reference twin — extends SURVEY §2.3's integrity family.

    Exactness: with c_g(v) the group count at v, c_r(v) = total(v) −
    c_g(v), the shared mass is Σ min(c_g(v)·n_rest, c_r(v)·n_g) /
    (n_g·n_rest) — the numerator is exact DECIMAL(38,0) integer
    arithmetic (VARCHAR-rendered, the KS/AUC/Gini convention), the
    statistic one rounded double division. Values the group never
    hits contribute min(0, ·) = 0, so only OBSERVED histogram rows
    are ever touched — no group×value spine, and unlike KS **no
    cumulative window at all**: two joins and two map-combined
    aggregates end-to-end.

    Scale shape: the corpus collapses in ONE map-combined groupBy to
    the (group, value) histogram; per-value totals join back on the
    value key, per-group totals are a categorical broadcast, the
    grand total a 1-row broadcast cross (the Q11 pattern). The
    histogram is the same monoid streaming/ks_drift.py folds — call
    :func:`overlap_from_histogram` on that state for a streaming
    overlap report.

    Output: (group_col, n_group, n_rest, overlap_num VARCHAR,
    overlap DOUBLE), one row per group; overlap NULL when the rest
    is empty (single-group relation).
    """
    h = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("bigint").alias("__v"),
        )
        .where(F.col("__g").isNotNull() & F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    return overlap_from_histogram(
        h.select(
            F.col("__g").alias(group_col),
            F.col("__v").alias(value_col),
            F.col("__c").alias("n"),
        ),
        group_col,
        value_col,
    )


def overlap_from_histogram(
    hist: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str = "n",
) -> DataFrame:
    """The post-histogram half of :func:`histogram_overlap` — runs
    over the same (group, value, count) monoid streaming/ks_drift.py
    maintains, so a KS drift stream gets the overlap report from the
    SAME folded state for free."""
    h = hist.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("bigint").alias("__v"),
        F.col(count_col).cast("bigint").alias("__c"),
    )
    tot_v = h.groupBy("__v").agg(
        F.sum("__c").cast("bigint").alias("__cv")
    )
    tot_g = h.groupBy("__g").agg(
        F.sum("__c").cast("bigint").alias("__ng")
    )
    grand = h.agg(F.sum("__c").cast("bigint").alias("__n"))
    dec = "decimal(38,0)"
    ng = F.col("__ng").cast(dec)
    nr = (F.col("__n") - F.col("__ng")).cast(dec)
    cg = F.col("__c").cast(dec)
    cr = (F.col("__cv") - F.col("__c")).cast(dec)
    scored = (
        h.join(tot_v, "__v")
        .join(F.broadcast(tot_g), "__g")
        .crossJoin(F.broadcast(grand))
        .select(
            "__g",
            F.col("__ng"),
            nr.cast("bigint").alias("__nr"),
            F.least(cg * nr, cr * ng).alias("__m"),
        )
    )
    num = F.sum("__m").cast(dec)
    return scored.groupBy(F.col("__g").alias(group_col)).agg(
        F.first("__ng").cast("bigint").alias("n_group"),
        F.first("__nr").cast("bigint").alias("n_rest"),
        num.cast("string").alias("overlap_num"),
        F.when(
            (F.first("__ng") > 0) & (F.first("__nr") > 0),
            F.round(
                num.cast("double")
                / (
                    F.first("__ng").cast("double")
                    * F.first("__nr").cast("double")
                ),
                6,
            ),
        ).alias("overlap"),
    )
