"""As-of join — the point-in-time lookup Spark has no operator for.

Attach to every left row the most recent right row for the same key
with ``right.ts <= left.ts`` (backward; forward is the mirror). The
classic uses: event enriched with the dimension state that was
current when it happened; trade joined to the last quote.

Spark-first formulation (no range join, no per-key loops): UNION the
two sides with a side marker, one window per key ordered by
(ts, side) — right rows sort before left rows at equal ts, so ties
match — and carry the right-side values forward with
``last(..., ignorenulls=True)``. One shuffle on the key, linear
scan within partitions; at 100 TB this is a single exchange of
both inputs co-partitioned on the key, which is the lower bound for
any per-key temporal alignment.

Contract: right must be unique per (key, ts) — pre-aggregate if not
(ambiguous as-of matches are a modeling bug, not something to
resolve silently). Unmatched left rows keep NULL values; with
``tolerance_us`` set, matches older than the tolerance are nulled
the same way (pandas merge_asof semantics).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whatdropsnow_etl_spark.functions.timeutil import ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Mapping[str, str] | Sequence[str],
    direction: str = "backward",
    tolerance_us: int | None = None,
    matched_ts_alias: str = "matched_ts_us",
) -> DataFrame:
    """Backward/forward/nearest as-of join on ``by_cols`` over
    ``ts_col`` (nearest = pandas merge_asof direction='nearest':
    the closer of the two candidates, ties to backward).

    ``value_cols`` maps right column -> output alias (a plain
    sequence aliases each to itself). Output = every left column,
    plus the aliased right values, plus ``matched_ts_alias``
    (epoch-micros BIGINT of the matched right timestamp, NULL when
    no match).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if not isinstance(value_cols, Mapping):
        value_cols = {c: c for c in value_cols}
    by_cols = list(by_cols)

    left_cols = left.columns
    # side marker orders right rows before left at equal ts for
    # backward (right visible to same-ts left), after for forward
    l = left.select(
        *by_cols,
        ts_micros(F.col(ts_col)).alias("__ts_us"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols if c not in by_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in value_cols],
    )
    r = right.select(
        *by_cols,
        ts_micros(F.col(ts_col)).alias("__ts_us"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in by_cols
        ],
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    if direction == "nearest":
        # pandas merge_asof direction='nearest': the closer of the
        # backward and forward candidates, ties to backward. Both
        # carries run over the SAME hash partitioning (one exchange,
        # two in-partition sorts — still the single-shuffle lower
        # bound for per-key temporal alignment). Tolerance applies
        # per direction before the distance comparison.
        wb = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col("__ts_us").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col("__ts_us").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # carry ts + values as ONE struct so the match is always
        # row-consistent: separate ignorenulls carries would skip a
        # right row whose VALUE is NULL and pair its timestamp with
        # an older row's value (a chimera no row-wise oracle emits)
        right_row = F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__ts_us").alias("ts"),
                *[F.col(f"__rv_{c}").alias(f"v_{c}") for c in value_cols],
            ),
        )
        sel = (
            unioned.select(
                "*",
                F.last(right_row, ignorenulls=True).over(wb).alias("__b"),
                F.last(right_row, ignorenulls=True).over(wf).alias("__f"),
            )
            .where(F.col("__side") == 1)
            .select(
                "*",
                F.col("__b.ts").alias("__b_ts"),
                F.col("__f.ts").alias("__f_ts"),
                *[F.col(f"__b.v_{c}").alias(f"__b_{c}") for c in value_cols],
                *[F.col(f"__f.v_{c}").alias(f"__f_{c}") for c in value_cols],
            )
        )
        gap_b = F.col("__ts_us") - F.col("__b_ts")
        gap_f = F.col("__f_ts") - F.col("__ts_us")
        in_tol_b = (
            gap_b <= F.lit(tolerance_us) if tolerance_us is not None else F.lit(True)
        )
        in_tol_f = (
            gap_f <= F.lit(tolerance_us) if tolerance_us is not None else F.lit(True)
        )
        valid_b = F.col("__b_ts").isNotNull() & in_tol_b
        valid_f = F.col("__f_ts").isNotNull() & in_tol_f
        use_b = valid_b & (~valid_f | (gap_b <= gap_f))
        return sel.select(
            *[F.col(c) for c in left_cols],
            *[
                F.when(use_b, F.col(f"__b_{c}"))
                .when(valid_f, F.col(f"__f_{c}"))
                .alias(alias)
                for c, alias in value_cols.items()
            ],
            F.when(use_b, F.col("__b_ts"))
            .when(valid_f, F.col("__f_ts"))
            .alias(matched_ts_alias),
        )
    order = (
        [F.col("__ts_us").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__ts_us").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # one-struct carry: see the nearest branch — keeps a NULL-valued
    # right row's match row-consistent instead of chimeric
    right_row = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__ts_us").alias("ts"),
            *[F.col(f"__rv_{c}").alias(f"v_{c}") for c in value_cols],
        ),
    )
    marked = (
        unioned.select(
            "*",
            F.last(right_row, ignorenulls=True).over(w).alias("__m"),
        )
        .where(F.col("__side") == 1)
        .select(
            "*",
            F.col("__m.ts").alias("__m_ts"),
            *[F.col(f"__m.v_{c}").alias(f"__m_{c}") for c in value_cols],
        )
    )
    if tolerance_us is not None:
        gap = (
            F.col("__ts_us") - F.col("__m_ts")
            if direction == "backward"
            else F.col("__m_ts") - F.col("__ts_us")
        )
        in_tol = gap <= F.lit(tolerance_us)
    else:
        in_tol = F.lit(True)
    keep = F.col("__m_ts").isNotNull() & in_tol
    return marked.select(
        *[F.col(c) for c in left_cols],
        *[
            F.when(keep, F.col(f"__m_{c}")).alias(alias)
            for c, alias in value_cols.items()
        ],
        F.when(keep, F.col("__m_ts")).alias(matched_ts_alias),
    )
