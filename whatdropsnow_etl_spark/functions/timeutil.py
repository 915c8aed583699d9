"""Timestamp helpers robust to physical encoding.

The testdata's parquet timestamp encoding has changed between rounds
(INT64 TIMESTAMP(NANOS) -> naive timestamp[us]); Spark surfaces those
as bigint / TIMESTAMP_NTZ / TIMESTAMP depending on flags. The loader
(`sources.tables.load_table`) canonicalizes to TIMESTAMP with the
session at UTC, but library operators should not *require* callers to
have gone through the loader — so epoch extraction here tolerates any
flavor via a no-op-when-already-canonical cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds from a timestamp column of any flavor.

    `cast("timestamp")` is a no-op on TIMESTAMP and a pure re-tag on
    TIMESTAMP_NTZ when the session timezone is UTC (the loader pins
    it); `F.unix_micros` then works uniformly. Stays JVM-side /
    codegen-friendly — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_floor_index(us: Column, period_us: int) -> Column:
    """floor(us / period_us) as BIGINT, exact for ALL int64 epochs —
    the day/week/hour index every bucketing operator shares.
    pmod(us, P) is the nonnegative remainder, so (us - pmod) is an
    exact multiple of P; routing the division through DECIMAL(38,0)
    keeps it exact past 2^53 where a double quotient would round
    (the corr_matrix VARCHAR-route lesson, applied to time). The
    oracle twin is ``(us - ((us % P + P) % P)) // P`` — truncating
    division on an exact multiple IS floor division.
    """
    pm = F.pmod(us, F.lit(period_us))
    return (
        (us - pm).cast("decimal(38,0)") / F.lit(period_us)
    ).cast("bigint")


def epoch_day_cell(us: Column) -> tuple[Column, Column]:
    """(dow, hour) from epoch-microseconds via FLOOR division — the
    shared cell arithmetic for weekly_seasonality and its streaming
    fold. Spark's `div`/`%` truncate toward zero, which for pre-1970
    (negative) epochs yields a negative hour and an off-by-one day;
    floor semantics keep dow in 0..6 (0 = Sunday; epoch day 0 was a
    Thursday) and hour in 0..23 for ALL epochs. pmod(us, P) is the
    nonnegative remainder, so every division here runs on a
    pmod-bounded NONNEGATIVE value (< one week in micros, < 2^53):
    the double-typed `/` is exact and the bigint cast is a true
    floor — no int64-scale double rounding, no UDF.
    """
    week = F.pmod(us, F.lit(604_800_000_000))
    day_in_week = (week / F.lit(86_400_000_000)).cast("bigint")
    dow = F.pmod(day_in_week + 4, F.lit(7)).cast("bigint")
    pm = F.pmod(us, F.lit(86_400_000_000))
    hour = (pm / F.lit(3_600_000_000)).cast("bigint")
    return dow, hour
