"""Survival analysis over the events stream: the Kaplan-Meier risk
table for time-to-churn — the lifecycle question retention_cohorts
answers per calendar cohort, reframed per elapsed-time: "of the users
still around after t days, what fraction churn AT t?"

The estimator's product form (S(t) = Π (1 - d_i/n_i)) needs
transcendental-free sequential arithmetic to stay bit-deterministic
across engines, so this module reports the exact RISK TABLE — per
duration t: n_risk, churned, censored, and the one-division hazard —
and leaves the survival product to the caller (cumulative products
via EXP(SUM(LN)) would hang determinism on libm, the reason
bigram_surprisal measures whole bits; see corpus._floor_log2_ratio).

No reference twin — extends SURVEY §2.2's events family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def survival_hazard(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_gap_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier risk table for user time-to-churn.

    Per user: duration = floor days between first and last event;
    CHURNED if the last event sits more than ``churn_gap_days``
    before the global max timestamp (otherwise the observation is
    right-CENSORED — the user may still return). For each distinct
    duration t: n_risk = users with duration >= t, n_churned /
    n_censored = users ending at exactly t, hazard = n_churned /
    n_risk.

    Exactness: durations come from the shared exact floor-index
    helper (timeutil.epoch_floor_index on the nonnegative
    last-first difference); the churn gate compares exact integer
    micros; every count is BIGINT; hazard is ONE rounded division.
    Bit-deterministic across engines and partitionings.

    Scale shape: one map-combined (user -> first/last) aggregate is
    the only corpus-sized shuffle; the global max is a 1-row
    broadcast (the Q11 pattern); n_risk accumulates over the
    duration HISTOGRAM via the bounded broadcast self-join
    (b.t >= a.t — the budget_curve_from_bins convention, span-days
    rows, never a global window's single partition). No UDFs, no
    collects.

    Output: (t_days, n_risk, n_churned, n_censored, hazard) — one
    row per duration with at least one user ending there, hazard
    rounded 6dp.
    """
    from ..functions.timeutil import ts_micros

    us = ts_micros(F.col(ts_col))
    per_user = (
        events.select(F.col(user_col).alias("__u"), us.alias("__us"))
        .where(F.col("__u").isNotNull() & F.col("__us").isNotNull())
        .groupBy("__u")
        .agg(
            F.min("__us").alias("first_us"),
            F.max("__us").alias("last_us"),
        )
    )
    return hazard_from_user_bounds(per_user, churn_gap_days=churn_gap_days)


def hazard_from_user_bounds(
    per_user: DataFrame, churn_gap_days: int = 7
) -> DataFrame:
    """The post-bounds half of :func:`survival_hazard` — churn
    marking, duration histogram and hazards from the per-user
    (first_us, last_us) epoch-micros bounds, which are a MONOID
    under union + groupBy-min/max. Split out (the
    fano_from_histogram convention) so streaming maintenance
    (streaming/survival.py) reports through the SAME arithmetic the
    batch operator runs."""
    from ..functions.timeutil import epoch_floor_index

    # per_user feeds both the global-max aggregate and the marking
    # pass — lazy persist so the upstream lineage (a corpus-sized
    # groupBy in the batch path) runs once (the rank_correlation
    # subplan-reuse lesson).
    per_user = per_user.persist()
    mx = per_user.agg(F.max("last_us").alias("__mx"))
    gap_us = int(churn_gap_days) * _DAY_US
    marked = per_user.crossJoin(F.broadcast(mx)).select(
        epoch_floor_index(
            F.col("last_us") - F.col("first_us"), _DAY_US
        ).alias("t_days"),
        (F.col("__mx") - F.col("last_us") > F.lit(gap_us))
        .cast("int")
        .alias("__churned"),
    )
    hist = marked.groupBy("t_days").agg(
        F.sum("__churned").cast("bigint").alias("n_churned"),
        F.sum(F.lit(1) - F.col("__churned"))
        .cast("bigint")
        .alias("n_censored"),
    )
    out = hazard_from_histogram(hist)
    out._cached_inputs = list(out._cached_inputs) + [per_user]
    return out


def hazard_from_histogram(hist: DataFrame) -> DataFrame:
    """The post-histogram half of :func:`survival_hazard` — n_risk
    and hazard from the (t_days, n_churned, n_censored) duration
    histogram, a MONOID under union + groupBy-sum. Split out (the
    fano_from_histogram convention) so an incremental maintainer can
    report through the SAME arithmetic the batch operator runs."""
    h = hist.select(
        F.col("t_days").cast("bigint").alias("t_days"),
        F.col("n_churned").cast("bigint").alias("n_churned"),
        F.col("n_censored").cast("bigint").alias("n_censored"),
    ).persist()
    hi = h.select(
        F.col("t_days").alias("__ht"),
        (F.col("n_churned") + F.col("n_censored")).alias("__hn"),
    )
    out = (
        h.join(F.broadcast(hi), F.col("__ht") >= F.col("t_days"))
        .groupBy("t_days", "n_churned", "n_censored")
        .agg(F.sum("__hn").cast("bigint").alias("n_risk"))
        .select(
            "t_days",
            "n_risk",
            "n_churned",
            "n_censored",
            F.round(
                F.col("n_churned").cast("double")
                / F.col("n_risk").cast("double"),
                6,
            ).alias("hazard"),
        )
    )
    out._cached_inputs = [h]
    return out
