"""QC metrics piggybacked on a write — ``df.observe`` sink wrapper.

Every other QC path in this repo (profile_events, schema_drift_report,
DriftGatedSink's batch profile) costs a scan of its own. For a batch
WRITE that is wasteful: Spark's ``Observation`` API attaches aggregate
expressions to the plan itself, so the metrics are computed by the
SAME tasks that write the files — at 100 TB that is one corpus pass
instead of two, and the numbers are exactly the rows written (not a
re-read that could race a concurrent writer).

Accumulator caveats handled here: observed metrics are computed per
action, task-retry-safe (unlike bare accumulators, Observation
dedupes re-executed tasks), but they only materialize after an action
— so ``write_observed`` returns them post-write, never before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def qc_metric_exprs(
    null_cols: tuple[str, ...] = (),
    min_max_col: str | None = None,
) -> list:
    """The standard write-QC battery: row count, per-column null
    counts, optional min/max of one ordering column (a freshness
    check for timestamp columns). All are map-side-combining
    aggregates — zero extra shuffle on the write path."""
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    if min_max_col is not None:
        exprs.append(F.min(min_max_col).alias(f"min_{min_max_col}"))
        exprs.append(F.max(min_max_col).alias(f"max_{min_max_col}"))
    return exprs


def write_observed(
    df: DataFrame,
    path: str,
    null_cols: tuple[str, ...] = (),
    min_max_col: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
) -> dict:
    """Write ``df`` and return QC metrics computed BY the write.

    Returns ``{"n_rows": ..., "n_null_<c>": ..., "min_<c>": ...,
    "max_<c>": ...}`` for the rows actually written. A caller that
    wants a gate (abort a pipeline when null rate spikes) checks the
    dict after the write and quarantines/deletes the output — the
    metrics themselves are free.
    """
    obs = Observation()
    observed = df.observe(
        obs, *qc_metric_exprs(null_cols, min_max_col)
    )
    writer = observed.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return dict(obs.get)
