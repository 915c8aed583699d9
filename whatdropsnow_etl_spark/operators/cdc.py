"""Change-data-capture apply and SCD Type-2 history build.

Reference parity: extends db.py:51-67 ``upsert`` (insert-or-update,
latest wins) to the full changelog contract a warehouse sync needs:
deletes (R2 has no tombstones — a switching user gets them here) and
*history preservation* (the reference overwrites; SCD2 keeps every
state with validity intervals).

Spark-first: both operators are single-window formulations — no
MERGE loop, no driver-side diffing.

- ``cdc_apply``: union base snapshot + changelog, one
  ``row_number()`` window picks the latest record per key, tombstones
  drop out with a filter. One shuffle on the key columns — the same
  shuffle any MERGE implementation needs — and AQE handles skewed
  keys. At 100 TB the base side arrives hash-partitioned by key from
  the upsert sink (sinks/upsert_parquet.py), so the union's window
  re-shuffles only the (much smaller) changelog co-located with it.

- ``scd2_history``: change detection via ``lag()`` (drop rows whose
  tracked attributes did not change), then validity intervals via
  ``lead()`` over the surviving rows. Both windows share one
  partition+order spec, so Catalyst plans a single Exchange+Sort and
  evaluates the second WindowExec on the already-sorted survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .upsert import latest_wins


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an insert/update/delete changelog to a base snapshot.

    ``changes`` carries ``op_col`` ('I'/'U'/``delete_op``); ``base``
    rows are treated as pre-existing inserts. ``order_by`` must
    totally order records per key (newest first — include a unique
    tiebreaker); the latest record wins and a winning tombstone
    removes the key from the result. Columns of ``base`` must be a
    subset of ``changes`` minus ``op_col``.
    """
    tagged_base = base.withColumn(op_col, F.lit("I"))
    log = tagged_base.unionByName(changes)
    latest = latest_wins(log, keys, order_by)
    return latest.where(F.col(op_col) != delete_op).drop(op_col)


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    order_by: Sequence[Column | str],
    valid_from_col: str = "valid_from",
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history table.

    Input is a changelog ordered by ``order_by`` (oldest first) per
    key. Output keeps one row per *state change* of the ``tracked``
    attributes, with ``valid_from`` (the change's order value),
    ``valid_to`` (next change's order value, NULL while current) and
    ``is_current`` (1/0 as BIGINT for cross-engine portability).

    The change-detection lag and the interval lead share the same
    window spec; rows where no tracked attribute changed are dropped
    *between* the two, so intervals span collapsed runs.
    ``order_by[0]`` must be the column named by ``valid_from_col``
    (the state's effective time); remaining entries are tiebreakers.
    """
    w = Window.partitionBy(*list(keys)).orderBy(*list(order_by))
    changed = F.lit(False)
    for c in tracked:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | prev.isNull() | (prev != F.col(c))
    surv = changes.withColumn("__chg", changed).where(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(*list(keys)).orderBy(*list(order_by))
    valid_to = F.lead(F.col(valid_from_col)).over(w2)
    return surv.withColumn("valid_to", valid_to).withColumn(
        "is_current", F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("bigint")
    )
