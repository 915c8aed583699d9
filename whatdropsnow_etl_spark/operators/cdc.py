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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff between two versions of a table: one row per
    key present in either snapshot, classified ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` — the regression gate
    run between pipeline versions ("the refactor was supposed to be
    a no-op: what rows moved?") and the validation companion to
    cdc_apply (applying a changelog then diffing against the
    expected snapshot must yield zero changed/added/removed).

    ONE full-outer shuffle join on the keys — the provable lower
    bound for any row diff — with null-safe comparison on BOTH keys
    and values (`<=>`: NULL == NULL matches / is ``unchanged``,
    NULL vs value is ``changed``; a plain ``=`` on the keys would
    never match a NULL-keyed row against itself and double-report
    it as added+removed). Keys must be unique per side
    (pre-aggregate a changelog with latest_wins first); at 100 TB
    both sides arrive co-partitioned from the key-bucketed upsert
    sink and the join is exchange-free.

    Output: key columns + ``status``. Aggregate shares/counts are a
    ``groupBy("status").count()`` away; the per-row relation is the
    primitive because the follow-up question is always "WHICH rows".
    """
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    o = old.select(
        *[F.col(c).alias(f"__ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"__vo_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"__vn_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"__ko_{c}").eqNullSafe(F.col(f"__kn_{c}"))
        cond = eq if cond is None else cond & eq
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__vo_{c}").eqNullSafe(F.col(f"__vn_{c}"))
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__ko_{c}"), F.col(f"__kn_{c}")).alias(c)
            for c in key_cols
        ],
        status.alias("status"),
    )
