"""Latest-wins upsert as a relational operator.

Reference parity: db.py:51-67 ``upsert`` (Postgres
``on_conflict_do_update`` — the newest record for a primary key
wins). Spark-first: instead of row-at-a-time conflict handling, the
whole "table state after all upserts" is one window dedup:

    row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1

Scale: the window shuffles once on the key columns — the same
shuffle a MERGE would need — with no driver involvement; AQE handles
skewed keys. For the persistent variant see sinks/upsert_parquet.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``.

    ``order_by`` must be a *total* order within each key group
    (include a unique tiebreaker) or the result is nondeterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
