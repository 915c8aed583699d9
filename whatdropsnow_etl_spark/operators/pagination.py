"""Deterministic pagination.

Reference parity: wdn_api.py:108-138 ``paginate_request`` (page /
page_size iteration). As a relational operator: a page is
ORDER BY <total order> OFFSET (page-1)*size LIMIT size.

Scale: Spark executes limit+offset as a partial limit per partition
followed by a single small final stage — it never materializes the
full sort. Page grabs deep into 100 TB are inherently anti-scale;
for full-table paging use key-range predicates instead (cursor
pagination: WHERE key > last_seen ORDER BY key LIMIT n, which this
operator also supports via ``after``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def paginate(
    df: DataFrame,
    order_by: Sequence[Column | str],
    page: int,
    page_size: int,
) -> DataFrame:
    """1-based page under a total order (caller must pass a unique
    ordering, e.g. the primary key)."""
    if page < 1 or page_size < 1:
        raise ValueError("page and page_size are 1-based positives")
    return df.orderBy(*order_by).offset((page - 1) * page_size).limit(page_size)


def paginate_after(
    df: DataFrame,
    key: str,
    after: int | str | None,
    page_size: int,
) -> DataFrame:
    """Cursor pagination: the scale-friendly variant (predicate
    pushdown prunes row groups; no offset scan)."""
    out = df if after is None else df.where(df[key] > after)
    return out.orderBy(key).limit(page_size)
