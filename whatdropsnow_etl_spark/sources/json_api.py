"""Paginated JSON-API ingestion, Spark-first.

Reference parity:
- wdn_api.py:108-138 ``paginate_request`` — page/page_size loop
  until total_count: here ``fetch_pages`` materializes each page as
  a JSON-lines file (the durable landing zone a cluster job reads).
- wdn_api.py:63-76 retry w/ exponential backoff + ignore-404:
  ``fetch_pages`` retries per page with a deterministic backoff
  schedule.
- db.py:79-158 ``parse_data`` — nested ``{id, attributes:{...}}``
  → typed flat rows: ``normalize_pages`` does it declaratively with
  a column mapping; the casts are Catalyst expressions, not Python.

Scale: ingestion lands pages as files; Spark then reads the page
directory as one distributed scan (every page is a split — the
reference's multiprocess fan-out, wdn_api.py:94-106, is subsumed by
partition parallelism). Normalization is a narrow projection, no
shuffle.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PageFetchError(Exception):
    pass


class PermanentFetchError(Exception):
    """A non-retryable client error (4xx other than 429): the request
    will never succeed as-is, so retry loops re-raise it immediately
    instead of burning the whole backoff schedule on it."""


def fetch_pages(
    fetch_page: Callable[[int, int], Mapping | None],
    out_dir: str,
    page_size: int = 100,
    max_tries: int = 5,
    base_delay: float = 0.01,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Drive a paginated source to completion, landing one JSON-lines
    file per page. ``fetch_page(page, page_size)`` returns
    ``{"data": [...], "meta": {"page": {"total_count": N,
    "current_page": p}}}``, ``None`` for a 404-style missing page
    (ignored, like the reference's ignore_404), or raises for a
    transient failure (retried with exponential backoff).

    Returns the number of records landed.
    """
    os.makedirs(out_dir, exist_ok=True)
    page, landed = 1, 0
    while True:
        response = None
        for attempt in range(max_tries):
            try:
                response = fetch_page(page, page_size)
                break
            except Exception:  # noqa: BLE001 — transient, retry
                if attempt == max_tries - 1:
                    raise PageFetchError(f"page {page} failed after {max_tries} tries")
                sleep(base_delay * (2**attempt))
        if response is None:  # 404-style: skip, stop pagination
            break
        data = response["data"]
        with open(os.path.join(out_dir, f"page-{page:06d}.jsonl"), "w") as f:
            for record in data:
                f.write(json.dumps(record) + "\n")
        landed += len(data)
        total = response["meta"]["page"]["total_count"]
        current = response["meta"]["page"]["current_page"]
        # terminate on LANDED rows, not current*page_size: a server
        # that clamps pages below the requested size would otherwise
        # pass the requested-size bound with rows still unread —
        # silent data loss (e.g. 200 records, 100-row requests, 50-row
        # server cap: the old bound stopped after 100)
        if landed >= total or not data:
            break
        page = current + 1
    return landed


def normalize_pages(
    spark: SparkSession,
    pages_dir: str,
    columns: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Read a landed page directory and flatten ``{id, attributes}``
    records to typed columns.

    ``columns`` maps output name → (source path, spark type), e.g.
    ``{"id": ("id", "int"), "price_usd": ("attributes.price_usd",
    "decimal(12,2)")}`` — mirroring the reference's per-model
    ``parse_data`` casts (int/str/Decimal/DateTime).
    """
    raw = spark.read.json(os.path.join(pages_dir, "*.jsonl"))
    exprs = [
        F.expr(path).cast(typ).alias(name)
        for name, (path, typ) in columns.items()
    ]
    return raw.select(*exprs)


def distinct_ids(df: DataFrame, id_col: str = "id") -> list:
    """Driver-side id list for cascading fetches (reference
    etl.py:44-48). Only for ingestion control flow — never for data
    processing (the id list is the *work list* of a fetch, bounded
    by the API's catalog size, not data-scale)."""
    return [r[0] for r in df.select(id_col).distinct().collect()]
