"""The reference's end-to-end ETL loop, composed from this repo's
own pieces — the executable twin of ``etl.py:22-57``.

The reference's only entry point is one cascading loop per brand
name: search the brand (persisting every search hit), look the
brand id up case-insensitively, page that brand's products, fan out
per-product offers, fan out per-retailer details — each level
guarded by "skip anything updated within the last day" and
persisted with insert-or-update semantics, offers tolerating
missing-product FK violations. This module chains the repo's
already-tested components into exactly that loop:

- fetch: ``sources/http_client.py`` (pagination R6, per-id fan-out
  R8, retry/backoff/404 R10 — wdn_api.py:63-138)
- normalize: ``sources/json_api.normalize_pages`` (R5 parse_data,
  db.py:79-158 — the typed casts as Catalyst expressions)
- recency: the R3 ``filter_out_recently_added`` contract
  (etl.py:14-20) — candidate keys minus keys updated within the
  interval, case-insensitive for string keys
- persist: ``sinks/upsert_parquet.UpsertParquetSink`` (R2 upsert,
  db.py:51-67) with ``upsert_valid`` for the offers table (R4
  FK-violation tolerance, db.py:63-67)
- cascade: brand -> products(brand_id) -> offers(product_id) ->
  retailers(retailer_id) (R9, etl.py:34-57)

Determinism: the reference stamps ``datetime.now()`` per parse and
filters recency against wall-clock ``utcnow`` — replays are
unrepeatable. Here the caller passes ``now`` once; every row of the
run carries it as ``updated_at`` and the recency cutoff derives
from it, so the same (API state, table state, now) triple always
produces the same tables.

One deliberate divergence, cited: the reference checks
``if retailer_ids_filtered:`` but then fetches the UNFILTERED id
list (etl.py:55 passes ``retailer_ids``, not
``retailer_ids_filtered``) — almost certainly a slip, since every
other level fetches the filtered list. This implementation fetches
the filtered list (the R3 contract); final table state is identical
either way under latest-wins upsert, only the request count
differs.

Scale notes: id lists crossing the driver are ingestion WORK LISTS,
bounded by the API's catalog size (the ``distinct_ids`` contract) —
never data-plane relations. Landed pages read back as one
distributed scan; every join in the loop is against a broadcast
key projection; table state is the bucketed merge-on-read sink.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert_parquet import UpsertParquetSink
from ..sources.json_api import normalize_pages

# output name -> (JSON path, spark type); mirrors db.py parse_data
# (Brand db.py:115-133, Product db.py:136-158, Offer db.py:87-112,
# Retailer db.py:71-84). updated_at is stamped by the run, not
# parsed.
BRAND_COLUMNS = {
    "id": ("id", "int"),
    "name": ("attributes.name", "string"),
    "description": ("attributes.description", "string"),
    "website": ("attributes.website", "string"),
}
PRODUCT_COLUMNS = {
    "id": ("id", "int"),
    "name": ("attributes.name", "string"),
    "description": ("attributes.description", "string"),
    "release_at": ("attributes.release_at", "timestamp"),
    "brand_names": ("attributes.brand_names", "string"),
}
OFFER_COLUMNS = {
    "id": ("id", "string"),
    "product_id": ("attributes.product_id", "int"),
    "retailer_id": ("attributes.retailer_id", "int"),
    "original_currency": ("attributes.original_currency", "string"),
    "price_usd": ("attributes.price_usd", "decimal(12,2)"),
    "price_gbp": ("attributes.price_gbp", "decimal(12,2)"),
    "price_eur": ("attributes.price_eur", "decimal(12,2)"),
}
RETAILER_COLUMNS = {
    "id": ("id", "int"),
    "name": ("attributes.name", "string"),
    "website": ("attributes.website", "string"),
}

TABLES = ("brands", "products", "offers", "retailers")


class ReferenceEtl:
    """Stateful handle on the four upsert tables + landing zone."""

    def __init__(self, spark: SparkSession, base_dir: str, n_buckets: int = 4):
        self.spark = spark
        self.base_dir = base_dir
        self.sinks = {
            name: UpsertParquetSink(
                os.path.join(base_dir, "tables", name),
                keys=["id"],
                version_col="updated_at",
                n_buckets=n_buckets,
            )
            for name in TABLES
        }

    # -- table state ------------------------------------------------------

    def table(self, name: str) -> DataFrame | None:
        """Current latest-wins state, or None before first upsert."""
        sink = self.sinks[name]
        if not os.path.exists(os.path.join(sink.path, "data")):
            return None
        return sink.read(self.spark)

    def tables(self) -> dict[str, DataFrame | None]:
        return {name: self.table(name) for name in TABLES}

    # -- R3: recency filtering ---------------------------------------------

    def _filter_out_recently_added(
        self,
        table: str,
        candidates: list,
        match_col: str,
        cutoff,  # datetime
    ) -> list:
        """etl.py:14-20 twin: candidate keys minus keys whose table
        row was updated after ``cutoff``; case-insensitive when the
        keys are strings. Candidates are an ingestion work list
        (bounded by the catalog), so the set difference is
        driver-side by the same contract as ``distinct_ids``; the
        recent-key scan is one pushed-down filter + distinct over
        the bucketed table."""
        state = self.table(table)
        if state is None or not candidates:
            return list(candidates)
        key = F.col(match_col)
        ci = isinstance(candidates[0], str)
        if ci:
            key = F.lower(key)
            cand = {c.lower() for c in candidates}
        else:
            cand = set(candidates)
        recent = {
            r[0]
            for r in state.where(F.col("updated_at") > F.lit(cutoff))
            .select(key)
            .distinct()
            .collect()
        }
        kept = cand - recent
        if ci:
            return [c for c in candidates if c.lower() in kept]
        return [c for c in candidates if c in kept]

    # -- landing + normalize -------------------------------------------------

    def _land_dir(self, run_tag: str, *parts: str) -> str:
        """Fresh landing directory for one fetch: cleared if it
        already exists — a re-run with the same ``now`` (same
        run_tag) would otherwise normalize STALE page/id files left
        by a previous, larger fetch alongside the new ones."""
        import shutil

        safe = [re.sub(r"[^A-Za-z0-9_.-]", "_", p) for p in (run_tag, *parts)]
        path = os.path.join(self.base_dir, "landing", *safe)
        shutil.rmtree(path, ignore_errors=True)
        return path

    def _normalize(self, pages_dir: str, columns, now) -> DataFrame:
        df = normalize_pages(self.spark, pages_dir, columns)
        return df.withColumn(
            "updated_at", F.lit(now).cast("timestamp")
        )


def run_reference_etl(
    spark: SparkSession,
    client,
    brands: list[str],
    base_dir: str,
    now,
    recent_interval_hours: int = 24,
    page_size: int = 20,
) -> dict[str, DataFrame]:
    """Run the reference's full ETL loop (etl.py:22-57) against a
    live (or stub) JSON API and return the four table states.

    ``client`` is an :class:`~..sources.http_client.HttpJsonClient`
    (or anything with the same ``fetch_resource_pages`` /
    ``fetch_by_ids`` surface). ``now`` is a ``datetime`` — the run's
    deterministic clock (stamped as every row's ``updated_at``;
    recency cutoff = now − interval). Re-running with a later
    ``now`` re-fetches only what aged out, exactly like the
    reference's daily incremental restart.
    """
    import datetime

    etl = ReferenceEtl(spark, base_dir)
    cutoff = now - datetime.timedelta(hours=recent_interval_hours)
    run_tag = now.strftime("%Y%m%dT%H%M%S")

    for brand in brands:
        # -- brand search (etl.py:36-38 + wdn_api.py:20-30) ------------
        brand_todo = etl._filter_out_recently_added(
            "brands", [brand], "name", cutoff
        )
        if brand_todo:
            pages = etl._land_dir(run_tag, brand, "brand_search")
            n = client.fetch_resource_pages(
                f"/searches/brand_search?q={brand_todo[0]}",
                pages,
                page_size=page_size,
            )
            if n:
                # the reference's callback persists EVERY search hit
                # (etl.py:38 persist_data per page), while the exact
                # case-insensitive match is only used for navigation
                hits = etl._normalize(pages, BRAND_COLUMNS, now)
                etl.sinks["brands"].upsert(hits)
        brands_state = etl.table("brands")
        match = (
            brands_state.where(
                F.lower(F.col("name")) == brand.lower()
            ).select("id")
            if brands_state is not None
            else None
        )
        row = match.first() if match is not None else None
        if row is None:
            raise ValueError(f"brand {brand} not found!")  # wdn_api.py:28
        brand_id = row["id"]

        # -- products of the brand (etl.py:40-43) ----------------------
        prod_todo = etl._filter_out_recently_added(
            "products", [brand_id], "brand_id", cutoff
        )
        if prod_todo:
            pages = etl._land_dir(run_tag, brand, "products")
            n = client.fetch_resource_pages(
                f"/brands/{brand_id}/products", pages, page_size=page_size
            )
            if n:
                prods = etl._normalize(
                    pages, PRODUCT_COLUMNS, now
                ).withColumn(
                    # wdn_api.py:31-36 products_add_brand_id: the API
                    # payload has no brand_id; the fetch context does
                    "brand_id", F.lit(int(brand_id)).cast("int")
                )
                etl.sinks["products"].upsert(prods)

        # -- offers per product (etl.py:45-48) --------------------------
        products_state = etl.table("products")
        product_ids = sorted(
            r["id"]
            for r in products_state.where(F.col("brand_id") == brand_id)
            .select("id")
            .distinct()
            .collect()
        )
        offer_todo = etl._filter_out_recently_added(
            "offers", product_ids, "product_id", cutoff
        )
        if offer_todo:
            pages = etl._land_dir(run_tag, brand, "offers")
            n = client.fetch_by_ids(
                "/products/{}/offers", offer_todo, pages
            )
            if n:
                offers = etl._normalize(pages, OFFER_COLUMNS, now)
                # wdn_api.py:53-60: keep only offers whose product_id
                # is in the requested id set (cross-listed payloads) —
                # broadcast semi-join, never a driver-side filter
                wanted = spark.createDataFrame(
                    [(int(i),) for i in offer_todo], "product_id int"
                )
                offers = offers.join(
                    F.broadcast(wanted), "product_id", "left_semi"
                )
                # R4 (db.py:63-67): offers referencing a missing
                # product are SKIPPED, not fatal
                _, orphans = etl.sinks["offers"].upsert_valid(
                    offers, products_state, fk="product_id", pk="id"
                )
                orphans.count()  # materialize for logging parity

        # -- retailers per offer (etl.py:50-55) --------------------------
        offers_state = etl.table("offers")
        retailer_ids = []
        if offers_state is not None and offer_todo:
            wanted = spark.createDataFrame(
                [(int(i),) for i in offer_todo], "product_id int"
            )
            retailer_ids = sorted(
                r["retailer_id"]
                for r in offers_state.join(
                    F.broadcast(wanted), "product_id", "left_semi"
                )
                .select("retailer_id")
                .where(F.col("retailer_id").isNotNull())
                .distinct()
                .collect()
            )
        retailer_todo = etl._filter_out_recently_added(
            "retailers", retailer_ids, "id", cutoff
        )
        if retailer_todo:
            pages = etl._land_dir(run_tag, brand, "retailers")
            n = client.fetch_by_ids("/retailers/{}", retailer_todo, pages)
            if n:
                rets = etl._normalize(pages, RETAILER_COLUMNS, now)
                etl.sinks["retailers"].upsert(rets)

    return {k: v for k, v in etl.tables().items() if v is not None}
