"""End-to-end test of the composed reference pipeline
(plans/reference_etl.py) against a stub WDN-shaped HTTP API:
the full brand -> products -> offers -> retailers cascade
(etl.py:22-57) with pagination (R6), per-id fan-out (R8), recency
skip (R3), FK-violation tolerance (R4), latest-wins upsert (R2),
and case-insensitive brand matching (R7) exercised in ONE loop —
the "where is the pipeline?" answer for a switching user."""

from __future__ import annotations

import datetime
import json
from urllib.parse import parse_qs, urlparse

import pytest

from pyspark.sql import functions as F


class _WdnStub:
    """In-memory WDN API: brands with products, products with offers,
    offers with retailers; one offer references a product the API
    never returns (the FK-orphan case)."""

    def __init__(self):
        self.requests = []
        # two Nike-ish search hits: exact ci-match is id 1, a noise
        # hit ("Nike Kids") also lands in the table per the
        # reference's persist-every-search-hit callback
        self.brands = [
            {"id": "1", "attributes": {"name": "NIKE", "description": "d1", "website": "w1"}},
            {"id": "7", "attributes": {"name": "Nike Kids", "description": "d7", "website": "w7"}},
        ]
        # 5 products -> forces pagination at page_size=2
        self.products = [
            {"id": str(10 + i), "attributes": {
                "name": f"shoe-{i}", "description": f"pd{i}",
                "release_at": "2026-01-01T00:00:00", "brand_names": "NIKE",
            }}
            for i in range(5)
        ]
        # offers: product 10 has two, product 11 one, product 12 one
        # ORPHAN (product_id 999 never in the products table), product
        # 13 one cross-listed (product_id 14 not requested -> filtered
        # by the wanted semi-join only when 14 wasn't fetched; here 14
        # IS a brand product so it survives as a normal offer)
        self.offers = {
            "10": [
                self._offer("o1", 10, 100, "9.00"),
                self._offer("o2", 10, 101, "11.00"),
            ],
            "11": [self._offer("o3", 11, 100, "20.00")],
            "12": [self._offer("o4", 999, 102, "30.00")],  # FK orphan
            "13": [],
            "14": [self._offer("o5", 14, 103, "40.00")],
        }
        self.retailers = {
            100: {"id": "100", "attributes": {"name": "r100", "website": "rw100"}},
            101: {"id": "101", "attributes": {"name": "r101", "website": "rw101"}},
            103: {"id": "103", "attributes": {"name": "r103", "website": "rw103"}},
            # retailer 102 only referenced by the orphan offer
            102: {"id": "102", "attributes": {"name": "r102", "website": "rw102"}},
        }

    @staticmethod
    def _offer(oid, pid, rid, usd):
        return {
            "id": oid,
            "attributes": {
                "product_id": pid,
                "retailer_id": rid,
                "original_currency": "USD",
                "price_usd": usd,
                "price_gbp": usd,
                "price_eur": usd,
            },
        }

    def _paged(self, rows, page, size):
        chunk = rows[(page - 1) * size : page * size]
        return {
            "data": chunk,
            "meta": {"page": {"total_count": len(rows), "current_page": page}},
        }

    def handle(self, path, q):
        self.requests.append(path)
        page = int(q.get("page", ["1"])[0])
        size = int(q.get("page_size", ["20"])[0])
        if path == "/searches/brand_search":
            term = q["q"][0].lower()
            hits = [
                b for b in self.brands
                if term in b["attributes"]["name"].lower()
            ]
            return 200, self._paged(hits, page, size)
        if path.startswith("/brands/") and path.endswith("/products"):
            bid = path.split("/")[2]
            rows = self.products if bid == "1" else []
            return 200, self._paged(rows, page, size)
        if path.startswith("/products/") and path.endswith("/offers"):
            pid = path.split("/")[2]
            rows = self.offers.get(pid)
            if rows is None:
                return 404, {"error": "no product"}
            return 200, {"data": rows}
        if path.startswith("/retailers/"):
            rid = int(path.split("/")[2])
            r = self.retailers.get(rid)
            if r is None:
                return 404, {"error": "no retailer"}
            return 200, {"data": r}
        return 404, {"error": "bad path"}


class _StubServer:
    def __init__(self, stub: _WdnStub):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                code, payload = stub.handle(
                    u.path.removeprefix("/api"), parse_qs(u.query)
                )
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)

    @property
    def url(self):
        host, port = self.server.server_address
        return f"http://{host}:{port}/api"

    def __enter__(self):
        import threading

        threading.Thread(target=self.server.serve_forever, daemon=True).start()
        return self

    def __exit__(self, *a):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def api():
    stub = _WdnStub()
    with _StubServer(stub) as srv:
        yield stub, srv


def test_run_reference_etl_end_to_end(spark, tmp_path, api):
    from whatdropsnow_etl_spark.plans import run_reference_etl
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    stub, srv = api
    client = HttpJsonClient(srv.url, delay=0.001, timeout=5)
    t0 = datetime.datetime(2026, 8, 1, 12, 0, 0)

    tables = run_reference_etl(
        spark, client, ["nike"], str(tmp_path / "etl"), now=t0, page_size=2
    )

    # R7 + persist-all-search-hits: both hits land, ci-exact match
    # navigated the cascade (brand_id 1)
    brands = {r["id"]: r["name"] for r in tables["brands"].collect()}
    assert brands == {1: "NIKE", 7: "Nike Kids"}

    # R6 pagination: 5 products at page_size=2 -> 3 pages, all landed
    # with the fetch-context brand_id (wdn_api products_add_brand_id)
    prods = tables["products"].collect()
    assert {r["id"] for r in prods} == {10, 11, 12, 13, 14}
    assert {r["brand_id"] for r in prods} == {1}
    assert [
        p for p in stub.requests if p == "/brands/1/products"
    ] == ["/brands/1/products"] * 3

    # R8 fan-out + R4 FK tolerance: o4 references product 999 ->
    # skipped, never fatal; everything else lands with typed prices
    offers = {r["id"]: r for r in tables["offers"].collect()}
    assert set(offers) == {"o1", "o2", "o3", "o5"}
    assert str(offers["o1"]["price_usd"]) == "9.00"
    assert offers["o5"]["product_id"] == 14

    # retailers of surviving offers only (102 belongs to the orphan;
    # the reference would fetch it too via its filtered/unfiltered
    # slip — we fetch the R3-filtered list, final join state is what
    # the flagship query consumes either way)
    rets = {r["id"] for r in tables["retailers"].collect()}
    assert rets == {100, 101, 103}

    # R2 upsert types are queryable: the flagship query's join runs
    joined = (
        tables["offers"]
        .join(tables["retailers"].withColumnRenamed("id", "retailer_id"), "retailer_id")
        .join(
            tables["products"].withColumnRenamed("id", "product_id"),
            "product_id",
        )
    )
    assert joined.count() == 4


def test_run_reference_etl_recency_skip_and_upsert(spark, tmp_path, api):
    """R3: a re-run within the interval fetches NOTHING; a re-run
    after the interval re-fetches and latest-wins updates (R2)."""
    from whatdropsnow_etl_spark.plans import run_reference_etl
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    stub, srv = api
    client = HttpJsonClient(srv.url, delay=0.001, timeout=5)
    base = str(tmp_path / "etl")
    t0 = datetime.datetime(2026, 8, 1, 12, 0, 0)

    run_reference_etl(spark, client, ["nike"], base, now=t0, page_size=2)
    n_first = len(stub.requests)

    # re-run 1 hour later: every level inside the 24 h window is
    # skipped. The ONLY refetches are offers of the two offer-LESS
    # products (12: orphan-only, 13: empty) — recency for offers is
    # keyed on offer rows (etl.py:46 match_field='product_id'), and
    # those products have none; the reference re-fetches them every
    # run for exactly the same reason.
    t1 = t0 + datetime.timedelta(hours=1)
    tables = run_reference_etl(
        spark, client, ["nike"], base, now=t1, page_size=2
    )
    assert sorted(stub.requests[n_first:]) == [
        "/products/12/offers",
        "/products/13/offers",
    ]
    # state intact and updated_at NOT bumped (nothing re-persisted)
    assert tables["offers"].count() == 4
    assert (
        tables["offers"].agg(F.max("updated_at")).first()[0] == t0
    )

    # the API changes a price; re-run 2 days later refetches all
    stub.offers["10"][0]["attributes"]["price_usd"] = "99.00"
    t2 = t0 + datetime.timedelta(days=2)
    tables = run_reference_etl(
        spark, client, ["nike"], base, now=t2, page_size=2
    )
    assert len(stub.requests) > n_first
    offers = {r["id"]: r for r in tables["offers"].collect()}
    assert str(offers["o1"]["price_usd"]) == "99.00"  # latest wins
    assert set(offers) == {"o1", "o2", "o3", "o5"}  # no dup keys
    assert offers["o2"]["updated_at"] == t2


def test_run_reference_etl_all_orphan_offers(spark, tmp_path, api):
    """Every offer referencing a missing product (R4 extreme case):
    the offers table ends readable-and-empty (not a schema-inference
    crash on a part-file-less dir), the retailer level fetches
    nothing, and the run completes."""
    from whatdropsnow_etl_spark.plans import run_reference_etl
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    stub, srv = api
    for pid in list(stub.offers):
        stub.offers[pid] = [
            dict(o, attributes=dict(o["attributes"], product_id=999))
            for o in stub.offers[pid]
        ]
    client = HttpJsonClient(srv.url, delay=0.001, timeout=5)
    tables = run_reference_etl(
        spark,
        client,
        ["nike"],
        str(tmp_path / "etl3"),
        now=datetime.datetime(2026, 8, 1),
        page_size=2,
    )
    assert tables["offers"].count() == 0
    assert "retailers" not in tables or tables["retailers"].count() == 0
    assert not [p for p in stub.requests if p.startswith("/retailers/")]


def test_upsert_sink_empty_only_batches_readable(spark, tmp_path):
    """A sink whose only batches were empty reads back as an empty
    relation of the recorded schema (regression: schema inference
    over a part-file-less data dir crashed)."""
    from whatdropsnow_etl_spark.sinks import UpsertParquetSink

    sink = UpsertParquetSink(
        str(tmp_path / "mt"), keys=["k"], version_col="v"
    )
    empty = spark.createDataFrame([], "k long, v long, s string")
    sink.upsert(empty)
    out = sink.read(spark)
    assert out.columns == ["k", "v", "s"]
    assert out.count() == 0
    # and a later real batch upserts over it normally
    sink.upsert(spark.createDataFrame([(1, 2, "x")], "k long, v long, s string"))
    assert sink.read(spark).count() == 1


def test_run_reference_etl_same_now_rerun_no_stale_landing(
    spark, tmp_path, api
):
    """Re-running with the SAME now after the API shrank must not
    resurrect stale landed pages: the landing dirs are cleared per
    fetch. (The offer level re-fetches offer-less products 12/13 on
    any rerun — see the recency test — so shrink product 10's offers
    and force a full re-fetch by clearing the offers table state.)"""
    import shutil

    from whatdropsnow_etl_spark.plans import run_reference_etl
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    stub, srv = api
    client = HttpJsonClient(srv.url, delay=0.001, timeout=5)
    base = str(tmp_path / "etl4")
    t0 = datetime.datetime(2026, 8, 1, 12, 0, 0)
    tables = run_reference_etl(spark, client, ["nike"], base, now=t0, page_size=2)
    assert {r["id"] for r in tables["offers"].collect()} == {
        "o1", "o2", "o3", "o5"
    }
    # the API drops o2; wipe table state so the same-now rerun
    # re-fetches everything into the SAME run_tag landing dirs
    stub.offers["10"] = stub.offers["10"][:1]
    shutil.rmtree(base + "/tables")
    tables = run_reference_etl(spark, client, ["nike"], base, now=t0, page_size=2)
    got = {r["id"] for r in tables["offers"].collect()}
    assert got == {"o1", "o3", "o5"}  # o2 gone — no stale id-file rows


def test_run_reference_etl_unknown_brand_raises(spark, tmp_path, api):
    from whatdropsnow_etl_spark.plans import run_reference_etl
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    stub, srv = api
    client = HttpJsonClient(srv.url, delay=0.001, timeout=5)
    with pytest.raises(ValueError, match="not found"):
        run_reference_etl(
            spark,
            client,
            ["reebok"],
            str(tmp_path / "etl2"),
            now=datetime.datetime(2026, 8, 1),
        )
