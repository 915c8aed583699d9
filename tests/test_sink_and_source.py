"""Upsert parquet sink and paginated JSON-API source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.sinks import UpsertParquetSink
from whatdropsnow_etl_spark.sources.json_api import (
    PageFetchError,
    fetch_pages,
    normalize_pages,
)


def test_upsert_sink_latest_wins(spark, tables, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "t"), ["user_id", "event_type"], "ts")
    ev = tables["events"].select("user_id", "event_type", "ts", "value")
    sink.upsert(ev.limit(400))
    sink.upsert(ev)  # second batch supersedes overlapping keys
    state = sink.read(spark)
    n_keys = ev.select("user_id", "event_type").distinct().count()
    assert state.count() == n_keys
    # newest ts wins per key
    mx = ev.groupBy("user_id", "event_type").agg(F.max("ts").alias("mx"))
    assert state.join(mx, ["user_id", "event_type"]).where(
        F.col("ts") != F.col("mx")
    ).count() == 0
    # compaction preserves state exactly
    before = sorted([tuple(r) for r in state.collect()], key=repr)
    sink.compact(spark)
    after = sorted([tuple(r) for r in sink.read(spark).collect()], key=repr)
    assert before == after


def _api(records, fail_pages=(), total=None):
    """Fake paginated API; fails transiently once per page in fail_pages."""
    failed = set()

    def fetch(page, page_size):
        if page in fail_pages and page not in failed:
            failed.add(page)
            raise ConnectionError("transient")
        lo = (page - 1) * page_size
        return {
            "data": records[lo : lo + page_size],
            "meta": {
                "page": {
                    "total_count": total if total is not None else len(records),
                    "current_page": page,
                }
            },
        }

    return fetch


def test_fetch_pages_and_normalize(spark, tmp_path):
    records = [
        {"id": str(i), "attributes": {"product_id": i % 7, "price_usd": f"{i}.50"}}
        for i in range(25)
    ]
    out = str(tmp_path / "pages")
    landed = fetch_pages(
        _api(records, fail_pages=(2,)), out, page_size=10, sleep=lambda s: None
    )
    assert landed == 25
    df = normalize_pages(
        spark,
        out,
        {
            "id": ("id", "string"),
            "product_id": ("attributes.product_id", "int"),
            "price_usd": ("attributes.price_usd", "decimal(12,2)"),
        },
    )
    assert df.count() == 25
    assert dict(df.dtypes) == {
        "id": "string",
        "product_id": "int",
        "price_usd": "decimal(12,2)",
    }
    assert df.agg(F.sum(F.col("product_id"))).collect()[0][0] == sum(
        i % 7 for i in range(25)
    )


def test_fetch_pages_gives_up_after_retries(tmp_path):
    def always_fail(page, page_size):
        raise ConnectionError("down")

    with pytest.raises(PageFetchError):
        fetch_pages(always_fail, str(tmp_path / "p"), sleep=lambda s: None)


def test_fetch_pages_ignores_404(tmp_path):
    def gone(page, page_size):
        return None

    assert fetch_pages(gone, str(tmp_path / "p"), sleep=lambda s: None) == 0


def test_upsert_sink_rejects_bad_batch(spark, tables, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "t2"), ["user_id"], "ts")
    with pytest.raises(ValueError, match="missing columns"):
        sink.upsert(tables["events"].select("event_id"))


def test_upsert_valid_skips_orphans(spark, tables, tmp_path):
    sink = UpsertParquetSink(str(tmp_path / "t3"), ["l_orderkey", "l_linenumber"], "l_shipdate")
    li = tables["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate"
    )
    present = tables["part"].where(F.col("p_partkey") % 7 != 0)
    batch, orphans = sink.upsert_valid(li, present, "l_partkey", "p_partkey")
    n_orphan = orphans.count()
    n_valid = sink.read(spark).count()
    assert n_orphan > 0
    # state holds one row per surviving key (latest wins)
    valid_rows = li.join(
        present, li.l_partkey == present.p_partkey, "left_semi"
    )
    assert valid_rows.count() + n_orphan == li.count()
    assert n_valid == valid_rows.select("l_orderkey", "l_linenumber").distinct().count()
    # orphans really reference missing parents
    assert orphans.join(present, orphans.l_partkey == present.p_partkey).count() == 0


class _FakeApi:
    """In-process HTTP server: paginated /items (3 pages), flaky
    /flaky (fails twice then succeeds), per-id /things/{id} with a
    missing id, auth-header capture on every request."""

    def __init__(self):
        import json as _json
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qs, urlparse

        fake = self
        self.auth_headers = []
        self.flaky_hits = 0
        items = [{"id": i, "attributes": {"name": f"item-{i}"}} for i in range(5)]

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, payload):
                body = _json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                fake.auth_headers.append(self.headers.get("Authorization"))
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path == "/api/items":
                    page = int(q["page"][0])
                    size = int(q["page_size"][0])
                    chunk = items[(page - 1) * size : page * size]
                    if not chunk:
                        return self._json(404, {"error": "no such page"})
                    return self._json(
                        200,
                        {
                            "data": chunk,
                            "meta": {
                                "page": {
                                    "total_count": len(items),
                                    "current_page": page,
                                }
                            },
                        },
                    )
                if u.path == "/api/flaky":
                    fake.flaky_hits += 1
                    if fake.flaky_hits < 3:
                        return self._json(503, {"error": "try later"})
                    return self._json(200, {"data": [{"id": 99}]})
                if u.path.startswith("/api/things/"):
                    tid = int(u.path.rsplit("/", 1)[1])
                    if tid >= 3:
                        return self._json(404, {"error": "gone"})
                    return self._json(
                        200, {"data": {"id": tid, "attributes": {"name": f"t{tid}"}}}
                    )
                return self._json(404, {"error": "bad path"})

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


def test_http_client_end_to_end(spark, tmp_path):
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    with _FakeApi() as api:
        client = HttpJsonClient(
            api.url,
            headers={"Authorization": "Bearer sesame"},
            delay=0.001,
            timeout=5,
        )
        # pagination: 3 pages of 2 land 5 records, stops at total_count
        n = client.fetch_resource_pages("/items", str(tmp_path / "pages"), page_size=2)
        assert n == 5
        df = normalize_pages(
            spark,
            str(tmp_path / "pages"),
            {"id": ("id", "bigint"), "name": ("attributes.name", "string")},
        )
        assert {(r["id"], r["name"]) for r in df.collect()} == {
            (i, f"item-{i}") for i in range(5)
        }
        # retry/backoff: two 503s then success, inside one get_json call
        assert client.get_json("/flaky")["data"] == [{"id": 99}]
        assert api.flaky_hits == 3
        # per-id fan-out with ignore-404: ids 3,4 vanish silently
        n = client.fetch_by_ids("/things/{}", range(5), str(tmp_path / "things"))
        assert n == 3
        got = spark.read.json(str(tmp_path / "things" / "*.jsonl"))
        assert got.count() == 3
        # the auth header reached every request
        assert set(api.auth_headers) == {"Bearer sesame"}


def test_http_client_raises_after_retries(tmp_path):
    from whatdropsnow_etl_spark.sources.http_client import HttpJsonClient

    with _FakeApi() as api:
        client = HttpJsonClient(api.url, tries=3, delay=0.001, timeout=5)
        with pytest.raises(Exception, match="status 404"):
            client.get_json("/nope")  # ignore_404 not set -> raises


def test_upsert_sink_resolution_modes(spark, tmp_path):
    """Arrival-order (default) vs version-authoritative resolution:
    a late batch carrying an OLDER version clobbers state in the
    first mode (reference ON CONFLICT semantics) and loses in the
    second (streaming out-of-order semantics)."""
    from whatdropsnow_etl_spark.sinks import UpsertParquetSink

    rows_new = spark.createDataFrame([(1, 100, "x")], "k long, v long, s string")
    rows_old = spark.createDataFrame([(1, 50, "y")], "k long, v long, s string")

    arrival = UpsertParquetSink(str(tmp_path / "a"), ["k"], "v", n_buckets=2)
    arrival.upsert(rows_new)
    arrival.upsert(rows_old)  # later batch, older version
    assert arrival.read(spark).collect()[0]["s"] == "y"

    versioned = UpsertParquetSink(
        str(tmp_path / "b"), ["k"], "v", n_buckets=2, resolve_by_version=True
    )
    versioned.upsert(rows_new)
    versioned.upsert(rows_old)
    assert versioned.read(spark).collect()[0]["s"] == "x"


def test_jdbc_option_building():
    from whatdropsnow_etl_spark.sources.jdbc import (
        JdbcTableSpec,
        jdbc_read_options,
        upsert_sql,
    )

    spec = JdbcTableSpec(
        url="jdbc:postgresql://localhost:5432/wdn",
        table="offers",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
        user="etl",
    )
    opts = jdbc_read_options(spec)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"
    assert "password" not in opts

    # partitioning requires bounds
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower_bound"):
        jdbc_read_options(
            JdbcTableSpec(url="jdbc:x", table="t", partition_column="id")
        )

    sql = upsert_sql("offers", "offers_stage", ["id"], ["price", "updated_at"])
    assert sql == (
        'INSERT INTO offers ("id", "price", "updated_at") '
        'SELECT "id", "price", "updated_at" FROM offers_stage '
        'ON CONFLICT ("id") DO UPDATE SET '
        '"price" = excluded."price", "updated_at" = excluded."updated_at"'
    )


def test_upsert_sql_roundtrip_real_postgres(tmp_path):
    """The emitted ON CONFLICT statement executes against a REAL
    PostgreSQL — the reference's actual dialect and semantics
    (db.py:51-67, on_conflict_do_update latest-wins), which the
    embedded-Derby round-trip can't prove. A throwaway cluster is
    initdb'd per-run (trust auth, unix socket only, no TCP) as the
    postgres user; skipped where the runtime lacks the binaries.
    The quoted reserved-word column ('user') exercises the
    identifier-quoting path for real."""
    import os
    import pwd
    import shutil
    import subprocess

    bindir = "/usr/lib/postgresql/15/bin"
    if not os.path.exists(f"{bindir}/initdb") or not shutil.which("su"):
        pytest.skip("no PostgreSQL 15 runtime")
    try:
        pwd.getpwnam("postgres")
    except KeyError:
        pytest.skip("no postgres user")

    from whatdropsnow_etl_spark.sources.jdbc import upsert_sql

    # NOT under tmp_path: pytest's /tmp/pytest-of-root ancestors are
    # 0700, untraversable by the postgres user
    import pathlib
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="pg_upsert_"))
    data = base / "data"
    sock = base / "sock"
    sock.mkdir()
    subprocess.run(
        ["chown", "-R", "postgres:postgres", str(base)], check=True
    )

    def as_pg(cmd: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["su", "postgres", "-c", f"cd / && {cmd}"],
            capture_output=True,
            text=True,
        )

    r = as_pg(f"{bindir}/initdb -D {data} -A trust")
    if r.returncode:
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    started = as_pg(
        f'{bindir}/pg_ctl -D {data} -w -l {base}/log start '
        f"-o \"-k {sock} -p 54329 -c listen_addresses=''\""
    )
    if started.returncode:
        pytest.skip(f"pg_ctl start failed: {started.stderr[-200:]}")
    try:
        psql = f"{bindir}/psql -h {sock} -p 54329 -d postgres -v ON_ERROR_STOP=1"
        setup = base / "setup.sql"
        setup.write_text(
            'CREATE TABLE offers (id bigint PRIMARY KEY, "user" text,'
            " price numeric, updated_at timestamp);\n"
            "INSERT INTO offers VALUES (1, 'a', 10.0, '2026-01-01');\n"
            'CREATE TABLE offers_stage (id bigint, "user" text,'
            " price numeric, updated_at timestamp);\n"
            "INSERT INTO offers_stage VALUES"
            " (1, 'b', 20.0, '2026-02-01'), (2, 'c', 30.0, '2026-02-02');\n"
            + upsert_sql(
                "offers", "offers_stage", ["id"], ["user", "price", "updated_at"]
            )
            + ";\n"
        )
        subprocess.run(
            ["chown", "postgres:postgres", str(setup)], check=True
        )
        ran = as_pg(f"{psql} -q -f {setup}")
        assert ran.returncode == 0, ran.stderr
        out = as_pg(
            f"{psql} -At -c "
            "'SELECT id, \"user\", price FROM offers ORDER BY id'"
        )
        assert ran.returncode == 0, out.stderr
        # latest-wins: the conflicting row took the stage values, the
        # new row inserted — exactly db.py:51-67's semantics
        assert out.stdout.strip().splitlines() == ["1|b|20.0", "2|c|30.0"]
        # idempotent re-run (the reference re-runs the same upsert on
        # restart): same statement again, same final state
        rerun = as_pg(
            f"{psql} -q -c "
            + '"'
            + upsert_sql(
                "offers", "offers_stage", ["id"], ["user", "price", "updated_at"]
            ).replace('"', '\\"')
            + '"'
        )
        assert rerun.returncode == 0, rerun.stderr
        out2 = as_pg(
            f"{psql} -At -c "
            "'SELECT id, \"user\", price FROM offers ORDER BY id'"
        )
        assert out2.stdout == out.stdout
    finally:
        as_pg(f"{bindir}/pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def test_register_views_sql_join(spark):
    from whatdropsnow_etl_spark.sources.catalog import register_views
    from tests.conftest import SF_SMALL

    names = register_views(spark, SF_SMALL)
    assert "lineitem" in names and "orders" in names
    got = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).collect()
    assert len(got) == 5 and all(r["n"] > 0 for r in got)
    # the view carries the canonicalized timestamp type
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"


def test_file_format_roundtrips(spark, tables, tmp_path):
    from whatdropsnow_etl_spark.sources.files import (
        read_csv,
        read_jsonl,
        read_orc,
        write_orc,
    )

    docs = tables["documents"].select("doc_id", "lang", "n_chars")
    schema = "doc_id bigint, lang string, n_chars bigint"

    csv_p = str(tmp_path / "docs_csv")
    docs.write.option("header", "true").csv(csv_p)
    assert sorted(map(tuple, read_csv(spark, csv_p, schema).collect())) == sorted(
        map(tuple, docs.collect())
    )

    jl_p = str(tmp_path / "docs_jsonl")
    docs.write.json(jl_p)
    assert read_jsonl(spark, jl_p, schema).count() == docs.count()

    orc_p = str(tmp_path / "docs_orc")
    write_orc(docs, orc_p)
    back = read_orc(spark, orc_p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    # ORC pushes filters like parquet
    plan = back.where(F.col("n_chars") > 200)._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,200)]" in plan


def test_xml_roundtrip(spark, tables, tmp_path):
    from whatdropsnow_etl_spark.sources.files import read_xml

    docs = tables["documents"].select("doc_id", "lang", "n_chars")
    xml_p = str(tmp_path / "docs_xml")
    docs.write.format("xml").option("rootTag", "docs").option(
        "rowTag", "doc"
    ).save(xml_p)
    back = read_xml(
        spark, xml_p, row_tag="doc",
        schema="doc_id bigint, lang string, n_chars bigint",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_read_binary_files(spark, tmp_path):
    """binaryFile landing for multimodal assets: content round-trips
    byte-exact, pathGlobFilter prunes at listing, and the max_bytes
    guard filters on the length metadata column."""
    from whatdropsnow_etl_spark.sources.files import read_binary_files

    d = tmp_path / "assets"
    d.mkdir()
    payloads = {
        "a.png": b"\x89PNG\r\n" + bytes(range(64)),
        "b.png": b"\x89PNG\r\n" + bytes(200 * [7]),
        "c.wav": b"RIFF" + bytes(32),
    }
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)
    out = read_binary_files(spark, str(d), glob="*.png")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert set(rows) == {"a.png", "b.png"}  # glob pruned the wav
    for name, r in rows.items():
        assert bytes(r["content"]) == payloads[name]
        assert r["length"] == len(payloads[name])
    # length guard: only the small png survives
    small = read_binary_files(spark, str(d), glob="*.png", max_bytes=100)
    assert [
        r["path"].rsplit("/", 1)[-1] for r in small.collect()
    ] == ["a.png"]
    # the multimodal handoff shape: binary + metadata columns
    assert dict(out.dtypes)["content"] == "binary"


def test_jdbc_roundtrip_embedded_derby(spark, tables, tmp_path):
    """End-to-end JDBC against a real database: the runtime's embedded
    Derby. Write a table, read it back as a range-partitioned
    distributed scan, verify both values and the partition count."""
    from whatdropsnow_etl_spark.sources.jdbc import JdbcTableSpec, read_jdbc

    docs = tables["documents"].select("doc_id", "lang", "n_chars")
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    docs.write.format("jdbc").option("url", url).option(
        "dbtable", "docs"
    ).mode("overwrite").save()

    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    spec = JdbcTableSpec(
        url=url,
        table="docs",
        partition_column="doc_id",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    back = read_jdbc(spark, spec)
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_webdataset_shard_sink_roundtrip_and_determinism(spark, tmp_path):
    """r9: the WebDataset tar shard sink round-trips payload BYTES
    exactly, assigns shards deterministically (pmod(xxhash64)),
    pins member grouping (payload + json meta per sample key), and —
    because tar metadata is zeroed and members are id-sorted —
    rewriting the same corpus produces BIT-IDENTICAL shards
    (sha256-pinned), the reproducibility property a cached-dataset
    fingerprint needs. An external reader (stdlib tarfile) opens the
    shards — they are real tars, not a private format."""
    import json
    import tarfile

    from whatdropsnow_etl_spark.operators import attach_media_payload
    from whatdropsnow_etl_spark.sinks import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    media = attach_media_payload(docs).withColumn(
        "kind", F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio")
    )
    out1 = str(tmp_path / "wds1")
    m1 = write_webdataset_shards(
        media, out1, n_shards=4, meta_cols=("kind",)
    ).collect()
    assert sorted(r["shard"] for r in m1) == [0, 1, 2, 3]
    assert sum(r["n_samples"] for r in m1) == 40
    # external tarfile opens a shard; members group by sample key
    with tarfile.open(m1[0]["path"]) as tf:
        names = tf.getnames()
        stems = {n.rsplit(".", 1)[0] for n in names}
        for s in stems:
            assert f"{s}.bin" in names and f"{s}.json" in names
        meta = json.loads(
            tf.extractfile(sorted(names)[1]).read().decode()
        )
        assert set(meta) == {"kind"}
    # round trip: payload bytes exact, meta carried
    back = {
        r["doc_id"]: (bytes(r["payload"]), r["meta"])
        for r in read_webdataset_shards(spark, out1).collect()
    }
    want = {
        r["doc_id"]: bytes(r["payload"])
        for r in attach_media_payload(docs).collect()
    }
    assert {k: v[0] for k, v in back.items()} == want
    assert all(
        json.loads(v[1])["kind"] == ("image" if k % 2 == 0 else "audio")
        for k, v in back.items()
    )
    # bit-identical rewrite: same data -> same shard bytes
    out2 = str(tmp_path / "wds2")
    m2 = write_webdataset_shards(
        media.repartition(7), out2, n_shards=4, meta_cols=("kind",)
    ).collect()
    assert {r["shard"]: r["sha256"] for r in m1} == {
        r["shard"]: r["sha256"] for r in m2
    }
    # manifest.json persisted alongside the shards
    disk = json.load(open(out1 + "/manifest.json"))
    assert [d["sha256"] for d in disk] == [
        r["sha256"] for r in sorted(m1, key=lambda r: r["shard"])
    ]
