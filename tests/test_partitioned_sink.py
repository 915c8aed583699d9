"""Partitioned parquet sink: layout, pruning, round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from whatdropsnow_etl_spark.sinks import (
    read_partitioned_events,
    write_partitioned_events,
)


def test_partitioned_write_prunes_and_roundtrips(spark, tables, tmp_path):
    events = tables["events"]
    path = str(tmp_path / "events_by_date")
    write_partitioned_events(events, path)

    # layout: hive-style event_date=... dirs, one file per date
    dates = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    assert len(dates) > 1
    for d in dates:
        files = [
            f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"small-file explosion in {d}: {files}"

    back = read_partitioned_events(spark, path)
    one_day = dates[0].split("=", 1)[1]
    filtered = back.where(F.col("event_date") == one_day)

    # the date predicate must prune at listing time (PartitionFilters),
    # not as a post-scan Filter over all partitions
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters: [", 1)[1].split("]")[0]

    expect = events.where(F.to_date("ts") == one_day).count()
    assert filtered.count() == expect and expect > 0

    # full round-trip preserves every row
    assert back.count() == events.count()


def test_zorder_layout_tightens_both_dimensions(spark, tables, tmp_path):
    """Z-ordered files give narrow row-group stat ranges on BOTH
    interleaved columns; a ts-sorted layout leaves user_id ranges at
    full width (no skipping possible)."""
    import pyarrow.parquet as pq

    from whatdropsnow_etl_spark.sinks import write_zordered

    events = tables["events"]
    lo0, hi0 = events.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    # scale BOTH dims to fill the 16-bit space — a narrow domain left
    # in its low bits loses the interleave to the wider column
    a = (F.col("user_id") * int(65535 / max(hi0, 1))).cast("int")
    b = F.least(
        (F.col("value") * 100).cast("int"), F.lit(65535)
    )
    zpath = str(tmp_path / "events_z")
    write_zordered(events, zpath, a, b, n_files=4)
    tpath = str(tmp_path / "events_ts")
    events.repartitionByRange(4, "ts").sortWithinPartitions(
        "ts"
    ).write.mode("overwrite").parquet(tpath)

    def avg_range(path, col):
        spans, total = [], None
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
        return sum(spans) / len(spans)

    lo, hi = events.agg(
        F.min("user_id"), F.max("user_id")
    ).collect()[0]
    global_range = hi - lo
    z_user = avg_range(zpath, "user_id")
    ts_user = avg_range(tpath, "user_id")
    assert ts_user > 0.9 * global_range  # ts layout: no user skipping
    assert z_user < 0.6 * ts_user  # z layout: materially tighter

    # round-trip identity
    assert spark.read.parquet(zpath).count() == events.count()


def test_compact_parquet_reduces_files_preserves_rows(spark, tables, tmp_path):
    from whatdropsnow_etl_spark.sinks import compact_parquet

    path = str(tmp_path / "fragmented")
    events = tables["events"]
    events.repartition(50).write.mode("overwrite").parquet(path)
    before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert before == 50
    n = events.count()
    after = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert after == 1
    assert spark.read.parquet(path).count() == n


def test_fragmentation_report_detects_small_files(spark, tables, tmp_path):
    from whatdropsnow_etl_spark.sinks import compact_parquet, fragmentation_report

    path = str(tmp_path / "frag")
    # 8 deliberately tiny files
    tables["orders"].limit(400).repartition(8).write.parquet(path)
    rep = fragmentation_report(spark, path, small_file_bytes=8 << 20)
    rows = rep.collect()
    assert len(rows) == 8
    assert all(r["is_small"] for r in rows)          # all tiny
    assert sum(r["n_rows"] for r in rows) == 400     # per-file counts join up
    assert all(r["bytes"] > 0 for r in rows)
    # ordered by bytes asc
    assert [r["bytes"] for r in rows] == sorted(r["bytes"] for r in rows)
    # the loop: detect -> compact -> re-detect clean
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    rep2 = fragmentation_report(spark, path).collect()
    assert len(rep2) == 1 and rep2[0]["n_rows"] == 400


def test_fragmentation_report_uri_encoded_paths(spark, tables, tmp_path):
    # input_file_name() percent-encodes special characters; the report
    # must still join counts for files under 'a dir' / 'a+b' paths
    # instead of misreporting them as 0-row.
    from whatdropsnow_etl_spark.sinks import fragmentation_report

    path = str(tmp_path / "frag dir+x")
    tables["orders"].limit(100).coalesce(1).write.parquet(path)
    rows = fragmentation_report(spark, path).collect()
    assert len(rows) == 1
    assert rows[0]["n_rows"] == 100


def test_manifest_commit_versions_and_vacuum(spark, tmp_path):
    """Atomic publish: each commit is a full version; uncommitted
    files are invisible; old versions stay readable until vacuumed;
    version-file create refuses to clobber."""
    import os

    import pytest as _pytest

    from whatdropsnow_etl_spark.sinks import (
        commit_write,
        current_version,
        read_version,
        vacuum,
    )

    path = str(tmp_path / "mtable")
    v1 = commit_write(spark.range(10).selectExpr("id", "id * 2 AS x"), path)
    v2 = commit_write(spark.range(5).selectExpr("id", "id * 3 AS x"), path)
    assert (v1, v2) == (1, 2)
    assert current_version(path) == 2
    assert read_version(spark, path).count() == 5        # latest
    assert read_version(spark, path, 1).count() == 10    # time travel
    # an in-flight (never-committed) write is invisible to readers
    spark.range(99).write.parquet(os.path.join(path, "data", "orphan"))
    assert read_version(spark, path).count() == 5
    # losing the commit race raises instead of clobbering
    from whatdropsnow_etl_spark.sinks.manifest import _manifest_path

    with _pytest.raises(FileExistsError):
        fd = os.open(
            _manifest_path(path, 2), os.O_CREAT | os.O_EXCL | os.O_WRONLY
        )
        os.close(fd)
    # vacuum keeps the last version; v1 files and the orphan survive
    # or die per the reference rule (orphan is unreferenced -> dies)
    deleted = vacuum(path, keep_last=1)
    assert deleted and all(d.endswith(".parquet") for d in deleted)
    assert read_version(spark, path).count() == 5
    with _pytest.raises(FileNotFoundError):
        read_version(spark, path, 1)


def test_manifest_read_pushes_filters(spark, tmp_path):
    """Reading by manifest file-list must not lose parquet filter
    pushdown — the scan is a normal FileScan with PushedFilters."""
    from whatdropsnow_etl_spark.sinks import commit_write, read_version

    path = str(tmp_path / "mpush")
    commit_write(spark.range(1000).selectExpr("id", "id % 7 AS k"), path)
    df = read_version(spark, path).where("k = 3").select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan, plan
    assert df.count() == len([i for i in range(1000) if i % 7 == 3])


def test_manifest_schema_evolution_append(spark, tmp_path):
    """Appends may add nullable columns: the evolved version reads
    old rows as NULL in the new column, time travel keeps the old
    schema, and a type-changing append is refused at commit time."""
    import pytest as _pytest

    from whatdropsnow_etl_spark.sinks import commit_write, read_version

    path = str(tmp_path / "evolve")
    commit_write(spark.range(4).selectExpr("id", "id * 2 AS x"), path)
    # append with an extra column
    commit_write(
        spark.range(3).selectExpr("id", "id * 2 AS x", "'b' AS tag"),
        path,
        mode="append",
    )
    latest = read_version(spark, path)
    assert latest.columns == ["id", "x", "tag"]
    rows = latest.collect()
    assert len(rows) == 7
    assert sum(r["tag"] is None for r in rows) == 4       # pre-evolution rows
    assert sum(r["tag"] == "b" for r in rows) == 3
    # time travel: v1 still presents its own (pre-evolution) schema
    assert read_version(spark, path, 1).columns == ["id", "x"]
    # appends that OMIT an existing column read it back as NULL
    commit_write(spark.range(2).selectExpr("id + 100 AS id"), path, mode="append")
    v3 = read_version(spark, path)
    assert v3.columns == ["id", "x", "tag"]
    assert v3.where("id >= 100").collect()[0]["x"] is None
    # type flips are corruption deferred to read time -> refused
    with _pytest.raises(ValueError, match="type"):
        commit_write(
            spark.range(1).selectExpr("CAST(id AS STRING) AS id"),
            path,
            mode="append",
        )


def test_manifest_pre_upgrade_append_reconstructs_schema(spark, tmp_path):
    """Appending onto a manifest written before schemas were
    recorded reconstructs the table schema from file footers: old
    columns survive the append and type flips are still refused."""
    import json as _json

    import pytest as _pytest

    from whatdropsnow_etl_spark.sinks import commit_write, read_version
    from whatdropsnow_etl_spark.sinks.manifest import _manifest_path

    path = str(tmp_path / "legacy")
    commit_write(spark.range(3).selectExpr("id", "id * 2 AS x"), path)
    # simulate a pre-upgrade manifest: drop the recorded schema
    mp = _manifest_path(path, 1)
    with open(mp) as fh:
        m = _json.load(fh)
    del m["schema"]
    with open(mp, "w") as fh:
        _json.dump(m, fh)
    # an append that omits x must not erase it from the table schema
    commit_write(spark.range(2).selectExpr("id + 10 AS id"), path, mode="append")
    latest = read_version(spark, path)
    assert latest.columns == ["id", "x"]
    assert latest.where("id >= 10").collect()[0]["x"] is None
    # and a type flip is still refused
    with _pytest.raises(ValueError, match="type"):
        commit_write(
            spark.range(1).selectExpr("CAST(id AS STRING) AS id"),
            path,
            mode="append",
        )


def test_manifest_added_columns_recorded_nullable(spark, tmp_path):
    """A column added by append is recorded nullable in the manifest
    schema even when the incoming frame declares it non-nullable —
    pre-evolution rows read as NULL in it."""
    import json as _json

    from whatdropsnow_etl_spark.sinks import commit_write
    from whatdropsnow_etl_spark.sinks.manifest import _manifest_path

    path = str(tmp_path / "nullable")
    commit_write(spark.range(2).selectExpr("id"), path)
    # 'tag' is non-nullable in the incoming frame (literal)
    commit_write(
        spark.range(2).selectExpr("id", "'b' AS tag"), path, mode="append"
    )
    with open(_manifest_path(path, 2)) as fh:
        schema = _json.load(fh)["schema"]
    tag = [f for f in schema if f["name"] == "tag"][0]
    assert tag["nullable"] is True


def test_manifest_merge_latest_wins_and_time_travel(spark, tmp_path):
    """MERGE publishes the latest-wins state as one new atomic
    version: updates replace matched keys, insert unmatched ones,
    ties go to the update, and the pre-merge version stays readable."""
    from whatdropsnow_etl_spark.sinks import merge_write, read_version

    path = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id long, v string, ver long"
    )
    assert merge_write(base, path, keys=["id"], order_col="ver") == 1
    updates = spark.createDataFrame(
        # id 2: newer -> replaces; id 3: SAME ver -> update wins tie;
        # id 4: new key -> inserted
        [(2, "B", 20), (3, "C", 10), (4, "d", 5)], "id long, v string, ver long"
    )
    assert merge_write(updates, path, keys=["id"], order_col="ver") == 2
    got = {r["id"]: r["v"] for r in read_version(spark, path).collect()}
    assert got == {1: "a", 2: "B", 3: "C", 4: "d"}
    # time travel: pre-merge state intact
    v1 = {r["id"]: r["v"] for r in read_version(spark, path, 1).collect()}
    assert v1 == {1: "a", 2: "b", 3: "c"}


def test_manifest_merge_with_added_column(spark, tmp_path):
    """Schema evolution composes with MERGE: updates carrying a new
    column merge cleanly, old unmatched rows read NULL in it."""
    from whatdropsnow_etl_spark.sinks import merge_write, read_version

    path = str(tmp_path / "merged_evolve")
    merge_write(
        spark.createDataFrame([(1, 1), (2, 1)], "id long, ver long"),
        path, keys=["id"], order_col="ver",
    )
    merge_write(
        spark.createDataFrame([(2, 2, "x")], "id long, ver long, tag string"),
        path, keys=["id"], order_col="ver",
    )
    rows = {r["id"]: r["tag"] for r in read_version(spark, path).collect()}
    assert rows == {1: None, 2: "x"}


def test_write_observed_metrics_match_written_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.sinks.observed import write_observed

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "c", None), (4, None, 5.0)],
        "id long, name string, v double",
    )
    out = str(tmp_path / "observed")
    metrics = write_observed(
        df, out, null_cols=("name", "v"), min_max_col="id"
    )
    # metrics computed BY the write tasks, not by a second scan
    assert metrics["n_rows"] == 4
    assert metrics["n_null_name"] == 2
    assert metrics["n_null_v"] == 1
    assert metrics["min_id"] == 1 and metrics["max_id"] == 4
    # and they describe exactly what landed on disk
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert back.where(F.col("name").isNull()).count() == 2


def test_manifest_diff_versions(spark, tmp_path):
    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.sinks import commit_write, diff_versions

    path = str(tmp_path / "mdiff")
    # v1: ids 0..9 with x = 2*id
    v1 = commit_write(spark.range(10).selectExpr("id", "id * 2 AS x"), path)
    # v2: ids 3..12 with x = 2*id except id=5 changed
    df2 = spark.range(3, 13).selectExpr(
        "id", "CASE WHEN id = 5 THEN 999 ELSE id * 2 END AS x"
    )
    v2 = commit_write(df2, path)
    out = {
        r["id"]: r["status"]
        for r in diff_versions(spark, path, ["id"], v1, v2).collect()
    }
    assert all(out[i] == "removed" for i in range(0, 3))
    assert all(out[i] == "added" for i in range(10, 13))
    assert out[5] == "changed"
    assert all(out[i] == "unchanged" for i in (3, 4, 6, 7, 8, 9))
    # default new_version = latest: diffing v2 against itself-as-latest
    same = diff_versions(spark, path, ["id"], v2)
    assert same.where(F.col("status") != "unchanged").count() == 0


def test_manifest_delete_where_and_keys(spark, tmp_path):
    """Compliance deletes: the new version drops exactly the matched
    rows, the predicate lands in the commit meta, the pre-delete
    snapshot stays time-travelable (until vacuum — the documented
    physical-erasure step), and diff_versions reproduces the removed
    rows as the audit trail. Key deletes are null-safe."""
    from whatdropsnow_etl_spark.sinks import (
        commit_write,
        delete_keys,
        delete_where,
        diff_versions,
        read_version,
    )
    from whatdropsnow_etl_spark.sinks.manifest import committed_meta

    path = str(tmp_path / "gdpr")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "nullkey")],
        "user_id long, payload string",
    )
    v1 = commit_write(base, path)
    v2 = delete_where(spark, path, "user_id = 2", meta={"ticket": "REQ-1"})
    assert {r.user_id for r in read_version(spark, path, v2).collect()} == {
        1,
        3,
        None,
    }
    # pre-delete snapshot still readable; meta records the predicate
    assert read_version(spark, path, v1).count() == 4
    metas = committed_meta(path)  # oldest first, versions from 1
    assert metas[v2 - 1]["deleted_where"] == "user_id = 2"
    assert metas[v2 - 1]["ticket"] == "REQ-1"
    # audit: the diff is exactly the deleted row
    d = diff_versions(spark, path, ["user_id"], v1, v2)
    removed = [r for r in d.collect() if r["status"] == "removed"]
    assert [r.user_id for r in removed] == [2]
    # null-safe key delete: a NULL tombstone removes the NULL-key row
    tomb = spark.createDataFrame([(None,), (3,)], "user_id long")
    v3 = delete_keys(spark, path, tomb, keys=["user_id"])
    assert {r.user_id for r in read_version(spark, path, v3).collect()} == {1}


def test_compact_preserves_hive_layout(spark, tmp_path):
    """Compacting a date-partitioned directory must keep the
    event_date=... layout (a flat rewrite silently demotes the
    partition column and loses listing-time pruning)."""
    import os

    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.sinks.partitioned_parquet import (
        compact_parquet,
        write_partitioned_events,
    )

    ev = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3} 10:00:00", i) for i in range(60)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "part")
    write_partitioned_events(ev, path)
    before = spark.read.parquet(path).orderBy("event_id").collect()
    compact_parquet(spark, path)
    dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(dirs) == 3, dirs
    after = spark.read.parquet(path).orderBy("event_id").collect()
    assert [r["event_id"] for r in before] == [r["event_id"] for r in after]


def test_files_per_partition_splits_a_date(spark, tmp_path):
    """files_per_partition > 1 must actually split a single date's
    rows across multiple files (the unsalted repartition hashed the
    date alone, so every date stayed whole in one task)."""
    import glob

    from pyspark.sql import functions as F

    from whatdropsnow_etl_spark.sinks.partitioned_parquet import (
        write_partitioned_events,
    )

    ev = spark.createDataFrame(
        [(i, "2024-02-01 %02d:00:00" % (i % 24), i) for i in range(500)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "salted")
    write_partitioned_events(ev, path, files_per_partition=4)
    files = glob.glob(f"{path}/event_date=2024-02-01/*.parquet")
    assert len(files) >= 2, files
    assert spark.read.parquet(path).count() == 500
