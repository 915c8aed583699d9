"""Structured Streaming windowed aggregation == its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whatdropsnow_etl_spark.functions.timeutil import ts_micros
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from whatdropsnow_etl_spark.streaming import windowed_event_agg

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def events_json_dir(spark, tables, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_json"))
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(4)
        .write.mode("overwrite")
        .json(out)
    )
    return out


def test_streaming_matches_batch(spark, tables, events_json_dir, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .json(events_json_dir)
    )
    agg = windowed_event_agg(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    batch = windowed_event_agg(
        tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    )
    want = {
        (r["hour_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch(spark, tables, events_json_dir, tmp_path):
    from whatdropsnow_etl_spark.streaming import dedup_stream

    # events with synthetic duplicate ids: reuse the same dir twice
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .json(events_json_dir)
    )
    deduped = dedup_stream(stream, key_cols=("event_id",), watermark="24 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream").collect()[0]
    batch = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    assert got["n"] == got["d"] == batch.select("event_id").distinct().count()


def test_streaming_parquet_sink_exactly_once(spark, tables, events_json_dir, tmp_path):
    from whatdropsnow_etl_spark.streaming import write_stream_parquet

    out_dir = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .json(events_json_dir)
    )
    q = write_stream_parquet(stream, out_dir, ckpt)
    q.awaitTermination(120)
    n_src = tables["events"].count()
    assert spark.read.parquet(out_dir).count() == n_src
    # restart with same checkpoint: no new data -> no duplicates
    stream2 = spark.readStream.schema(SCHEMA).json(events_json_dir)
    q2 = write_stream_parquet(stream2, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n_src


def test_stateful_sessionize_matches_batch(spark, tables, events_json_dir, tmp_path):
    import math

    from whatdropsnow_etl_spark.operators import sessionize
    from whatdropsnow_etl_spark.streaming import sessionize_stream

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_json_dir)
    )
    sess = sessionize_stream(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_seq"]): (
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    # batch twin over the SAME json files: the json round-trip keeps
    # millisecond timestamps, parquet keeps microseconds
    batch_src = spark.read.schema(SCHEMA).json(events_json_dir)
    batch = sessionize(
        batch_src, "user_id", "ts", "event_id", "value", "30 MINUTES"
    ).collect()
    full = {
        (r["user_id"], r["session_seq"]): (
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["sum_value"],
        )
        for r in batch
    }
    last_seq = {}
    for (u, s) in full:
        last_seq[u] = max(last_seq.get(u, 0), s)
    # every session closed by a successor event must be emitted;
    # each user's final session may or may not have timed out yet
    must_have = {k for k in full if k[1] < last_seq[k[0]]}
    assert must_have <= set(got) <= set(full)
    for k in got:
        gs, ge, gn, gv = got[k]
        ws, we, wn, wv = full[k]
        assert (gs, ge, gn) == (ws, we, wn), k
        assert math.isclose(gv, wv, rel_tol=1e-9), k


def test_sessionize_timeout_then_resume(spark, tmp_path):
    """After an event-time-timeout flush, a user's NEXT session must
    continue the seq numbering (tombstone state), not restart at 1
    and collide with the already-emitted row."""
    import json
    from datetime import datetime, timezone

    from whatdropsnow_etl_spark.streaming import sessionize_stream

    def us(s: str) -> int:
        return int(
            datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )

    src = tmp_path / "src"
    src.mkdir()

    def write_file(i, rows):
        with open(src / f"f{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def ev(eid, ts, uid=1):
        return {
            "event_id": eid,
            "ts": ts,
            "user_id": uid,
            "event_type": "x",
            "value": 1.0,
        }

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    sess = sessionize_stream(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_resume")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # session 1 for user 1
        write_file(1, [ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00")])
        q.processAllAvailable()
        # advance the watermark far past 10:35 via user 2 only; the
        # extra file guarantees a batch runs with the advanced
        # watermark and no user-1 data, so the TIMEOUT branch flushes
        # user 1's open session
        write_file(2, [ev(3, "2024-01-01 15:00:00", uid=2)])
        q.processAllAvailable()
        write_file(3, [ev(4, "2024-01-01 15:01:00", uid=2)])
        q.processAllAvailable()
        flushed = {
            (r["user_id"], r["session_seq"])
            for r in spark.sql("SELECT * FROM sess_resume").collect()
        }
        assert (1, 1) in flushed, "timeout flush did not happen before resume"
        # user 1 resumes: one session closed in-batch by a later event
        write_file(
            4,
            [
                ev(5, "2024-01-01 20:00:00"),
                ev(6, "2024-01-01 20:05:00"),
                ev(7, "2024-01-01 23:00:00"),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_seq"]): (r["session_start_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_resume").collect()
    }
    assert got[(1, 1)] == (us("2024-01-01 10:00:00"), 2)
    # the post-timeout session must be seq 2, not a second seq 1
    assert got[(1, 2)] == (us("2024-01-01 20:00:00"), 2)


def test_streaming_funnel_matches_batch(spark, tables, tmp_path):
    """Streaming curation funnel == batch curation_funnel on the same
    corpus for the four streamable stages."""
    from whatdropsnow_etl_spark.plans.curation import curation_funnel
    from whatdropsnow_etl_spark.streaming import curation_funnel_stream
    from pyspark.sql.types import StructType, StructField, LongType, StringType

    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    src = str(tmp_path / "docs_json")
    (
        tables["documents"]
        .select("doc_id", "text", "lang")
        .coalesce(4)
        .write.mode("overwrite")
        .json(src)
    )
    stream = (
        spark.readStream.schema(doc_schema).option("maxFilesPerTrigger", 1).json(src)
    )
    funnel = curation_funnel_stream(stream, quality_min=0.75, lang="de")
    q = (
        funnel.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["stage"]: r["n_docs"]
        for r in spark.sql("SELECT * FROM funnel_stream").collect()
    }
    want = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel(
            tables["documents"], quality_min=0.75, lang="de"
        ).collect()
    }
    assert set(got) == {"1_all", "2_quality", "3_lang", "4_exact_dedup"}
    for stage in got:
        assert got[stage] == want[stage], stage


def test_streaming_upsert_matches_batch(spark, tables, events_json_dir, tmp_path):
    """Streaming foreachBatch upsert == batch latest-wins over the
    same events, including across micro-batch boundaries."""
    from whatdropsnow_etl_spark.operators import latest_wins
    from whatdropsnow_etl_spark.sinks import UpsertParquetSink
    from whatdropsnow_etl_spark.streaming import upsert_stream

    # version-authoritative resolution: micro-batch arrival order is
    # uncorrelated with event time, so an old event in a late batch
    # must not clobber newer state (arrival-order default would)
    sink = UpsertParquetSink(
        str(tmp_path / "state"),
        ["user_id", "event_type"],
        "ts",
        n_buckets=4,
        resolve_by_version=True,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .json(events_json_dir)
    )
    q = upsert_stream(
        stream,
        sink,
        str(tmp_path / "ckpt_upsert"),
        order_cols=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["event_type"]): (r["ts"], r["event_id"])
        for r in sink.read(spark).collect()
    }
    batch_src = spark.read.schema(SCHEMA).json(events_json_dir)
    want = {
        (r["user_id"], r["event_type"]): (r["ts"], r["event_id"])
        for r in latest_wins(
            batch_src,
            ["user_id", "event_type"],
            [F.col("ts").desc(), F.col("event_id").desc()],
        ).collect()
    }
    assert got == want


def test_streaming_interval_join_matches_batch(spark, tables, events_json_dir, tmp_path):
    """Watermarked stream-stream interval join == bucketized batch
    interval_overlap_count on the same events, across micro-batches."""
    from whatdropsnow_etl_spark.operators import interval_overlap_count
    from whatdropsnow_etl_spark.streaming import streaming_interval_pairs

    trigger = F.col("value") >= 250.0
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_json_dir)
    )
    pairs = streaming_interval_pairs(stream, trigger=trigger, window_s=14_400)
    q = (
        pairs.writeStream.format("memory")
        .queryName("interval_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_intervals"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: r["n"]
        for r in spark.sql(
            "SELECT event_id, COUNT(*) AS n FROM interval_pairs GROUP BY event_id"
        ).collect()
    }
    want = {
        r["event_id"]: r["n_windows"]
        for r in interval_overlap_count(
            tables["events"], trigger=trigger, window_s=14_400
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, tables, events_json_dir, tmp_path):
    """Stream-static broadcast join == the same join on batch input."""
    from whatdropsnow_etl_spark.streaming import enrich_stream

    dim = (
        tables["customer"]
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
        .where(F.col("user_id") < 1000)
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .json(events_json_dir)
    )
    out = enrich_stream(stream, dim, on="user_id").select(
        "event_id", "user_id", "c_nationkey"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["c_nationkey"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    want = {
        (r["event_id"], r["c_nationkey"])
        for r in tables["events"]
        .join(F.broadcast(dim), on="user_id", how="left")
        .select("event_id", "c_nationkey")
        .collect()
    }
    assert len(got) > 0 and got == want


def test_streaming_quantiles_within_sketch_bound(spark, tables, events_json_dir, tmp_path):
    """Streamed windowed percentile_approx lands within the sketch's
    rank-error bound of the batch-EXACT per-window quantiles."""
    from whatdropsnow_etl_spark.operators import exact_group_quantiles
    from whatdropsnow_etl_spark.streaming import windowed_value_quantiles

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_json_dir)
    )
    q = (
        windowed_value_quantiles(stream, ps=(0.5, 0.9))
        .writeStream.format("memory")
        .queryName("stream_quant")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_quant"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start_us"], r["event_type"]): r
        for r in spark.sql("SELECT * FROM stream_quant").collect()
    }
    assert got

    batch = tables["events"].select(
        ts_micros(F.date_trunc("hour", "ts")).alias("window_start_us"),
        "event_type",
        "event_id",
        "value",
    )
    exact = {
        (r["window_start_us"], r["event_type"]): r
        for r in exact_group_quantiles(
            batch,
            ["window_start_us", "event_type"],
            "value",
            ps=(0.5, 0.9),
            tiebreak_col="event_id",
        ).collect()
    }
    assert set(got) == set(exact)
    # rank error <= n/accuracy; windows here are small, so allow the
    # value at +-2 ranks by comparing against the window's sorted
    # cents directly
    rows = batch.select(
        "window_start_us", "event_type", (F.round(F.col("value") * 100, 0)).cast("long").alias("c")
    ).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r["window_start_us"], r["event_type"]), []).append(r["c"])
    for key, g in got.items():
        cents = sorted(by_key[key])
        n = len(cents)
        assert g["n_events"] == n
        for p, col in ((0.5, "p50_cents"), (0.9, "p90_cents")):
            target = int(p * (n - 1))
            window_vals = cents[max(0, target - 2) : target + 3]
            assert window_vals[0] <= g[col] <= window_vals[-1], (key, col)


def test_streaming_hll_register_merge_equals_batch(spark, tables, events_json_dir, tmp_path):
    """Incremental sketch maintenance: fold each micro-batch's HLL
    registers into a running store with MAX-merge; the final
    estimate equals the batch sketch EXACTLY (same hash => register
    merge is associative — no approximation drift across batches).
    This is the 100 TB pattern for corpus stats: persist registers
    per day, merge, estimate — never rescan history."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import (
        hll_count_distinct,
        hll_estimate_from_registers,
        hll_registers,
    )

    store = str(tmp_path / "hll_store")

    def merge_batch(batch_df, batch_id):
        regs = hll_registers(batch_df, ["event_type"], "user_id")
        if os.path.isdir(store):
            prev = batch_df.sparkSession.read.parquet(store)
            regs = (
                prev.unionByName(regs)
                .groupBy("event_type", "__reg")
                .agg(F.max("__rho").alias("__rho"))
            )
        regs.write.mode("overwrite").format("parquet").save(store + "_next")
        # swap for the test; production would use a transactional
        # table format
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_json_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    merged = spark.read.parquet(store)
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_estimate_from_registers(merged, ["event_type"]).collect()
    }
    want = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_count_distinct(
            tables["events"], ["event_type"], "user_id"
        ).collect()
    }
    assert got == want


def test_streaming_incremental_dedup_grows_index(spark, tables, tmp_path):
    """Per-micro-batch dedup probe against the growing band index:
    after draining the stream, (a) the matches are exactly the
    full-corpus LSH pairs whose two docs arrived in DIFFERENT
    micro-batches (directed later->earlier), and (b) the store holds
    every doc's bucket rows."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from whatdropsnow_etl_spark.operators import minhash_lsh_pairs
    from whatdropsnow_etl_spark.streaming.incremental_dedup import (
        probe_and_grow_index,
    )

    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "docs_json")
    docs = tables["documents"].select("doc_id", "text")
    # deterministic 3-way batch split, one file per micro-batch
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)

    store = str(tmp_path / "band_index")
    matches_dir = str(tmp_path / "matches")
    stream = (
        spark.readStream.schema(doc_schema).option("maxFilesPerTrigger", 1).json(src)
    )
    q = (
        stream.writeStream.foreachBatch(probe_and_grow_index(store, matches_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt_incdedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # (b) the store ends holding 4 bucket rows per doc (bands=4)
    index = spark.read.parquet(store)
    assert index.count() == docs.count() * 4

    # (a) matches == cross-batch LSH pairs; batch order follows file
    # arrival, so recover each doc's batch from the matches' batch_id
    # of its own arrival... simpler: check SET equality undirected.
    got = {
        tuple(sorted((r["batch_doc"], r["index_doc"])))
        for r in spark.read.parquet(matches_dir).collect()
    }
    want = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in minhash_lsh_pairs(docs).collect()
        if r["doc_a"] % 3 != r["doc_b"] % 3  # different micro-batches
    }
    assert got == want


def test_streaming_line_dedup_matches_batch_prefixes(spark, tables, tmp_path):
    """The streaming line-dedup twin: each micro-batch's cleaned
    output equals the full batch twin ``line_dedup`` run over ALL
    docs ingested up to and including that batch, restricted to the
    batch's docs — the additive-counts contract of
    line_dedup_incremental carried across micro-batches. Also pins
    replay-safety: re-running a batch's fold by hand cannot inflate
    the index (per-(key, batch) MAX)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from whatdropsnow_etl_spark.operators import line_dedup
    from whatdropsnow_etl_spark.streaming import (
        clean_and_grow_line_index,
        load_line_index,
    )

    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "ld_docs")
    docs = tables["documents"].select("doc_id", "text")
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)

    store = str(tmp_path / "line_index")
    out = str(tmp_path / "cleaned")
    fn = clean_and_grow_line_index(
        store, out, min_docs=3, line_tokens=8, hash_lines=True
    )
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt_linededup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    cleaned = spark.read.parquet(out)
    assert cleaned.count() == docs.count()
    # recover which batch each doc landed in from the output itself,
    # then check every prefix against the batch twin
    doc_batch = {
        r["doc_id"]: r["batch_id"]
        for r in cleaned.select("doc_id", "batch_id").collect()
    }
    batches = sorted(set(doc_batch.values()))
    assert len(batches) == 3
    for i, b in enumerate(batches):
        prefix_ids = [d for d, bb in doc_batch.items() if bb <= b]
        batch_ids = {d for d, bb in doc_batch.items() if bb == b}
        twin = line_dedup(
            docs.where(F.col("doc_id").isin(prefix_ids)),
            min_docs=3,
            line_tokens=8,
            hash_lines=True,
        )
        want = {
            (r["doc_id"], r["n_lines"], r["n_removed"], r["text_clean"])
            for r in twin.collect()
            if r["doc_id"] in batch_ids
        }
        got = {
            (r["doc_id"], r["n_lines"], r["n_removed"], r["text_clean"])
            for r in cleaned.where(F.col("batch_id") == b).collect()
        }
        assert got == want, f"batch {b} (prefix {i + 1}/3)"
    # replay-safety of the index fold: duplicate one batch's stored
    # counts (what a foreachBatch redelivery would append) — the
    # loaded index is unchanged
    before = {
        (r["__k"], r["n_docs"])
        for r in load_line_index(spark, store).collect()
    }
    one = spark.read.parquet(store).where(F.col("batch_id") == batches[0])
    one.write.mode("append").parquet(store)
    after = {
        (r["__k"], r["n_docs"])
        for r in load_line_index(spark, store).collect()
    }
    assert after == before
    # replay-safety of the CLEAN path: redeliver the LAST batch by
    # hand (its counts already landed in the store) — the replayed
    # cleaned rows must be byte-identical to the first delivery's,
    # because apply() excludes the current batch_id when loading the
    # index (otherwise the batch's own lines double-count and
    # text_clean/n_removed drift, making downstream doc_id-dedupe
    # nondeterministic)
    last = batches[-1]
    first_delivery = {
        (r["doc_id"], r["n_lines"], r["n_removed"], r["text_clean"])
        for r in cleaned.where(F.col("batch_id") == last).collect()
    }
    replay_df = docs.where(
        F.col("doc_id").isin([d for d, bb in doc_batch.items() if bb == last])
    )
    fn(replay_df, last)
    redelivered = {
        (r["doc_id"], r["n_lines"], r["n_removed"], r["text_clean"])
        for r in spark.read.parquet(out)
        .where(F.col("batch_id") == last)
        .collect()
    }
    assert redelivered == first_delivery


def test_streaming_editdist_union_equals_full_relation(spark, tables, tmp_path):
    """The streaming editdist twin: the UNION of per-batch new-pair
    outputs over a 3-way micro-batch split equals the full batch
    twin ``editdist_pairs`` over all docs, each pair exactly once
    (a pair is discovered at its LATER doc's batch). Also pins
    replay-safety: a hand-redelivered batch emits byte-identical
    pairs (the store load excludes the current batch_id)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from whatdropsnow_etl_spark.operators import editdist_pairs
    from whatdropsnow_etl_spark.streaming import pair_and_grow_doc_store

    docs = tables["documents"].select("doc_id", "text", "lang", "n_chars")
    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("n_chars", IntegerType()),
        ]
    )
    src = str(tmp_path / "ed_docs")
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "ed_store")
    out = str(tmp_path / "ed_pairs")
    fn = pair_and_grow_doc_store(store, out)
    q = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt_ed"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_rows = spark.read.parquet(out).collect()
    got = {(r["lo"], r["hi"], r["dist"]) for r in got_rows}
    # each pair exactly once across batches
    assert len(got_rows) == len(got)
    want = {
        (r["lo"], r["hi"], r["dist"])
        for r in editdist_pairs(docs).collect()
    }
    assert got == want
    # hand-redeliver the last batch: pairs byte-identical (set
    # unchanged after the duplicate append)
    batches = sorted({r["batch_id"] for r in spark.read.parquet(out).collect()})
    last = batches[-1]
    first_delivery = {
        (r["lo"], r["hi"], r["dist"])
        for r in spark.read.parquet(out)
        .where(F.col("batch_id") == last)
        .collect()
    }
    last_ids = {
        r["doc_id"]
        for r in spark.read.parquet(store)
        .where(F.col("batch_id") == last)
        .collect()
    }
    fn(docs.where(F.col("doc_id").isin(list(last_ids))), last)
    redelivered = {
        (r["lo"], r["hi"], r["dist"])
        for r in spark.read.parquet(out)
        .where(F.col("batch_id") == last)
        .collect()
    }
    assert redelivered == first_delivery


def test_broadcast_refresh_dim_staleness_contract(spark):
    """The refreshing dim re-runs its loader only at refresh
    boundaries: versions become visible exactly every N get() calls,
    never between them."""
    from whatdropsnow_etl_spark.streaming import RefreshingBroadcastDim

    version = {"v": 0}

    def loader():
        return spark.createDataFrame(
            [(1, f"v{version['v']}")], "user_id long, seg string"
        )

    dim = RefreshingBroadcastDim(loader, refresh_every_batches=2)
    seen = []
    for _ in range(5):
        version["v"] += 1  # dim source changes before every batch
        seen.append(dim.get().first()["seg"])
    # batches 1-2 see the snapshot taken at batch 1 (v1), batches 3-4
    # the one at batch 3 (v3), batch 5 refreshes again (v5)
    assert seen == ["v1", "v1", "v3", "v3", "v5"]
    assert dim.n_refreshes == 3
    dim.close()


def test_broadcast_refresh_enrichment_matches_batch_join(
    spark, tables, tmp_path
):
    """foreachBatch enrichment through the refreshing broadcast dim
    equals the plain batch join, and multiple micro-batches consume
    ONE loader run (the whole point: no per-trigger dim re-read)."""
    from whatdropsnow_etl_spark.streaming import (
        RefreshingBroadcastDim,
        enrich_foreach_batch,
    )

    events = tables["events"].select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "events_split")
    # one file per micro-batch (coalesce can't split a 1-partition read)
    for part in range(3):
        events.where(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)

    dim_rows = (
        tables["events"]
        .select("user_id")
        .distinct()
        .select("user_id", (F.col("user_id") % 5).alias("cohort"))
    )
    dim_path = str(tmp_path / "dim")
    dim_rows.write.mode("overwrite").parquet(dim_path)

    loads = {"n": 0}

    def loader():
        loads["n"] += 1
        return spark.read.parquet(dim_path)

    collected = []
    batches = {"n": 0}

    def sink(df, epoch_id):
        batches["n"] += 1
        collected.extend(
            (r["event_id"], r["user_id"], r["cohort"]) for r in df.collect()
        )

    dim = RefreshingBroadcastDim(loader, refresh_every_batches=1000)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .json(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            enrich_foreach_batch(dim, on=["user_id"], sink=sink)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_refresh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dim.close()

    assert batches["n"] > 1  # genuinely multi-batch
    assert loads["n"] == dim.n_refreshes == 1  # one load served them all
    want = {
        (r["event_id"], r["user_id"], r["cohort"])
        for r in tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .join(dim_rows, "user_id", "left")
        .collect()
    }
    assert set(collected) == want and len(collected) == len(want)


def test_stream_stream_join_matches_batch(spark, tables, events_json_dir, tmp_path):
    from whatdropsnow_etl_spark.streaming import correlate_streams

    ev = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    views_b = ev.where(F.col("event_type") == "view")
    buys_b = ev.where(F.col("event_type") == "purchase")
    # batch twin: watermarks are a no-op on batch inputs
    expected = sorted(
        (r["event_id"], r["r_event_id"])
        for r in correlate_streams(
            views_b, buys_b, max_span="48 hours", watermark="1 hour"
        ).select("event_id", "r_event_id").collect()
    )
    assert expected, "fixture must produce at least one correlated pair"

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .json(events_json_dir)
    )
    views_s = stream.where(F.col("event_type") == "view")
    buys_s = stream.where(F.col("event_type") == "purchase")
    joined = correlate_streams(
        views_s, buys_s, max_span="48 hours", watermark="1 hour"
    )
    q = (
        joined.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ssjoin"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["event_id"], r["r_event_id"])
        for r in spark.table("ss_join").collect()
    )
    assert got == expected


def test_streaming_topk_mg_bounds(spark, tables, tmp_path):
    """Bounded-state heavy hitters: fold each micro-batch's exact
    user counts into a Misra-Gries summary of <= capacity rows; the
    classic MG guarantees must hold vs the exact batch counts —
    (1) never overestimates, (2) underestimates by at most
    N/(capacity+1), (3) every key above that frequency survives,
    (4) state stays within capacity after every fold."""
    import os
    import shutil

    from whatdropsnow_etl_spark.streaming import heavy_hitters, mg_merge

    capacity = 16
    store = str(tmp_path / "mg_store")
    sizes = []
    # the shared fixture coalesces to one file (events is a single
    # input partition at sf0.001); force 4 files -> 4 micro-batches
    events_dir = str(tmp_path / "events_json4")
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(4)
        .write.mode("overwrite")
        .json(events_dir)
    )

    def merge_batch(batch_df, batch_id):
        counts = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        prev = (
            batch_df.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = mg_merge(prev, counts, capacity, ["user_id"])
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(
            batch_df.sparkSession.read.parquet(store).count()
        )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_mg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(sizes) > 1 and all(s <= capacity for s in sizes)
    state = {r["user_id"]: r["n"] for r in spark.read.parquet(store).collect()}
    exact = {
        r["user_id"]: r["n"]
        for r in tables["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    total = sum(exact.values())
    bound = total // (capacity + 1)
    for uid, est in state.items():
        assert est <= exact[uid]
        assert exact[uid] - est <= bound
    for uid, n in exact.items():
        if n > bound:
            assert uid in state
    # the report ranks deterministically and stays within the state
    top = heavy_hitters(spark.read.parquet(store), 5, ["user_id"]).collect()
    assert [r["rnk"] for r in top] == list(range(1, len(top) + 1))
    assert all(r["user_id"] in state for r in top)


def test_drift_gate_quarantines_null_surge(spark, tmp_path):
    """Unit-level gate contract via direct foreachBatch calls: a
    null-surge batch lands in quarantine, never in the sink, and the
    baseline reflects exactly the appended batches."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quar"),
        cols=["value"],
        max_null_rate_jump=0.3,
    )
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, value double")
    # batch 0 bootstraps the baseline (0% nulls over 4 rows)
    sink(mk([(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]), 0)
    # batch 1: 25% nulls — within the 30% jump, appends
    sink(mk([(5, 5.0), (6, None), (7, 7.0), (8, 8.0)]), 1)
    # batch 2: 100% nulls — the upstream breakage, quarantined
    sink(mk([(9, None), (10, None)]), 2)
    # batch 3: clean again — the baseline was NOT poisoned by batch 2
    sink(mk([(11, 11.0)]), 3)
    assert sink.n_appended == 3 and sink.n_quarantined == 1
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert clean.count() == 9
    assert clean.where(F.col("event_id").isin(9, 10)).count() == 0
    quar = spark.read.parquet(str(tmp_path / "quar"))
    assert sorted(r["event_id"] for r in quar.collect()) == [9, 10]
    # baseline state = profile of exactly the appended batches
    state = spark.read.parquet(sink.state_path).collect()
    assert [(r["column"], r["n_rows"], r["n_null"]) for r in state] == [
        ("value", 9, 1)
    ]


def test_drift_gate_through_real_stream(spark, tables, tmp_path):
    """Integration: the gate runs as a writeStream foreachBatch over
    file-source micro-batches; a poisoned file quarantines while the
    clean ones append."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    events = tables["events"].select("event_id", "user_id", "value").limit(300)
    src = str(tmp_path / "src")
    events.where(F.col("event_id") % 3 == 0).coalesce(1).write.mode("append").json(src)
    events.where(F.col("event_id") % 3 == 1).coalesce(1).write.mode("append").json(src)
    # the poisoned micro-batch: value all-NULL
    events.where(F.col("event_id") % 3 == 2).withColumn(
        "value", F.lit(None).cast("double")
    ).coalesce(1).write.mode("append").json(src)

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quar"),
        cols=["value"],
    )
    schema = "event_id bigint, user_id bigint, value double"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sink.n_quarantined == 1
    assert sink.n_appended == 2
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert clean.where(F.col("value").isNull()).count() == 0


def test_drift_gate_uniqueness_collapse(spark, tmp_path):
    """The HLL-backed second gate: a replay storm (one id repeated)
    quarantines; unique-id batches and enum columns never do."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quar"),
        cols=["event_id", "kind"],
        uniqueness_cols=["event_id", "kind"],
        min_uniqueness_vs_baseline=0.5,
    )
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, kind string")
    # bootstrap + a clean batch: ids unique, kind a 2-value enum
    sink(mk([(i, "ab"[i % 2]) for i in range(100)]), 0)
    sink(mk([(i, "ab"[i % 2]) for i in range(100, 200)]), 1)
    assert sink.n_appended == 2 and sink.n_quarantined == 0
    # replay storm: one id repeated 100x -> batch uniqueness 0.01
    # vs baseline ~1.0 -> quarantined
    sink(mk([(7, "a")] * 100), 2)
    assert sink.n_quarantined == 1
    # enum col alone can't trip it: a batch of all-'a' kinds has
    # batch uniqueness 1/100, baseline kind uniqueness 2/200=0.01 ->
    # 0.01 >= 0.5*0.01 holds; ids stay unique
    sink(mk([(i, "a") for i in range(300, 400)]), 3)
    assert sink.n_appended == 3 and sink.n_quarantined == 1
    # the storm never reached the clean sink or the baseline
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert clean.where(F.col("event_id") == 7).count() <= 1


def test_drift_gate_uniqueness_col_auto_profiled(spark, tmp_path):
    """A uniqueness_col NOT listed in cols must still be profiled
    (auto-extended), otherwise its baseline row count is 0 and the
    duplicate-flood gate is silently disabled."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quar"),
        cols=["kind"],                 # event_id deliberately absent
        uniqueness_cols=["event_id"],
        min_uniqueness_vs_baseline=0.5,
    )
    assert "event_id" in sink.cols     # auto-extended
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, kind string")
    sink(mk([(i, "a") for i in range(100)]), 0)
    sink(mk([(i, "a") for i in range(100, 200)]), 1)
    assert sink.n_quarantined == 0
    sink(mk([(7, "a")] * 100), 2)      # replay storm must still trip
    assert sink.n_quarantined == 1


def test_drift_gate_retry_idempotent(spark, tmp_path):
    """foreachBatch redelivers the same batch_id on retry: the gate
    must not double-append or double-merge the baseline."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quar"),
        cols=["value"],
    )
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, value double")
    sink(mk([(1, 1.0), (2, 2.0)]), 0)
    sink(mk([(1, 1.0), (2, 2.0)]), 0)  # retry of the SAME epoch
    sink(mk([(3, 3.0)]), 1)
    assert sink.n_appended == 2  # the retry was a no-op
    assert spark.read.parquet(str(tmp_path / "clean")).count() == 3
    state = spark.read.parquet(sink.state_path).collect()
    assert [(r["n_rows"], r["n_null"]) for r in state] == [(3, 0)]


def test_transition_stream_matches_batch(spark, tables, events_json_dir, tmp_path):
    """The streaming lag (one tuple of state per user) must emit
    exactly the batch event_transitions pair multiset when events
    arrive in order, even across many micro-batches."""
    from whatdropsnow_etl_spark.operators import event_transitions
    from whatdropsnow_etl_spark.streaming import transition_stream

    src4 = str(tmp_path / "trans_src4")
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(4)
        .write.json(src4)
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .json(src4)
    )
    q = (
        transition_stream(stream)
        .writeStream.format("memory")
        .queryName("transitions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("transitions")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got_map = {(r["prev_type"], r["next_type"]): r["n"] for r in got}
    want = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in event_transitions(tables["events"]).collect()
    }
    # Note: the JSON fixture splits into files arbitrarily, so
    # cross-batch arrival can be out of ts order per user; transitions
    # then follow stream order. Totals per user still match: every
    # event after a user's first emits exactly one transition.
    assert sum(got_map.values()) == sum(want.values())
    # and when the stream is a SINGLE batch (fully sortable), the
    # pair multiset is exactly the batch answer
    stream1 = spark.readStream.schema(SCHEMA).json(events_json_dir)
    q2 = (
        transition_stream(stream1)
        .writeStream.format("memory")
        .queryName("transitions_one")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans1"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    one = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.table("transitions_one")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert one == want


def test_manifest_stream_sink_exactly_once(spark, tables, events_json_dir, tmp_path):
    """Each micro-batch becomes one atomic full-snapshot version;
    redelivering a batch id is a no-op; the final version equals the
    full input; intermediate versions stay readable."""
    from whatdropsnow_etl_spark.sinks.manifest import (
        committed_meta,
        current_version,
        read_version,
    )
    from whatdropsnow_etl_spark.streaming import ManifestStreamSink

    path = str(tmp_path / "mstream")
    sink = ManifestStreamSink(path)
    # events_json_dir can be a single file (coalesce on a 1-partition
    # frame is a no-op); force a genuinely multi-file source so
    # maxFilesPerTrigger yields several micro-batches
    src4 = str(tmp_path / "src4")
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(4)
        .write.json(src4)
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src4)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_m"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_versions = current_version(path)
    assert n_versions and n_versions >= 2  # several micro-batches
    total = tables["events"].count()
    assert read_version(spark, path).count() == total
    # versions are cumulative snapshots: strictly growing counts
    counts = [read_version(spark, path, v).count() for v in range(1, n_versions + 1)]
    assert counts == sorted(counts) and counts[-1] == total
    # redelivery of an old batch id: no new version, same data
    first_batch = spark.table  # noqa: F841 (clarity only)
    sink(read_version(spark, path, 1), batch_id=0)
    assert current_version(path) == n_versions
    assert read_version(spark, path).count() == total
    ids = [m["batch_id"] for m in committed_meta(path)]
    assert len(ids) == len(set(ids))


def test_path_stream_matches_batch(spark, tables, events_json_dir, tmp_path):
    """The streaming k-wide window (a (k-1)-suffix of state per
    user) must emit exactly the batch top_event_paths window
    multiset when the stream is a single (fully sortable) batch,
    and the per-user record count must survive multi-batch arrival."""
    from whatdropsnow_etl_spark.operators import top_event_paths
    from whatdropsnow_etl_spark.streaming import path_stream

    stream1 = spark.readStream.schema(SCHEMA).json(events_json_dir)
    q = (
        path_stream(stream1, k=3)
        .writeStream.format("memory")
        .queryName("paths_one")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_paths1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["path"]: r["n"]
        for r in spark.table("paths_one")
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want_df = top_event_paths(tables["events"], k=3, top_k=10**9)
    want = {r["path"]: r["n"] for r in want_df.collect()}
    assert got == want
    # multi-batch: windows chain across micro-batches through state,
    # so the total record count equals the batch total even when
    # file splits land a user's events in different batches
    src4 = str(tmp_path / "paths_src4")
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(4)
        .write.json(src4)
    )
    stream4 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src4)
    )
    q2 = (
        path_stream(stream4, k=3)
        .writeStream.format("memory")
        .queryName("paths_multi")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_paths4"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    assert spark.table("paths_multi").count() == sum(want.values())


def test_manifest_merge_stream_sink_upserts_exactly_once(spark, tmp_path):
    """A keyed change stream merged per micro-batch: the table ends
    in the latest-wins state, a redelivered batch id is a no-op, and
    every intermediate snapshot remains time-travelable."""
    from whatdropsnow_etl_spark.sinks.manifest import (
        current_version,
        read_version,
    )
    from whatdropsnow_etl_spark.streaming import ManifestMergeStreamSink

    path = str(tmp_path / "cdc_table")
    sink = ManifestMergeStreamSink(path, keys=["id"], order_col="ver")
    b0 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "id long, v string, ver long"
    )
    b1 = spark.createDataFrame(
        # id 2 updated; id 3 inserted; id 1 untouched
        [(2, "B", 2), (3, "c", 2)], "id long, v string, ver long"
    )
    sink(b0, 0)
    sink(b1, 1)
    # redelivery of batch 1 after a simulated crash: no-op
    v_before = current_version(path)
    sink(b1, 1)
    assert current_version(path) == v_before
    got = {r["id"]: r["v"] for r in read_version(spark, path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # time travel to the pre-merge snapshot
    v1 = {r["id"]: r["v"] for r in read_version(spark, path, 1).collect()}
    assert v1 == {1: "a", 2: "b"}


def test_attribution_stream_matches_batch(spark, tables, events_json_dir, tmp_path):
    """The streaming last-touch state (one tuple per user) must credit
    exactly like the batch window when events arrive in order, and
    conserve one credited record per conversion across micro-batches
    regardless of arrival order."""
    from whatdropsnow_etl_spark.operators import last_touch_attribution
    from whatdropsnow_etl_spark.streaming import attribution_stream

    # single batch (fully sortable): credited multiset == batch twin
    stream1 = spark.readStream.schema(SCHEMA).json(events_json_dir)
    q = (
        attribution_stream(stream1)
        .writeStream.format("memory")
        .queryName("attrib_one")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["touch_type"]: (r["n"], round(r["v"], 2))
        for r in spark.table("attrib_one")
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("v"),
        )
        .collect()
    }
    want = {
        r["touch_type"]: (r["n_conversions"], round(r["total_value"], 2))
        for r in last_touch_attribution(tables["events"]).collect()
    }
    assert got == want

    # several micro-batches, arbitrary file split: arrival order per
    # user may differ, but every conversion still emits EXACTLY one
    # credited record and total credited value is conserved
    src4 = str(tmp_path / "attrib_src4")
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(4)
        .write.json(src4)
    )
    stream4 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src4)
    )
    q2 = (
        attribution_stream(stream4)
        .writeStream.format("memory")
        .queryName("attrib_many")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib4"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    n_purchases = tables["events"].where(F.col("event_type") == "purchase").count()
    many = spark.table("attrib_many")
    assert many.count() == n_purchases
    total = many.agg(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
    ).collect()[0][0]
    want_total = sum(v for _, v in want.values())
    assert round(total, 2) == round(want_total, 2)


def test_history_stream_matches_batch(spark, tables, events_json_dir, tmp_path):
    """Single fully-sortable batch: the streaming last-N suffix per
    user must equal the batch user_event_sequences relation exactly.
    Multi-batch: sequences chain through state — the latest record
    per user keeps n_events == min(total events, N) and a
    max_len-bounded sequence regardless of file splits."""
    from whatdropsnow_etl_spark.operators import user_event_sequences
    from whatdropsnow_etl_spark.streaming import history_stream

    stream1 = spark.readStream.schema(SCHEMA).json(events_json_dir)
    q = (
        history_stream(stream1, max_len=5)
        .writeStream.format("memory")
        .queryName("hist_one")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: (r["n_events"], r["seq"])
        for r in spark.table("hist_one").collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["seq"])
        for r in user_event_sequences(tables["events"], max_len=5).collect()
    }
    assert got == want
    # multi-batch arrival: keep only the last emission per user
    src = str(tmp_path / "hist_src4")
    (
        tables["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(4)
        .write.json(src)
    )
    stream4 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q2 = (
        history_stream(stream4, max_len=5)
        .writeStream.format("memory")
        .queryName("hist_multi")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist4"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    import pyspark.sql.functions as SF
    from pyspark.sql.window import Window as W

    latest = (
        spark.table("hist_multi")
        .withColumn(
            "rn",
            SF.row_number().over(
                W.partitionBy("user_id").orderBy(SF.desc("ts_us"))
            ),
        )
        .where("rn = 1")
    )
    totals = {
        r["user_id"]: r["n"]
        for r in tables["events"]
        .groupBy("user_id")
        .agg(SF.count(SF.lit(1)).alias("n"))
        .collect()
    }
    for r in latest.collect():
        assert r["n_events"] == min(totals[r["user_id"]], 5)
        assert len(r["seq"].split(" ")) == r["n_events"]


def test_drift_gate_distribution_shift(spark, tmp_path):
    """The value-distribution gate: batches drawn from the baseline
    distribution append; a batch whose mass moved (same null rate,
    same uniqueness — invisible to the other two gates) quarantines,
    and the frozen boundaries + cumulative counts ignore it."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quar"),
        cols=["value"],
        shift_cols=["value"],
        shift_id_col="event_id",
        max_share_l1=0.6,
        shift_bins=4,
    )
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, value double")
    uniform = lambda lo, n, start: [
        (start + i, float(lo + (i % 40))) for i in range(n)
    ]
    # batch 0 bootstraps boundaries from values 0..39
    sink(mk(uniform(0, 80, 0)), 0)
    # batch 1: same distribution — appends
    sink(mk(uniform(0, 80, 100)), 1)
    assert sink.n_appended == 2
    # batch 2: all mass at 1000+ (0% nulls, all-unique ids) — only
    # the shift gate can see this; quarantined
    sink(mk(uniform(1000, 80, 200)), 2)
    assert sink.n_quarantined == 1
    # batch 3: back to baseline — boundaries/counts were not poisoned
    sink(mk(uniform(0, 40, 300)), 3)
    assert sink.n_appended == 3
    quar = spark.read.parquet(str(tmp_path / "quar"))
    assert quar.count() == 80
    assert {r.event_id for r in quar.select("event_id").collect()} == set(
        range(200, 280)
    )


def test_manifest_sink_ledger_survives_vacuum(spark, tables, tmp_path):
    """The idempotence ledger is the cumulative max_batch_id in the
    LATEST manifest's meta: after vacuum(keep_last=1) removes old
    manifests, a replayed old batch id is still skipped — and the
    committed-test never rescans history (O(1) via latest_meta)."""
    from whatdropsnow_etl_spark.sinks.manifest import (
        current_version,
        latest_meta,
        read_version,
        vacuum,
    )
    from whatdropsnow_etl_spark.streaming import ManifestStreamSink

    path = str(tmp_path / "mvac")
    sink = ManifestStreamSink(path)
    ev = tables["events"].select("event_id", "event_type").limit(30)
    b0 = ev.limit(10)
    b1 = ev.limit(20)
    sink(b0, 0)
    sink(b1, 1)
    assert latest_meta(path)["max_batch_id"] == 1
    n_before = read_version(spark, path).count()
    vacuum(path, keep_last=1)
    assert current_version(path) == 2  # latest manifest retained
    # replay of batch 0 (older than the vacuumed ledger window under
    # the old set-based scheme) must STILL be a no-op
    sink(b0, 0)
    assert current_version(path) == 2
    assert read_version(spark, path).count() == n_before
    # a genuinely new batch commits and carries the ledger forward
    sink(ev.limit(5), 2)
    assert latest_meta(path)["max_batch_id"] == 2


def test_manifest_sink_new_checkpoint_not_swallowed(spark, tables, tmp_path):
    """The ledger is scoped to app_id (Delta txn appId pattern): a
    NEW checkpoint (foreachBatch ids restart at 0) pointed at an
    existing table must COMMIT its batch 0, not silently discard
    every batch until the id overtakes the old stream's max — while
    redelivery within each stream stays a no-op."""
    from whatdropsnow_etl_spark.sinks.manifest import (
        current_version,
        latest_meta,
        read_version,
    )
    from whatdropsnow_etl_spark.streaming import ManifestStreamSink

    path = str(tmp_path / "mledger")
    ev = tables["events"].select("event_id", "event_type").limit(30)
    old = ManifestStreamSink(path, app_id="ckpt-old")
    old(ev.limit(10), 0)
    old(ev.limit(20), 5)
    assert latest_meta(path)["max_batch_id"] == 5
    n_old = read_version(spark, path).count()
    # fresh checkpoint over the existing table: batch 0 must land
    new = ManifestStreamSink(path, app_id="ckpt-new")
    new(ev.limit(7), 0)
    assert read_version(spark, path).count() == n_old + 7
    assert latest_meta(path)["ledger_app_id"] == "ckpt-new"
    # redelivery of the NEW stream's batch 0 is still a no-op
    v = current_version(path)
    new(ev.limit(7), 0)
    assert current_version(path) == v


def test_manifest_commit_never_leaves_tmp_or_empty_file(spark, tables, tmp_path):
    """The link(2) publish: after any commit the directory holds no
    .tmp residue and every manifest parses as complete JSON (the
    earlier O_CREAT+replace sequence could expose a zero-byte
    manifest; a crash there bricked the table)."""
    import json
    import os

    from whatdropsnow_etl_spark.sinks.manifest import commit_write

    path = str(tmp_path / "mlink")
    ev = tables["events"].select("event_id").limit(5)
    commit_write(ev, path, mode="overwrite")
    commit_write(ev, path, mode="append")
    names = os.listdir(path)
    assert not [n for n in names if n.endswith(".tmp")]
    for n in names:
        if n.startswith("manifest-"):
            with open(os.path.join(path, n)) as fh:
                m = json.load(fh)  # parses — never zero-byte
            assert m["files"]


def test_drift_gate_shift_only_config_not_inert(spark, tmp_path):
    """A shift-only configuration (cols=[], shift_cols=['value'])
    must still quarantine on a distribution shift — the old
    `drifted and base` condition silently disabled every gate when
    the null-profile baseline was empty."""
    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean2"),
        quarantine_path=str(tmp_path / "quar2"),
        cols=[],
        shift_cols=["value"],
        shift_id_col="event_id",
        max_share_l1=0.6,
        shift_bins=4,
    )
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, value double")
    uniform = lambda lo, n, start: [
        (start + i, float(lo + (i % 40))) for i in range(n)
    ]
    sink(mk(uniform(0, 80, 0)), 0)    # bootstraps boundaries+counts
    sink(mk(uniform(0, 80, 100)), 1)  # baseline-like: appends
    sink(mk(uniform(1000, 80, 200)), 2)  # shifted: MUST quarantine
    assert sink.n_quarantined == 1
    assert sink.n_appended == 2


def test_drift_gate_quarantined_batch_cannot_freeze_boundaries(spark, tmp_path):
    """Shift boundaries bootstrap from the first ACCEPTED batch: a
    batch quarantined by the null gate before any boundaries exist
    must not persist its (corrupted) value distribution as the
    frozen binning."""
    import os

    from whatdropsnow_etl_spark.streaming import DriftGatedSink

    state = str(tmp_path / "state3")
    sink = DriftGatedSink(
        spark,
        path=str(tmp_path / "clean3"),
        quarantine_path=str(tmp_path / "quar3"),
        cols=["value"],
        shift_cols=["value"],
        shift_id_col="event_id",
        state_path=state,
        max_null_rate_jump=0.2,
        shift_bins=4,
    )
    mk = lambda rows: spark.createDataFrame(rows, "event_id bigint, value double")
    # batch 0: clean — establishes the null baseline AND the frozen
    # boundaries from values 0..39
    sink(mk([(i, float(i % 40)) for i in range(80)]), 0)
    assert os.path.exists(sink.bnds_path)
    bnds_before = sink._stored_boundaries()["value"]
    # wipe the boundary store to simulate enabling shift_cols later:
    # the next batch is null-flooded AND value-corrupted — it must be
    # quarantined and must NOT freeze boundaries from its values
    import shutil

    shutil.rmtree(sink.bnds_path)
    bad = mk(
        [(200 + i, None) for i in range(40)]
        + [(300 + i, 99999.0) for i in range(40)]
    )
    sink(bad, 1)
    assert sink.n_quarantined == 1
    assert not os.path.exists(sink.bnds_path)
    # a following clean batch re-bootstraps sane boundaries
    sink(mk([(400 + i, float(i % 40)) for i in range(80)]), 2)
    assert sink.n_appended == 2
    assert sink._stored_boundaries()["value"] == bnds_before


def test_incremental_dedup_replay_no_self_match(spark, tables, tmp_path):
    """A replayed micro-batch probes a store that already holds its
    own bucket rows: the probe must not report a doc as a near-dup
    of itself (unique docs were quarantined as dups before the
    batch_doc != index_doc guard)."""
    from whatdropsnow_etl_spark.streaming.incremental_dedup import (
        probe_and_grow_index,
    )

    store = str(tmp_path / "idx")
    matches = str(tmp_path / "m")
    docs = tables["documents"].select("doc_id", "text").limit(40)
    apply = probe_and_grow_index(store, matches)
    apply(docs, 0)          # first delivery: buckets land
    apply(docs, 0)          # replay of the SAME batch (offsets lost)
    got = spark.read.parquet(matches)
    self_matches = got.where("batch_doc = index_doc").count()
    assert self_matches == 0, f"{self_matches} self-matches emitted"


def test_csv_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    """read_csv_quarantine must not append _corrupt_record to the
    caller's StructType in place (StructType.add mutates)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from whatdropsnow_etl_spark.sources.files import read_csv_quarantine

    p = str(tmp_path / "x.csv")
    open(p, "w").write("a,b\n1,2\nbad,row,extra,cols,here\n")
    schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    good, bad = read_csv_quarantine(spark, p, schema, header=True)
    assert len(schema.fields) == 2  # caller's object untouched
    assert good.count() == 1 and bad.count() == 1
    # a second call with the same object must behave identically
    good2, _ = read_csv_quarantine(spark, p, schema, header=True)
    assert len(schema.fields) == 2 and good2.count() == 1


def test_streaming_ks_drift_equals_batch_operator(spark, tables, tmp_path):
    """The KS drift twin: folding per-batch value histograms (an
    exact monoid) and reporting over the final state must equal the
    batch ks_two_sample over the full static relation EXACTLY —
    shared post-histogram code path, so any drift would be a fold
    bug. Also pins state boundedness: the state row count never
    exceeds |groups| x |distinct values seen|."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import ks_two_sample
    from whatdropsnow_etl_spark.streaming import (
        fold_value_histogram,
        ks_drift_report,
    )

    docs = tables["documents"].select("doc_id", "source", "n_chars")
    src = str(tmp_path / "ks_docs")
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "ks_store")
    sizes = []

    def fold(batch_df, batch_id):
        prev = (
            batch_df.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = fold_value_histogram(prev, batch_df, "source", "n_chars")
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(batch_df.sparkSession.read.parquet(store).count())

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    q = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_ks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sizes) >= 3  # really ran as micro-batches

    state = spark.read.parquet(store)
    got = sorted(
        [tuple(r) for r in ks_drift_report(state, "source", "n_chars").collect()],
        key=repr,
    )
    want = sorted(
        [tuple(r) for r in ks_two_sample(docs, "source", "n_chars").collect()],
        key=repr,
    )
    assert got == want
    # state boundedness: <= |groups| x |distinct values|
    bound = (
        docs.select("source").distinct().count()
        * docs.select("n_chars").distinct().count()
    )
    assert max(sizes) <= bound


def test_streaming_fano_equals_batch_operator(spark, tables, tmp_path):
    """The burstiness twin: folding per-batch (type, hour) histograms
    (an exact monoid) and reporting over the final state must equal
    the batch fano_burstiness over the full static relation EXACTLY
    — shared post-histogram code path (fano_from_histogram), so any
    drift would be a fold bug. Also pins state boundedness: the
    state never exceeds |types| x |active hours|."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import fano_burstiness
    from whatdropsnow_etl_spark.streaming import (
        fano_report,
        fold_hour_histogram,
    )

    ev = tables["events"].select("event_id", "ts", "event_type")
    src = str(tmp_path / "fano_events")
    for part in range(3):
        ev.where(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "fano_store")
    sizes = []

    def fold(batch_df, batch_id):
        b = batch_df.withColumn("ts", F.col("ts").cast("timestamp"))
        prev = (
            b.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = fold_hour_histogram(prev, b)
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(b.sparkSession.read.parquet(store).count())

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", StringType()),
            StructField("event_type", StringType()),
        ]
    )
    q = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_fano"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sizes) >= 3  # really ran as micro-batches

    state = spark.read.parquet(store)
    got = sorted(
        [tuple(r) for r in fano_report(state).collect()], key=repr
    )
    want = sorted(
        [tuple(r) for r in fano_burstiness(ev).collect()], key=repr
    )
    assert got == want
    bound = (
        ev.select("event_type").distinct().count()
        * ev.select(F.date_trunc("hour", "ts")).distinct().count()
    )
    assert max(sizes) <= bound


def test_streaming_auc_equals_batch_operator(spark, tables, tmp_path):
    """The ranking-quality twin: folding per-batch (group, score)
    positive/negative histograms (an exact monoid) and reporting over
    the final state must equal the batch auc_exact over the full
    static relation EXACTLY — shared post-histogram code path
    (auc_from_histogram). State stays <= |distinct quantized
    scores|."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import auc_exact
    from whatdropsnow_etl_spark.streaming import (
        auc_report,
        fold_score_histogram,
    )

    ev = tables["events"].select(
        "event_id",
        F.col("value"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    )
    src = str(tmp_path / "auc_events")
    for part in range(3):
        ev.where(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "auc_store")
    sizes = []

    def fold(batch_df, batch_id):
        prev = (
            batch_df.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = fold_score_histogram(prev, batch_df, "value", "y")
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(batch_df.sparkSession.read.parquet(store).count())

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ev_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("value", DoubleType()),
            StructField("y", LongType()),
        ]
    )
    q = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_auc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sizes) >= 3

    state = spark.read.parquet(store)
    got = sorted([tuple(r) for r in auc_report(state).collect()], key=repr)
    want = sorted(
        [tuple(r) for r in auc_exact(ev, "value", "y").collect()], key=repr
    )
    assert got == want
    bound = ev.select(F.round(F.col("value") * 1000000, 0)).distinct().count()
    assert max(sizes) <= bound


def test_streaming_gini_equals_batch_operator(spark, tables, tmp_path):
    """The vocabulary-concentration twin: folding per-batch
    (source, term) counts (the exact monoid ONE level below the cf
    histogram, which is counts-of-counts and does not merge) and
    reporting over the final state must equal the batch token_gini
    over the full static corpus EXACTLY — shared post-count code
    path (gini_from_term_counts). State stays <= |per-source
    vocabulary|."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import token_gini
    from whatdropsnow_etl_spark.streaming import (
        fold_term_counts,
        gini_report,
    )

    docs = tables["documents"].select("doc_id", "source", "text")
    src = str(tmp_path / "gini_docs")
    for part in range(3):
        docs.where(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "gini_store")
    sizes = []

    def fold(batch_df, batch_id):
        prev = (
            batch_df.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = fold_term_counts(prev, batch_df)
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(batch_df.sparkSession.read.parquet(store).count())

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    q = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_gini"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sizes) >= 3

    state = spark.read.parquet(store)
    got = sorted([tuple(r) for r in gini_report(state).collect()], key=repr)
    want = sorted([tuple(r) for r in token_gini(docs).collect()], key=repr)
    assert got == want
    from whatdropsnow_etl_spark.functions.text import tokens as _toks

    vocab_bound = (
        docs.select("source", F.explode(_toks("text")).alias("t"))
        .where(F.col("t") != "")
        .distinct()
        .count()
    )
    assert max(sizes) <= vocab_bound


def test_streaming_calibration_equals_batch_operator(spark, tables, tmp_path):
    """The calibration twin: folding per-batch quantized-score
    histograms (an exact monoid at SCORE grain, so n_bins can change
    at report time without refolding) and reporting over the final
    state must equal the batch calibration_bins over the full static
    relation EXACTLY — same binning/gap/ECE arithmetic applied to
    score-grain aggregates."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import calibration_bins
    from whatdropsnow_etl_spark.streaming import (
        calibration_report,
        fold_calibration_histogram,
    )

    ev = tables["events"].select(
        "event_id",
        # a [0, 1]-ish score derived from value so several bins fill
        (F.col("value") / (F.col("value") + F.lit(100.0))).alias("score"),
        (F.col("event_type") == "purchase").cast("bigint").alias("y"),
    )
    src = str(tmp_path / "cal_events")
    for part in range(3):
        ev.where(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "cal_store")
    sizes = []

    def fold(batch_df, batch_id):
        prev = (
            batch_df.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = fold_calibration_histogram(prev, batch_df, "score", "y")
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(batch_df.sparkSession.read.parquet(store).count())

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ev_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("score", DoubleType()),
            StructField("y", LongType()),
        ]
    )
    q = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_cal"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sizes) >= 3

    state = spark.read.parquet(store)
    for n_bins in (10, 4):  # report-time re-binning without refold
        got = sorted(
            [tuple(r) for r in calibration_report(state, n_bins=n_bins).collect()],
            key=repr,
        )
        want = sorted(
            [
                tuple(r)
                for r in calibration_bins(ev, "score", "y", n_bins=n_bins).collect()
            ],
            key=repr,
        )
        assert got == want, n_bins
    bound = ev.select(F.round(F.col("score") * 1000000, 0)).distinct().count()
    assert max(sizes) <= bound


def test_streaming_vocab_jaccard_over_gini_state(spark, tables):
    """One persisted term-count state serves BOTH maintainers: the
    vocab_jaccard report over folded gini state equals the batch
    vocab_jaccard over the full corpus (keys are the distinct
    vocabulary; counts are ignored and the fold never drops a key)."""
    from whatdropsnow_etl_spark.operators import vocab_jaccard
    from whatdropsnow_etl_spark.streaming import (
        fold_term_counts,
        vocab_jaccard_report,
    )

    docs = tables["documents"].select("doc_id", "source", "text")
    state = None
    for part in range(3):
        state = fold_term_counts(
            state, docs.where(F.col("doc_id") % 3 == part)
        )
    got = sorted(
        [tuple(r) for r in vocab_jaccard_report(state).collect()], key=repr
    )
    want = sorted([tuple(r) for r in vocab_jaccard(docs).collect()], key=repr)
    assert got == want


def test_streaming_lifecycle_equals_batch_operator(spark, tables, tmp_path):
    """The growth-accounting twin: folding per-batch DISTINCT
    (user, day) activity (an exact monoid under union+distinct) and
    reporting over the final state must equal the batch
    user_lifecycle over the full static relation EXACTLY — shared
    post-activity code path. Replayed batches fold idempotently
    (at-least-once safety), and state stays <= |users x active
    days|."""
    import os
    import shutil

    from whatdropsnow_etl_spark.operators import user_lifecycle
    from whatdropsnow_etl_spark.streaming import (
        fold_activity,
        lifecycle_report,
    )

    ev = tables["events"].select("event_id", "ts", "user_id")
    src = str(tmp_path / "lc_events")
    for part in range(3):
        ev.where(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).json(src)
    store = str(tmp_path / "lc_store")
    sizes = []

    def fold(batch_df, batch_id):
        b = batch_df.withColumn("ts", F.col("ts").cast("timestamp"))
        prev = (
            b.sparkSession.read.parquet(store)
            if os.path.isdir(store)
            else None
        )
        state = fold_activity(prev, b)
        # replay the same batch: the distinct must absorb it
        state = fold_activity(state, b)
        state.write.mode("overwrite").format("parquet").save(store + "_next")
        if os.path.isdir(store):
            shutil.rmtree(store)
        os.rename(store + "_next", store)
        sizes.append(b.sparkSession.read.parquet(store).count())

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", StringType()),
            StructField("user_id", LongType()),
        ]
    )
    q = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt_lc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sizes) >= 3

    state = spark.read.parquet(store)
    got = sorted(
        [tuple(r) for r in lifecycle_report(state).collect()], key=repr
    )
    want = sorted(
        [tuple(r) for r in user_lifecycle(ev).collect()], key=repr
    )
    assert got == want
    bound = (
        ev.select("user_id").distinct().count()
        * ev.select(F.to_date("ts")).distinct().count()
    )
    assert max(sizes) <= bound


def test_streaming_webdataset_exactly_once(spark, tmp_path):
    """The streaming shard writer publishes one COMMITTED batch
    directory per distinct batch id: a redelivered batch is a no-op
    (at-least-once safety), a torn directory (shards written, no
    marker) is invisible to the reader and heals identically on
    redelivery (deterministic tar bytes), and the committed union
    round-trips every payload exactly once."""
    import json
    import os

    from whatdropsnow_etl_spark.operators import attach_media_payload
    from whatdropsnow_etl_spark.streaming import (
        StreamingWebDatasetSink,
        read_webdataset_stream_output,
    )

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    media = attach_media_payload(docs)
    out = str(tmp_path / "wds_stream")
    os.makedirs(out)
    sink = StreamingWebDatasetSink(out, n_shards=2)

    batches = [media.where(F.col("doc_id") % 3 == k) for k in range(3)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    # redelivery of batch 1: must not duplicate anything
    before = json.load(open(sink.batch_dir(1) + "/manifest.json"))
    sink(batches[1], 1)
    assert json.load(open(sink.batch_dir(1) + "/manifest.json")) == before
    # torn batch 2: shards land but the marker is missing
    from whatdropsnow_etl_spark.sinks import write_webdataset_shards

    write_webdataset_shards(batches[2], sink.batch_dir(2), n_shards=2)
    got = read_webdataset_stream_output(spark, out)
    assert got.where(F.col("batch_id") == 2).count() == 0  # invisible
    # redelivery heals the torn directory and commits it
    sink(batches[2], 2)
    rows = read_webdataset_stream_output(spark, out).collect()
    assert len(rows) == 30
    want = {
        r["doc_id"]: bytes(r["payload"]) for r in media.collect()
    }
    assert {r["doc_id"]: bytes(r["payload"]) for r in rows} == want
    assert {r["batch_id"] for r in rows} == {0, 1, 2}
