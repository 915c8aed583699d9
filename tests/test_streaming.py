"""Structured Streaming windowed aggregation == its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
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
