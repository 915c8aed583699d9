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
