"""Tests for the sample-sort percentile rank, the recsys user-
history sequence builder, and the quarantining CSV loader.

Pin points:
- percentile_rank's sample-partitioned decomposition equals the
  naive single-window PERCENT_RANK exactly, including boundary ties
  and single-row groups;
- user_event_sequences keeps the last-N window but emits it oldest-
  first, deterministically under (ts, id) ties;
- read_csv_quarantine routes every raw line to exactly one side.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whatdropsnow_etl_spark.operators import (
    percentile_rank,
    user_event_sequences,
)


def test_percentile_rank_matches_naive_window(spark):
    # values with heavy boundary ties and a skewed distribution
    rows = [(i, f"s{i % 3}", float((i * 7) % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    got = {
        (r.doc_id): r.pct_rank
        for r in percentile_rank(
            df, "v", group_col="source", n_buckets=8, sample_k=64
        ).collect()
    }
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    naive = {
        r.doc_id: r.pr
        for r in df.select(
            "doc_id", F.percent_rank().over(w).alias("pr")
        ).collect()
    }
    assert got == naive  # bit-equal, not just close


def test_percentile_rank_global_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "doc_id long, v double"
    )
    # all-equal values: ranks fall back to the id tiebreak
    out = sorted(
        percentile_rank(df, "v", n_buckets=4, sample_k=8).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.pct_rank for r in out] == [0.0, 0.5, 1.0]
    # single row emits 0.0, not a division by zero
    one = percentile_rank(
        df.where("doc_id = 1"), "v", n_buckets=4, sample_k=8
    ).collect()
    assert [r.pct_rank for r in one] == [0.0]


def test_user_event_sequences_truncates_and_orders(spark):
    rows = [
        # user 1: 4 events, max_len=3 keeps the LAST 3, oldest first
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "c"),
        (4, 1, "2024-01-01 00:03:00", "d"),
        # user 2: ts tie broken by event_id
        (6, 2, "2024-01-01 00:00:00", "y"),
        (5, 2, "2024-01-01 00:00:00", "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.user_id: r for r in user_event_sequences(df, max_len=3).collect()}
    assert out[1].seq == "b c d" and out[1].n_events == 3
    assert out[2].seq == "x y" and out[2].n_events == 2


def test_read_csv_quarantine_splits(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,price\n"
        "1,10.5\n"
        "2,not_a_number\n"
        "3,7.25\n"
    )
    from whatdropsnow_etl_spark.sources.files import read_csv_quarantine

    good, bad = read_csv_quarantine(
        spark, str(p), "id bigint, price double"
    )
    g = {r.id: r.price for r in good.collect()}
    assert set(g) == {1, 3}
    assert math.isclose(g[3], 7.25)
    b = [r._corrupt_record for r in bad.collect()]
    assert b == ["2,not_a_number"]
