"""The loader must normalize ANY physical timestamp encoding to one
canonical Spark type (TIMESTAMP, session pinned UTC) with identical
values. Rounds 1 and 2 were each wiped out by a silent change in the
testdata's encoding (ns-int64 -> naive µs); this pins all three
flavors through the same `load_table` path so the next flip is a
test failure, not a driver wipeout.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from whatdropsnow_etl_spark.functions.timeutil import ts_micros
from whatdropsnow_etl_spark.sources import load_table

# one row per encoding quirk: on-the-µs, sub-µs nanos (ns flavor only),
# pre-epoch, far future
BASE_NS = [
    1_700_000_000_000_000_000,
    1_700_000_000_123_456_789,
    -123_456_789_012_345_000,
    4_102_444_800_000_000_000,
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(ts_array)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "flavor,arrow_type",
    [
        ("ntz_us", pa.timestamp("us")),
        ("utc_us", pa.timestamp("us", tz="UTC")),
        ("ns_int64", pa.timestamp("ns")),
        ("date32", pa.date32()),
    ],
)
def test_loader_canonicalizes_all_encodings(spark, tmp_path, flavor, arrow_type):
    d = tmp_path / flavor
    d.mkdir()
    # µs flavors can't carry sub-µs nanos (and DATE only whole days);
    # pre-truncate so the arrow cast is lossless (expected values
    # below re-derive from the same truncation)
    day_us = 86_400_000_000
    if arrow_type == pa.timestamp("ns"):
        vals = BASE_NS
    elif arrow_type == pa.date32():
        vals = [v // 1000 // day_us * day_us * 1000 for v in BASE_NS]
    else:
        vals = [v // 1000 * 1000 for v in BASE_NS]
    ns = pa.array(vals, pa.int64())
    _write_events(str(d / "events.parquet"), ns.cast(pa.timestamp("ns")).cast(arrow_type))

    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", flavor

    got = {
        r["event_id"]: r["us"]
        for r in df.select("event_id", ts_micros("ts").alias("us")).collect()
    }
    for i, raw_ns in enumerate(vals):
        want_us = raw_ns // 1000
        assert got[i] == want_us, (flavor, i, got[i], want_us)


def test_all_flavors_agree_pairwise(spark, tmp_path):
    """The three flavors of the SAME instants produce identical
    canonical collect() output — the strongest invariant: no flavor
    can drift without tripping this."""
    outs = {}
    ns = pa.array([v for v in BASE_NS if v % 1000 == 0], pa.int64())
    for flavor, t in [
        ("ntz_us", pa.timestamp("us")),
        ("utc_us", pa.timestamp("us", tz="UTC")),
        ("ns_int64", pa.timestamp("ns")),
    ]:
        d = tmp_path / flavor
        d.mkdir()
        _write_events(str(d / "events.parquet"), ns.cast(pa.timestamp("ns")).cast(t))
        df = load_table(spark, str(d), "events")
        outs[flavor] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
    assert outs["ntz_us"] == outs["utc_us"] == outs["ns_int64"]
    # and the values are real datetimes, not epoch ints
    assert isinstance(outs["ntz_us"][0][1], datetime.datetime)
