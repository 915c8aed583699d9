"""Pins for the r11 ADVICE fixes: floor-semantics seasonality cells
for pre-1970 epochs, the kcore_decompose rounds-exhausted error, and
the _cached_inputs release convention on the r10 persisting ops.

Each check runs against a hand-built case or an independent
pure-Python reference (never against its own oracle SQL — the driver
gate does that comparison separately).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_weekly_seasonality_pre_1970(spark):
    """Pre-1970 (negative-epoch) timestamps must land in the same
    UTC (dow, hour) cell Python's calendar assigns — truncating
    div/% would shift dow and emit negative hours there (ADVICE
    r10). Reference: datetime in UTC, isoweekday mapped to the
    0=Sunday convention."""
    from whatdropsnow_etl_spark.operators import weekly_seasonality

    stamps = [
        dt.datetime(1969, 12, 31, 23, 59, 59),  # Wednesday, hour 23
        dt.datetime(1969, 12, 31, 0, 0, 1),  # Wednesday, hour 0
        dt.datetime(1955, 3, 14, 6, 30, 0),  # Monday, hour 6
        dt.datetime(1969, 7, 20, 20, 17, 40),  # Sunday, hour 20
        dt.datetime(2024, 1, 1, 8, 0, 0),  # Monday, hour 8 (control)
    ]
    rows = [(i, "e", s) for i, s in enumerate(stamps)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {
        (r.dow, r.hour): r.n_events
        for r in weekly_seasonality(df).collect()
    }
    expect: dict = {}
    for s in stamps:
        # isoweekday: Mon=1..Sun=7 -> 0=Sunday convention
        cell = (s.isoweekday() % 7, s.hour)
        expect[cell] = expect.get(cell, 0) + 1
    assert got == expect
    assert all(0 <= d <= 6 and 0 <= h <= 23 for d, h in got)


def test_streaming_seasonality_pre_1970_equals_batch(spark):
    """The streaming fold shares epoch_day_cell, so pre-1970 rows
    fold into the identical cells batch assigns."""
    from whatdropsnow_etl_spark.operators import weekly_seasonality
    from whatdropsnow_etl_spark.streaming import (
        fold_seasonality_cells,
        seasonality_report,
    )

    rows = [
        (1, "a", dt.datetime(1962, 2, 20, 14, 47, 39)),
        (2, "a", dt.datetime(1969, 12, 31, 23, 0, 0)),
        (3, "b", dt.datetime(1970, 1, 1, 0, 0, 0)),
        (4, "b", dt.datetime(2023, 6, 1, 12, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    state = None
    for lo, hi in ((1, 2), (3, 4)):
        state = fold_seasonality_cells(
            state, df.where(F.col("event_id").between(lo, hi))
        )
    folded = sorted(
        [tuple(r) for r in seasonality_report(state).collect()], key=repr
    )
    full = sorted(
        [tuple(r) for r in weekly_seasonality(df).collect()], key=repr
    )
    assert folded == full


def test_kcore_decompose_rounds_exhausted_raises(spark):
    """max_rounds too small must fail loudly, not return a partial
    decomposition (ADVICE r10)."""
    import pytest

    from whatdropsnow_etl_spark.operators.graph import (
        KCoreRoundsExhausted,
        kcore_decompose,
    )

    # triangle + pendant: needs >= 3 rounds (peel pendant at k=1,
    # advance, peel triangle at k=2)
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "doc_a string, doc_b string",
    )
    with pytest.raises(KCoreRoundsExhausted, match="max_rounds=1"):
        kcore_decompose(pairs, max_rounds=1)
    # ample rounds still decompose fully
    got = {
        r.node: r.coreness for r in kcore_decompose(pairs).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1}


def test_cached_inputs_release_convention(spark):
    """The r10 persisting operators expose their pinned relations via
    _cached_inputs so long-lived sessions can release them (ADVICE
    r10): mmr_select_pass, nn_descent_recall_curve, and
    budget_curve_from_bins through token_budget_curve."""
    from whatdropsnow_etl_spark.operators import (
        mmr_select_pass,
        nn_descent_recall_curve,
        token_budget_curve,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    out = mmr_select_pass(vecs, vecs.limit(2), pool=3)
    assert hasattr(out, "_cached_inputs") and len(out._cached_inputs) == 1
    out.collect()
    for c in out._cached_inputs:
        c.unpersist()

    out = nn_descent_recall_curve(vecs, rounds=1, k=2)
    assert hasattr(out, "_cached_inputs") and len(out._cached_inputs) == 1
    out.collect()
    for c in out._cached_inputs:
        c.unpersist()

    docs = spark.createDataFrame(
        [(1, 0.2, 10), (2, 0.7, 20), (3, 0.9, 5)],
        "doc_id long, quality double, n_tokens long",
    )
    out = token_budget_curve(docs, score_col="quality", weight_col="n_tokens")
    assert hasattr(out, "_cached_inputs") and len(out._cached_inputs) == 1
    rows = out.collect()
    assert len(rows) > 0
    for c in out._cached_inputs:
        c.unpersist()
