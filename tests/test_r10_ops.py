"""Pins for the r10 additions: full k-core coreness decomposition,
the MMR first-greedy-step twin, streaming interevent maintenance,
and the NN-descent recall curve.

Each operator is checked against a hand-built case or an independent
pure-Python reference (never against its own oracle SQL — the driver
gate does that comparison separately).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _py_coreness(edges):
    """Independent brute-force coreness: peel min-degree nodes."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    k = 0
    while adj:
        peel = [n for n, nb in adj.items() if len(nb) <= k]
        if not peel:
            k += 1
            continue
        for n in peel:
            core[n] = k
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
    return core


def test_kcore_decompose_hand_graph(spark):
    from whatdropsnow_etl_spark.operators import (
        kcore_decompose,
        kcore_peel_pass,
    )

    # K4 on 1-4 (coreness 3), pendant chain 1-5-6 (coreness 1),
    # triangle 7-8-9 (coreness 2), isolated edge 10-11 (coreness 1);
    # duplicates and a self-loop exercise canonicalization.
    raw = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (1, 5), (5, 6),
        (7, 8), (8, 9), (7, 9),
        (10, 11), (11, 10), (2, 2),
    ]
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
    got = {r.node: r.coreness for r in kcore_decompose(pairs).collect()}
    want = _py_coreness(raw)
    assert got == want
    assert got == {
        1: 3, 2: 3, 3: 3, 4: 3, 5: 1, 6: 1, 7: 2, 8: 2, 9: 2,
        10: 1, 11: 1,
    }
    # consistency with the single-pass oracle twin: iterating
    # kcore_peel_pass at k=2 to fixpoint keeps exactly the nodes
    # whose coreness is >= 2
    state = pairs
    for _ in range(4):
        keep = kcore_peel_pass(state, k=2).select("node")
        state = (
            state.join(
                keep.withColumnRenamed("node", "doc_a"), "doc_a", "left_semi"
            ).join(
                keep.withColumnRenamed("node", "doc_b"), "doc_b", "left_semi"
            )
        )
    surv = {
        r.node
        for r in state.select(
            F.explode(F.array("doc_a", "doc_b")).alias("node")
        )
        .distinct()
        .collect()
    }
    assert surv == {n for n, c in want.items() if c >= 2}


def test_kcore_decompose_empty_and_selfloops(spark):
    from whatdropsnow_etl_spark.operators import kcore_decompose

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert kcore_decompose(empty).count() == 0
    only_self = spark.createDataFrame(
        [(1, 1), (2, 2)], "doc_a long, doc_b long"
    )
    assert kcore_decompose(only_self).count() == 0
