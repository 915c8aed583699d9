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


# The 10 r11-new queries hold their slots in r12 (verdict r11 ask
# #9: their only green is one round old, and the r12 MinHash floor
# touched degree_assortativity's whole prefix).
R11_HELD_R12 = [
    "seasonal_anomalies", "event_xcorr", "survival_hazard",
    "kl_source_divergence", "kmv_set_ops", "l_diversity",
    "degree_assortativity", "cusum_changepoints",
    "mann_kendall_trend", "token_entropy",
]

# Oracle-bearing queries whose PLAN changed in the r12 optimization
# round: the sparse_cosine_join tile rewrite, the MinHash/shingle
# parallelism floor (dedup-graph family), the vector kernels' floor
# (ann/semantic/embedding/nn_descent), pagerank_update_pass's persist
# path, and the _cached_inputs release wrappers. Touched-operator
# re-gates outrank staleness per the standing contract.
TOUCHED_R12 = [
    "sparse_cosine_join", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_pipeline", "dup_weighting", "dup_rate_by_source",
    "lsh_tuning_report", "cluster_keep_best", "curation_funnel",
    "dedup_clusters", "dedup_clusters_twostars",
    "pagerank_update_pass", "kcore_peel_pass", "triangle_count",
    "neighborhood_jaccard", "dup_degree_report",
    "label_propagation_pass", "incremental_dedup",
    "containment_pairs", "ann_ivf_topk", "ann_pq_topk",
    "semantic_dedup", "embedding_dedup", "nn_descent_recall_curve",
]

# Daemon re-gate: the gc.freeze worker-daemon change (r12 O1) touches
# every Python-worker query; these are the oracle-bearing
# multimodal/media/ANN/editdist representatives whose walls the round
# re-measured (verdict r11 ask #9).
DAEMON_REGATE_R12 = [
    "multimodal_frame_sample", "multimodal_decode",
    "multimodal_resize", "media_probe", "media_animation_probe",
    "media_resize", "media_resample", "media_silence_report",
    "dedup_editdist", "dedup_editdist_incremental",
    "ann_cosine_topk", "ann_int8_topk", "ann_lsh_bucketed",
]

# Oldest-first refresh with the remaining slots; the rest of the
# promised r6 spill (benford_check, hybrid_search,
# active_learning_batch, chi2_features, nb_classify, heldout_ppl and
# the remaining r6 rows) leads the r13 rotation.
R6_REFRESH_R12 = [
    "percentile_rank", "user_event_sequences",
    "distribution_shift_report",
]


def test_gate_window_composition():
    """Derived (not hand-counted) r12 gate-window contract, in
    order: the 10 held r11-new oracle queries lead, the 24
    plan-changed r12 re-gates follow, then the 13 daemon-regate
    family representatives, and every remaining slot is an
    oracle-bearing oldest-r6 refresh — no rows-only slot anywhere
    this round. The block lengths are derived from the lists, never
    hand-counted (the r9 ADVICE docstring lesson)."""
    order = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    gated = order[:GATE_WINDOW]
    blocks = (
        R11_HELD_R12, TOUCHED_R12, DAEMON_REGATE_R12, R6_REFRESH_R12
    )
    pos = 0
    for block in blocks:
        assert gated[pos : pos + len(block)] == block
        pos += len(block)
    assert pos == GATE_WINDOW
    # every slot is oracle-bearing — no rows-only exposure this round
    wasted = [q for q in gated if q not in oracles]
    assert not wasted, f"rows-only queries in window: {wasted}"


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
