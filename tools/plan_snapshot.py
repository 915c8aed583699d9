"""Snapshot .explain("formatted") output per query into plans/<tag>/.

Usage: python tools/plan_snapshot.py <tag> <suffix> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (default: a
built-in heavy-query list). Planning only — nothing executes.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from whatdropsnow_etl_spark.session import get_spark

HEAVY = [
    "multimodal_frame_sample",
    "bpe_encode",
    "ann_opq_trained",
    "dedup_clusters",
    "dedup_clusters_twostars",
    "leakage_safe_split",
    "cluster_keep_best",
    "dup_weighting",
    "dedup_pipeline",
    "dedup_ngram_jaccard",
    "quality_lr",
    "rfm_segments_scaled",
    "degree_assortativity",
    "neighborhood_jaccard",
    "triangle_count",
    "pair_pagerank",
    "kcore_decomposition",
    "kcore_peel_pass",
    "label_propagation_pass",
    "pagerank_update_pass",
    "nn_descent_recall_curve",
    "mmr_select_pass",
    "rank_correlation",
    "mann_kendall_trend",
    "sparse_cosine_join",
    "semantic_dedup_trained",
    "dedup_editdist",
    "dedup_editdist_incremental",
    "lsh_tuning_report",
    "heldout_perplexity",
    "kmv_set_ops",
    "kl_source_divergence",
    "event_xcorr",
    "containment_pairs",
    "quantile_bucketize",
    "bpe_fertility",
    "dup_rate_by_source",
    "dup_degree_report",
    "curation_funnel",
    "training_order_spine",
    "semantic_dedup",
    "embedding_dedup",
    "ann_ivf_trained",
    "media_animation_probe",
    "mnn_pairs",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    outdir = os.path.join("plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-snapshot")
    registry = entrymod.queries()
    for name in names:
        if name not in registry:
            print(f"skip unknown {name}")
            continue
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
