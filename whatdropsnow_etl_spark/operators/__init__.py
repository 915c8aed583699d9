from .asof import asof_join
from .cdc import cdc_apply, scd2_history
from .events import (
    dup_rate_by_source,
    event_funnel,
    numeric_outliers,
    retention_cohorts,
)
from .corpus import bigram_surprisal, decontaminate_ngrams, heldout_perplexity
from .sampling import (
    fixed_size_sample,
    leakage_safe_split,
    source_mix_sample,
    stratified_sample_by_quality,
)
from .dedup import (
    cluster_keep_best,
    containment_pairs,
    dedup_clusters,
    dedup_exact,
    editdist_pairs,
    incremental_dedup_minhash,
    minhash_band_index,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
    span_dedup,
)
from .intervals import interval_overlap_count
from .kmeans import train_kmeans_codebook
from .quantiles import exact_group_quantiles
from .sketches import (
    cms_estimate_counts,
    cms_registers,
    hll_count_distinct,
    hll_estimate_from_registers,
    hll_registers,
)
from .incremental import filter_out_recently_added
from .integrity import fk_integrity_report
from .multimodal import (
    attach_binary_payload,
    extract_features,
    multimodal_features,
    resize_images,
    sample_frames,
)
from .pagination import paginate
from .search import ilike_search
from .skew import salted_groupby_sum, salted_join
from .featurize import hashed_features
from .similarity import (
    ann_cosine_topk,
    ann_int8_topk,
    ann_ivf_topk,
    ann_lsh_bucketed,
    ann_pq_topk,
    embedding_dedup_pairs,
    pq_codebook,
    pq_encode,
    pq_train_codebook,
    quantize_embeddings,
    semantic_dedup,
)
from .textops import (
    chunk_documents,
    pack_chunks,
    corpus_vocab,
    doc_fingerprint,
    gopher_rules,
    lang_id_confusion,
    length_histogram,
    quality_score,
    redact_pii,
    repetition_stats,
    token_count,
    tokenize_to_ids,
)
from .upsert import latest_wins
from .windows import moving_avg, sessionize, topn_per_group

__all__ = [
    "ann_cosine_topk",
    "ann_int8_topk",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "ann_pq_topk",
    "asof_join",
    "attach_binary_payload",
    "bigram_surprisal",
    "cdc_apply",
    "chunk_documents",
    "cluster_keep_best",
    "cms_estimate_counts",
    "cms_registers",
    "containment_pairs",
    "corpus_vocab",
    "decontaminate_ngrams",
    "dedup_clusters",
    "dedup_exact",
    "doc_fingerprint",
    "dup_rate_by_source",
    "editdist_pairs",
    "embedding_dedup_pairs",
    "event_funnel",
    "exact_group_quantiles",
    "extract_features",
    "filter_out_recently_added",
    "fixed_size_sample",
    "fk_integrity_report",
    "gopher_rules",
    "hashed_features",
    "heldout_perplexity",
    "hll_count_distinct",
    "hll_estimate_from_registers",
    "hll_registers",
    "ilike_search",
    "incremental_dedup_minhash",
    "interval_overlap_count",
    "lang_id_confusion",
    "latest_wins",
    "leakage_safe_split",
    "length_histogram",
    "minhash_band_index",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "moving_avg",
    "multimodal_features",
    "ngram_jaccard_pairs",
    "numeric_outliers",
    "pack_chunks",
    "paginate",
    "pq_codebook",
    "pq_encode",
    "pq_train_codebook",
    "quality_score",
    "quantize_embeddings",
    "redact_pii",
    "repetition_stats",
    "resize_images",
    "retention_cohorts",
    "salted_groupby_sum",
    "salted_join",
    "sample_frames",
    "scd2_history",
    "semantic_dedup",
    "sessionize",
    "simhash_fingerprints",
    "simhash_pairs",
    "source_mix_sample",
    "span_dedup",
    "stratified_sample_by_quality",
    "token_count",
    "tokenize_to_ids",
    "topn_per_group",
    "train_kmeans_codebook",
]
