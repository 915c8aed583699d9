from .asof import asof_join
from .cdc import cdc_apply, scd2_history
from .events import (
    dup_rate_by_source,
    event_funnel,
    numeric_outliers,
    retention_cohorts,
)
from .corpus import bigram_surprisal, decontaminate_ngrams
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
    "asof_join",
    "cdc_apply",
    "scd2_history",
    "event_funnel",
    "retention_cohorts",
    "numeric_outliers",
    "dup_rate_by_source",
    "length_histogram",
    "bigram_surprisal",
    "decontaminate_ngrams",
    "stratified_sample_by_quality",
    "redact_pii",
    "latest_wins",
    "filter_out_recently_added",
    "fk_integrity_report",
    "paginate",
    "ilike_search",
    "salted_groupby_sum",
    "salted_join",
    "topn_per_group",
    "moving_avg",
    "sessionize",
    "dedup_clusters",
    "dedup_exact",
    "editdist_pairs",
    "interval_overlap_count",
    "train_kmeans_codebook",
    "exact_group_quantiles",
    "hll_count_distinct",
    "hll_registers",
    "hll_estimate_from_registers",
    "cms_registers",
    "cms_estimate_counts",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "embedding_dedup_pairs",
    "doc_fingerprint",
    "attach_binary_payload",
    "extract_features",
    "multimodal_features",
    "resize_images",
    "sample_frames",
    "lang_id_confusion",
    "quality_score",
    "token_count",
    "minhash_band_index",
    "incremental_dedup_minhash",
    "repetition_stats",
    "corpus_vocab",
    "chunk_documents",
    "source_mix_sample",
    "pack_chunks",
    "tokenize_to_ids",
    "gopher_rules",
    "containment_pairs",
    "cluster_keep_best",
    "ann_int8_topk",
    "quantize_embeddings",
    "fixed_size_sample",
    "span_dedup",
    "ann_pq_topk",
    "pq_codebook",
    "pq_encode",
    "leakage_safe_split",
    "pq_train_codebook",
]
