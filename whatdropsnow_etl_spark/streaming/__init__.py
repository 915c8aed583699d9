from .broadcast_refresh import RefreshingBroadcastDim, enrich_foreach_batch
from .dedup import dedup_stream
from .drift_gate import DriftGatedSink, profile_nulls
from .funnel import curation_funnel_stream
from .enrich import enrich_stream
from .intervals import streaming_interval_pairs
from .join import correlate_streams
from .quantiles import windowed_value_quantiles
from .sessions import sessionize_stream
from .sink import write_stream_parquet
from .topk import heavy_hitters, mg_merge
from .manifest_sink import ManifestMergeStreamSink, ManifestStreamSink
from .history import history_stream
from .editdist import load_doc_store, pair_and_grow_doc_store
from .auc import auc_report, fold_score_histogram
from .calibration import calibration_report, fold_calibration_histogram
from .webdataset import (
    StreamingWebDatasetSink,
    read_webdataset_stream_output,
)
from .fano import fano_report, fold_hour_histogram
from .interevent import (
    batch_gap_moments,
    fold_gap_moments,
    interevent_report,
)
from .gini import fold_term_counts, gini_report, vocab_jaccard_report
from .ks_drift import fold_value_histogram, ks_drift_report, overlap_report
from .budget import budget_report, fold_score_bins
from .anomaly import anomaly_report, fold_anomaly_buckets
from .survival import fold_user_bounds, survival_report
from .xcorr import fold_hourly_counts, xcorr_report
from .seasonality import fold_seasonality_cells, seasonality_report
from .lifecycle import fold_activity, lifecycle_report
from .line_dedup import clean_and_grow_line_index, load_line_index
from .paths import path_stream
from .attribution import attribution_stream
from .transitions import transition_stream
from .upsert import upsert_stream
from .windowed import windowed_event_agg

__all__ = [
    "DriftGatedSink",
    "profile_nulls",
    "windowed_event_agg",
    "curation_funnel_stream",
    "dedup_stream",
    "sessionize_stream",
    "write_stream_parquet",
    "upsert_stream",
    "streaming_interval_pairs",
    "enrich_stream",
    "windowed_value_quantiles",
    "RefreshingBroadcastDim",
    "enrich_foreach_batch",
    "correlate_streams",
    "mg_merge",
    "heavy_hitters",
    "history_stream",
    "clean_and_grow_line_index",
    "fano_report",
    "batch_gap_moments",
    "fold_gap_moments",
    "interevent_report",
    "auc_report",
    "fold_score_histogram",
    "gini_report",
    "fold_term_counts",
    "vocab_jaccard_report",
    "calibration_report",
    "fold_calibration_histogram",
    "StreamingWebDatasetSink",
    "read_webdataset_stream_output",
    "fold_hour_histogram",
    "fold_activity",
    "fold_value_histogram",
    "lifecycle_report",
    "ks_drift_report",
    "overlap_report",
    "fold_seasonality_cells",
    "seasonality_report",
    "fold_anomaly_buckets",
    "anomaly_report",
    "fold_user_bounds",
    "survival_report",
    "fold_hourly_counts",
    "xcorr_report",
    "fold_score_bins",
    "budget_report",
    "pair_and_grow_doc_store",
    "load_doc_store",
    "load_line_index",
    "path_stream",
    "attribution_stream",
    "transition_stream",
    "ManifestMergeStreamSink",
    "ManifestStreamSink",
]
