from .dedup import dedup_exact, ngram_jaccard_pairs
from .incremental import filter_out_recently_added
from .integrity import fk_integrity_report
from .pagination import paginate
from .search import ilike_search
from .similarity import ann_cosine_topk
from .textops import lang_id_confusion, quality_score, token_count
from .upsert import latest_wins
from .windows import moving_avg, sessionize, topn_per_group

__all__ = [
    "latest_wins",
    "filter_out_recently_added",
    "fk_integrity_report",
    "paginate",
    "ilike_search",
    "topn_per_group",
    "moving_avg",
    "sessionize",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "lang_id_confusion",
    "quality_score",
    "token_count",
]
