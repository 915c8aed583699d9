from .money import dec, exact_avg, exact_sum, money, rate
from .segments import price_segment
from .text import bpe_ish_count, shingles, stop_count, tokens
from .vectors import cosine_sim, dot, norm, to_double_array

__all__ = [
    "dec",
    "money",
    "rate",
    "exact_sum",
    "exact_avg",
    "price_segment",
    "tokens",
    "shingles",
    "stop_count",
    "bpe_ish_count",
    "to_double_array",
    "dot",
    "norm",
    "cosine_sim",
]
