"""Pure Column-expression text primitives (JVM-side, codegen'd).

No Python UDFs: tokenization, shingling, and counting are Spark SQL
higher-order functions, so they run inside whole-stage codegen and
scale linearly with executors. Every primitive has an exact ANSI-SQL
twin (see __spark_entry__.oracle_sql) for the DuckDB gate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately simple and dialect-portable: literal single-space
# split (the corpus is single-space separated), no regex classes
# that differ between Java regex and RE2.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def shingles(toks: Column, k: int = 3, distinct: bool = True) -> Column:
    """k-gram word shingles as an array<string> (distinct by
    default; pass distinct=False for positional shingles, e.g.
    winnowing, where window offsets must line up with text order).

    Built by zipping k shifted slices of the token array. Higher-
    order-function lambdas are *interpreted* (no codegen), so the
    lambda bodies here touch only their element variables — an
    earlier formulation indexing ``element_at(toks, i+j)`` inside
    the lambda re-evaluated the tokenizer per shingle position
    (~100× slower per doc). The k slices evaluate ``toks`` k times
    total, once per shift.

    At 100 TB the caller explodes these and immediately hashes to
    64-bit (never carrying the shingle string through a shuffle).
    """
    n_shingles = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    shifted = [F.slice(toks, j + 1, n_shingles) for j in range(k)]
    sh = shifted[0]
    for part in shifted[1:]:
        sh = F.zip_with(sh, part, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(sh) if distinct else sh


def stop_count(toks: Column, stopwords: Sequence[str]) -> Column:
    """Number of tokens that are in `stopwords` (with multiplicity)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def bpe_ish_count(text: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), F.lit(0)))
