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


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles as an array<string>.

    transform over sequence(0, size-k) keeps this fully JVM-side;
    at 100 TB the caller explodes these and immediately hashes to
    64-bit (never carrying the shingle string through a shuffle).
    """
    joined = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    # guard: sequence(0, negative) would count *down*; short docs
    # have no k-shingles
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= k, F.array_distinct(joined)).otherwise(empty)


def stop_count(toks: Column, stopwords: Sequence[str]) -> Column:
    """Number of tokens that are in `stopwords` (with multiplicity)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def bpe_ish_count(text: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), F.lit(0)))
