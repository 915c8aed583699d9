"""Streaming vocabulary-concentration maintenance: fold batch term
counts, ask the exact per-source token Gini per trigger.

The sketch-maintenance pattern (streaming/fano.py, auc.py) applied
to corpus health: the (group, term, count) TERM-FREQUENCY relation
is the exact MONOID under union + groupBy-sum (the cf HISTOGRAM is
counts-of-counts and does not merge — folding must happen one level
below the statistic), so a foreachBatch sink folds each micro-batch's
compacted term counts into a persisted state relation and the
per-trigger report is
:func:`~whatdropsnow_etl_spark.operators.corpus.gini_from_term_counts`
over the folded state: the SAME code path the batch operator runs,
so union-over-batches == full relation EXACTLY (pytest-pinned, the
streaming-twin contract). The live "did this crawl source collapse
into one template" alarm next to fano's burstiness gauge.

At 100 TB the state is the per-source vocabulary with counts —
the corpus_vocab relation a pipeline usually persists anyway; each
fold is one explode + map-combined aggregate plus a state-sized
shuffle, and the report's windows run over the cf histogram derived
from state (O(sqrt(n)) rows per group), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.corpus import gini_from_term_counts


def fold_term_counts(
    prev: DataFrame | None,
    batch: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Fold one micro-batch into the persisted (__g, __t, __cf) term
    count state. ``prev`` is None on the first batch. NULL groups and
    empty tokens are excluded (the batch operator's contract)."""
    h = (
        batch.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .where(F.col("__g").isNotNull() & (F.col("__t") != ""))
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cf"))
    )
    if prev is None:
        return h
    return (
        prev.unionByName(h)
        .groupBy("__g", "__t")
        .agg(F.sum("__cf").cast("bigint").alias("__cf"))
    )


def gini_report(state: DataFrame, group_col: str = "source") -> DataFrame:
    """Exact per-group token Gini over the folded term-count state —
    delegates to the batch operator's post-count half."""
    return gini_from_term_counts(state, group_col=group_col)


def vocab_jaccard_report(state: DataFrame) -> DataFrame:
    """Pairwise source vocabulary Jaccard over the SAME folded
    term-count state gini maintains (r9): the state's (__g, __t)
    keys ARE the distinct per-source vocabulary, so one persisted
    relation serves both the concentration gauge (gini_report) and
    the cross-source composition screen — exactly equal to the batch
    :func:`~whatdropsnow_etl_spark.operators.corpus.vocab_jaccard`
    over the full corpus (pytest-pinned; counts are ignored, only
    key membership matters, and the fold never drops a key)."""
    from pyspark.sql import functions as F

    from ..operators.corpus import vocab_jaccard

    # re-use the batch operator verbatim by presenting the state's
    # keys as one-token "documents" — tokens() of a single token is
    # itself, so the operator's explode+distinct is the identity here
    docs = state.select(
        F.col("__g").alias("source"), F.col("__t").alias("text")
    )
    return vocab_jaccard(docs)
