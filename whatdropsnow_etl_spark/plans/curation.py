"""End-to-end training-data curation funnel.

The composition story: a switching user chains this engine's
operators the way the reference chains its ETL steps — here the
canonical LLM-corpus pipeline (quality gate → language gate → exact
dedup → near-dedup) as ONE declarative plan. Each stage reuses the
exact operator the standalone query exposes, so the funnel's
numbers reconcile with the per-operator queries, and the whole
chain stays in Catalyst (one logical plan; no intermediate
materialization or driver round-trips between stages).

Scale: the stages only narrow — each later, costlier stage (the
quadratic-candidate near-dedup last) sees fewer docs. The shuffles
are per-stage group-bys on content hashes; nothing global."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import ngram_jaccard_pairs
from ..operators.textops import lang_id, quality_expr


def curation_funnel(
    docs: DataFrame,
    quality_min: float = 0.75,
    lang: str = "de",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Stage-by-stage survivor counts of the curation pipeline.

    Stages: all docs → quality ≥ ``quality_min`` → predicted
    language == ``lang`` → exact dedup (keep lowest doc_id per
    normalized-text hash) → greedy near-dedup (drop the higher id of
    every shingle-Jaccard ≥ ``threshold`` pair; clusters-based
    keeping is dedup_clusters' job).
    Output: (stage, n_docs), one row per stage, funnel-ordered.
    """
    # Single-pass funnel: instead of one count branch per stage
    # (which re-evaluates every upstream stage — 1+2+3+4+5 pipeline
    # passes), derive per-doc survival FLAGS once and take all five
    # counts from one aggregate (stack → rows). The only extra pass
    # left is the near-dup pair subplan, which must see the stage-3
    # survivor set. Cut the 5-branch formulation's 13.8 s to ~a
    # third at sf0.1; at scale it's the difference between one scan
    # and five.
    # quality as an inline column expr — same projection pass as
    # lang_id, no join against the quality_score relation
    flags = (
        lang_id(docs)
        .withColumn("f1", quality_expr() >= quality_min)
        .withColumn("f2", F.col("f1") & (F.col("pred_lang") == lang))
        .withColumn("__gid", F.md5(F.lower(F.trim(F.col("text")))))
    )
    w = Window.partitionBy("f2", "__gid").orderBy("doc_id")
    flags = flags.withColumn(
        "f3", F.col("f2") & (F.row_number().over(w) == 1)
    )
    s3 = flags.where(F.col("f3")).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(
        s3, k=k, threshold=threshold, hash_shingles=True
    )
    dropped = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    flags = flags.join(dropped, "doc_id", "left").withColumn(
        "f4", F.col("f3") & F.col("__dropped").isNull()
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("c0"),
        *[
            F.sum(F.col(f).cast("bigint")).alias(f.replace("f", "c"))
            for f in ("f1", "f2", "f3", "f4")
        ],
    )
    out = agg.selectExpr(
        "stack(5, '1_all', c0, '2_quality', c1, '3_lang', c2,"
        " '4_exact_dedup', c3, '5_near_dedup', c4) AS (stage, n_docs)"
    ).orderBy("stage")
    # propagate the pair subplan's persisted inputs (ADVICE r11)
    out._cached_inputs = list(getattr(pairs, "_cached_inputs", []))
    return out


def pretraining_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The end-to-end pre-training mix pipeline as ONE lazy plan:
    Gopher rule filter → exact dedup (min-id keeper per content
    hash) → temperature-rebalanced language mixing — the
    filter/dedup/mix spine every pre-training corpus goes through,
    composed from this repo's operators so Catalyst sees a single
    query (filters push into the scan; the only shuffles are the
    dedup hash window and nothing else — mixing is a broadcast
    predicate).

    Rates are computed over the FILTERED-AND-DEDUPED corpus (the
    mix you actually train on), not the raw one — rebalancing
    before dedup would over-weight the most duplicated languages.
    Emits (doc_id, keep_rate, lang), the surviving epoch membership.
    """
    from ..operators.sampling import source_temperature_sample
    from ..operators.textops import gopher_rules

    kept = gopher_rules(
        docs, text_col=text_col, id_col=id_col, extra_cols=(text_col, lang_col)
    ).where(F.col("passes") == 1)
    w = Window.partitionBy(
        F.md5(F.lower(F.trim(F.col(text_col))))
    ).orderBy(F.col(id_col))
    dedup = (
        kept.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, lang_col)
    )
    return source_temperature_sample(
        dedup, alpha=alpha, source_col=lang_col, id_col=id_col
    )


def dedup_pipeline(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_iter: int = 15,
    ratios: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full near-dup decision pipeline over ONE clustering pass:
    two-stars connected components feed keeper selection
    (:func:`~.operators.dedup.cluster_keep_best`), the leakage-safe
    train/val/test split (:func:`~.operators.sampling.
    leakage_safe_split`) and the soft 1/|cluster| weights
    (:func:`~.operators.dedup.dup_weighting`) — every downstream
    consumer takes the (doc_id, component_id) relation via its
    ``components=`` pass-through, so the expensive half (exact
    Jaccard pairs + O(log n) contraction rounds) is paid exactly
    once. Run standalone, each of the three queries re-derives the
    same pair relation; composed, the bench saves ~3 clusterings.

    The two-stars rounds run eagerly at composition time
    (localCheckpoint per round — the standard iterative-graph
    trade); this plan is the ONE registry query carrying that
    allowance by design, so pipelines inherit it here instead of
    paying it per-consumer.

    Emits one row per doc: (doc_id, component_id, cluster_size,
    weight, keeper_doc_id, kept, split).
    """
    from ..operators.dedup import (
        cluster_keep_best,
        dedup_clusters,
        dup_weighting,
    )
    from ..operators.sampling import leakage_safe_split

    comp = dedup_clusters(
        docs,
        text_col=text_col,
        id_col=id_col,
        k=k,
        threshold=threshold,
        max_iter=max_iter,
    )
    weights = dup_weighting(
        docs, text_col=text_col, id_col=id_col, components=comp
    )
    keepers = cluster_keep_best(
        docs, text_col=text_col, id_col=id_col, components=comp
    ).select("doc_id", "keeper_doc_id", "kept")
    split = leakage_safe_split(
        docs,
        ratios=ratios,
        components=comp,
        text_col=text_col,
        id_col=id_col,
    ).select("doc_id", "split")
    return weights.join(keepers, "doc_id").join(split, "doc_id").select(
        "doc_id",
        "component_id",
        "cluster_size",
        "weight",
        "keeper_doc_id",
        "kept",
        "split",
    )


def training_order_spine(
    docs: DataFrame,
    alpha: float = 0.5,
    chunk_tokens: int = 64,
    overlap: int = 8,
    budget_tokens: int = 256,
    n_groups: int = 16,
    n_shards: int = 8,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Corpus → deterministic training order, as ONE composed plan:
    :func:`pretraining_mix` (filter → exact dedup → temperature mix)
    picks the epoch membership, survivors chunk
    (:func:`~.operators.textops.chunk_documents`) and pack
    (:func:`~.operators.textops.pack_chunks`) into budget-sized
    training sequences, packs land in token-balanced shards
    (:func:`~.operators.sampling.balanced_shards` — no straggler
    data-loader workers), and the intra-shard read order is the
    seed-keyed epoch permutation (the
    :func:`~.operators.ordering.epoch_shuffle` hash-order machinery
    over the BALANCED shard, via the same prefix-bucket histogram
    rank — no per-shard single-task sort).

    Every stage composes downstream of the previous one — no stage
    re-derives an upstream relation (the dedup_pipeline contract;
    n_chunks is deliberately not emitted so the pack aggregate is
    referenced exactly once). The whole spine is lazy: shuffles are
    the mix dedup window, the pack group, the pack aggregate and the
    two histogram ranks; everything else is map-side.

    A training reader consumes this as: for epoch e, re-run with
    ``seed=e``; read shard s in pos order; resume mid-epoch at
    (shard, pos). Emits (pack_id, pack_tokens, shard, pos).
    """
    from ..operators.ordering import _bucketed_rank
    from ..operators.sampling import balanced_shards
    from ..operators.textops import chunk_documents, pack_chunks

    mix = pretraining_mix(
        docs, alpha=alpha, text_col=text_col, id_col=id_col,
        lang_col=lang_col,
    )
    survivors = docs.join(mix.select(id_col), id_col, "left_semi")
    chunks = chunk_documents(
        survivors, chunk_tokens=chunk_tokens, overlap=overlap,
        id_col=id_col, text_col=text_col,
    )
    packed = pack_chunks(
        chunks, budget_tokens=budget_tokens, n_groups=n_groups,
        doc_col=id_col,
    )
    packs = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").cast("bigint").alias("pack_tokens")
    )
    sharded = balanced_shards(
        packs, n_shards=n_shards, weight_col="pack_tokens",
        id_col="pack_id",
    )
    keyed = sharded.select(
        "pack_id",
        F.col("weight").alias("pack_tokens"),
        "shard",
        F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col("pack_id"))
        ).alias("__key"),
    )
    ranked = _bucketed_rank(keyed, ["shard"], "__key", "pack_id")
    return ranked.select(
        "pack_id",
        "pack_tokens",
        "shard",
        F.col("__rank").cast("bigint").alias("pos"),
    )
