"""Text analysis operators: language-ID, quality scoring, token
counting. All pure Column expressions (whole-stage codegen; no
Python in the hot path) — they run as a single narrow projection
over the corpus scan, no shuffle except final aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_count, shingles, stop_count, tokens

# Marker vocabularies for the n-gram/stopword language heuristic.
# The synthetic corpus shares one vocabulary across its `lang`
# labels, so these act as deterministic pseudo-language markers; on
# real corpora swap in genuine per-language stopword lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("table", "row", "column"),
    "fr": ("join", "merge", "group"),
    "es": ("scan", "sort", "filter"),
    "zh": ("spark", "stream", "batch"),
}

STOPWORDS = ("the", "a", "of", "and", "to")


def _pred_lang(scores: dict[str, Column]) -> Column:
    """argmax over language scores, ties broken by declaration order
    of LANG_MARKERS: CASE chain 'first lang whose score >= all later
    langs' — mirrored verbatim in the SQL oracle."""
    langs = list(scores)
    expr = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc predicted language by marker-token counts."""
    toks = tokens(F.col(text_col))
    scores = {lang: stop_count(toks, words) for lang, words in LANG_MARKERS.items()}
    return df.withColumn("pred_lang", _pred_lang(scores))


def lang_id_confusion(
    df: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> DataFrame:
    """Confusion counts: actual label × predicted language."""
    return (
        lang_id(df, text_col)
        .groupBy(F.col(label_col).alias("lang"), "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def quality_expr(text_col: str = "text") -> Column:
    """The composite quality score as a single Column expression —
    reusable anywhere a per-doc quality gate is needed (batch funnel,
    streaming funnel) without a join against quality_score output."""
    text = F.lower(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_chars = F.length(text).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_stop = stop_count(toks, STOPWORDS).cast("bigint")
    n_punct = F.length(F.regexp_replace(text, "[a-z0-9 ]", "")).cast("bigint")
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    mean_word_len = tok_len_sum.cast("double") / n_tokens
    return F.round(
        0.3 * (1.0 - stop_ratio)
        + 0.4 * F.least(mean_word_len / 10.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio),
        6,
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite doc quality: length, punctuation ratio, stopword
    ratio, mean word length. Ratios are double divisions of exact
    integer counts — deterministic across engines."""
    text = F.lower(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_chars = F.length(text).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_stop = stop_count(toks, STOPWORDS).cast("bigint")
    n_punct = F.length(F.regexp_replace(text, "[a-z0-9 ]", "")).cast("bigint")
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    mean_word_len = tok_len_sum.cast("double") / n_tokens
    quality = quality_expr(text_col)
    # empty/NULL text has undefined ratios (x/0): Spark yields NULL
    # where DuckDB IEEE division yields NaN/inf — the twins would
    # diverge, and every quality consumer (calibration, stratified
    # bands) mishandles the undefined score; the report covers
    # SCOREABLE docs by contract
    return df.where(F.length(text) > 0).select(
        F.col(id_col),
        n_chars.alias("n_chars_txt"),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        quality.alias("quality"),
    )


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace and BPE-ish token counts per doc."""
    toks = tokens(F.col(text_col))
    n_ws = F.size(toks).cast("bigint")
    n_bpe = bpe_ish_count(F.col(text_col)).cast("bigint")
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length(F.col(text_col)).cast("double") / n_ws).alias("chars_per_token"),
    )


def doc_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken).

    Positional k-gram shingles are md5-hashed; each length-`window`
    sliding window contributes its minimum hash; the doc fingerprint
    is the distinct set of those minima (summarized as a count plus
    an md5 digest of the sorted set, so output stays one row/doc).
    Winnowing guarantees any shared substring of length
    >= k + window - 1 tokens yields a shared fingerprint hash —
    the standard local-fingerprint guarantee for plagiarism /
    near-dup detection.

    Plan: explode → window-min over (doc_id ORDER BY pos) → distinct
    → groupBy(doc_id). Both window and groupBy shuffle on doc_id, so
    AQE reuses one exchange. No Python in the pipeline.
    """
    from pyspark.sql.window import Window

    sh = shingles(tokens(F.col(text_col)), k, distinct=False)
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sh).alias("pos", "shingle"),
    ).select("doc_id", "pos", F.md5("shingle").alias("h"))
    w_min = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    w_all = Window.partitionBy("doc_id")
    marked = pos.select(
        "doc_id",
        "pos",
        F.min("h").over(w_min).alias("mh"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    sel = (
        marked.where(F.col("pos") <= F.col("__n") - window)
        .select("doc_id", "mh")
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("mh")))).alias(
            "fp_digest"
        ),
    )


# Redaction patterns: applied IN ORDER (emails first, so an email's
# digit runs are never double-counted as phones); each count is taken
# on the text as redacted so far. RE2-and-Java-portable regexes only
# (no lookaround), so the DuckDB twin behaves identically.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phones", r"\+?[0-9][0-9 \-]{6,}[0-9]", "<PHONE>"),
    ("ips", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails / phone-ish numbers / IPv4s from a text column.

    Pure Column pipeline (regexp_count + regexp_replace, sequential
    per class) — no shuffle, whole-stage codegen, linear scan at any
    scale. Output: id, per-class counts, redacted text.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select(F.col(id_col), *counts, cur.alias("text_redacted"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k distinctive terms per document — TF-IDF's ranking
    without its floats: order by (tf DESC, df ASC, term ASC), which
    is the same preference order as tf·log(N/df) whenever tf ties
    break on rarity, expressed entirely in integers so the result is
    bit-identical across engines (log() differs by an ulp between
    libm implementations; integer sort keys cannot).

    Shuffles: (doc, term) for tf; df comes from a MAP-SIDE
    ``array_distinct`` explode (r7) — each doc contributes one row
    per DISTINCT term, so the df side shuffles ~tokens/distinct-terms
    times less than re-aggregating the (doc, term) relation would
    (deriving df from ``tf`` reads cleaner but plans as a SECOND
    full corpus explode+aggregate: Catalyst rewrites the pruned
    aggregate into a distinct, which breaks exchange reuse —
    measured sf1: 7.8 -> 6.2 s cold). The join back to tf is left
    to AQE rather than force-broadcast: a web-corpus vocabulary
    (hundreds of millions of terms) exceeds Spark's 8 GB broadcast
    hard limit and the driver's heap, so a hint that helps at test
    scale becomes a hard job failure at the 100 TB scale this
    targets (r7 ADVICE) — AQE broadcasts small df relations at
    runtime anyway and falls back to a shuffle join for huge ones.
    At 100 TB persist df and reuse across scoring runs (it changes
    slowly), making incremental scoring a single tf pass + one join.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = (
        docs.select(
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias(
                "term"
            )
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_rel, "term")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df")
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Heavily repetitive documents (keyword stuffing, boilerplate
    loops, degenerate generations) are a standard removal class in
    LLM training pipelines (Rae et al., Gopher App. A1.1). Emitted
    per doc, all from ONE tokenization:

    - ``n_tokens`` — whitespace token count;
    - ``distinct_ratio`` — distinct/total tokens (low = repetitive);
    - ``top_unigram_frac`` — share of tokens taken by the most
      frequent token (ties broken by term for determinism);
    - ``top_bigram_frac`` / ``top_trigram_frac`` — share of n-gram
      positions taken by the most frequent n-gram; NULL when the doc
      is shorter than n.

    Scale shape: positional n-grams explode to ~3N skinny rows that
    immediately groupBy (doc, gram) with map-side combine, then a
    per-doc max — no joins against the corpus, no text carried past
    the first projection (grams hash to 64-bit before the shuffle).
    The filter thresholds live downstream (curation chooses cuts);
    this operator only measures.
    """
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__t"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("__nd"),
    )

    def gram_top_frac(n: int, out: str):
        """Per-doc count of the most frequent n-gram / positions.

        Counts group on xxhash64(gram), not the gram string — the
        (doc, gram) shuffle carries 8 bytes instead of the text. A
        64-bit collision INSIDE one document would merge two grams'
        counts and inflate the top fraction; at ~n²/2⁶⁵ per doc
        (≈ 5e-12 even for a million-token doc) this is accepted.
        NOTE the DuckDB oracle counts exact gram strings — the two
        twins agree unless such a collision occurs, which would
        surface as a driver hash mismatch with no code change.
        """
        grams = base.select(
            "doc_id",
            F.explode(
                shingles(F.col("__t"), k=n, distinct=False) if n > 1 else F.col("__t")
            ).alias("__g"),
        ).select("doc_id", F.xxhash64("__g").alias("__h"))
        return (
            grams.groupBy("doc_id", "__h")
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy("doc_id")
            .agg(F.max("__c").alias(out))
        )

    u = gram_top_frac(1, "__top1")
    b = gram_top_frac(2, "__top2")
    t = gram_top_frac(3, "__top3")
    return (
        base.join(u, "doc_id", "left")
        .join(b, "doc_id", "left")
        .join(t, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("__nd").cast("double") / F.col("n_tokens")).alias("distinct_ratio"),
            (F.col("__top1").cast("double") / F.col("n_tokens")).alias("top_unigram_frac"),
            F.when(
                F.col("n_tokens") >= 2,
                F.col("__top2").cast("double") / (F.col("n_tokens") - 1),
            ).alias("top_bigram_frac"),
            F.when(
                F.col("n_tokens") >= 3,
                F.col("__top3").cast("double") / (F.col("n_tokens") - 2),
            ).alias("top_trigram_frac"),
        )
    )


def corpus_vocab(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary statistics: the top-``k`` terms by collection
    frequency with document frequency and a deterministic rank.

    The relation every tokenizer/vocab decision starts from (BPE seed
    vocab, stopword induction, Zipf sanity checks). One explode →
    one (term) groupBy computing cf (with multiplicity) and df
    (distinct docs) together — a single shuffle with map-side
    combine; the top-k is a sort-limit on the vocab-sized aggregate,
    never on the corpus. Rank ties break (cf DESC, term ASC) so the
    cut is reproducible across engines and runs.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    # top-k first via sort-limit (TakeOrdered — per-partition heaps,
    # no global sort of the vocab); the ranking window then runs over
    # only k rows, so its single partition is k-bounded at any scale.
    top = stats.orderBy(F.col("cf").desc(), F.col("term").asc()).limit(k)
    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("rank", "term", "cf", "df")
    )


def length_histogram(
    docs: DataFrame,
    bucket_tokens: int = 16,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Sequence-length distribution per source — the planning input
    for chunking/packing budgets (which bucket dominates decides the
    chunk size; the tail above the context window decides how much
    chunking will split).

    One tokenization, one (source, bucket) aggregate, one per-source
    window for the share — no joins. Bucket arithmetic is integer
    (floor(n / width) * width); the share divides two exact BIGINTs
    in double, bit-identical cross-engine. Output: (source,
    bucket_lo, n_docs, sum_tokens, frac_docs).
    """
    from pyspark.sql.window import Window

    n = F.size(tokens(F.col(text_col))).cast("bigint")
    agg = (
        docs.select(
            F.col(source_col).alias("source"),
            n.alias("__n"),
            (F.floor(n / bucket_tokens) * bucket_tokens)
            .cast("bigint")
            .alias("bucket_lo"),
        )
        .groupBy("source", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("sum_tokens"),
        )
    )
    w = Window.partitionBy("source")
    return agg.select(
        "source",
        "bucket_lo",
        "n_docs",
        "sum_tokens",
        (
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
        ).alias("frac_docs"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-bounded chunks with overlap — the
    packing step before tokenization in a training-data pipeline
    (context-window-sized pieces, overlap preserving cross-boundary
    n-grams for dedup/retrieval).

    Chunk i starts at token ``i * (chunk_tokens - overlap)`` and
    carries up to ``chunk_tokens`` tokens; every start strictly
    inside the doc emits a chunk, so short tails are kept (training
    pipelines drop them downstream by ``n_tokens`` if desired).

    Pure column expressions: ONE tokenization, starts via
    ``sequence``, slices via ``transform``+``slice`` — no shuffle at
    all (a map-only operator; output partitioning follows input), no
    Python. Emits (doc_id, chunk_idx, chunk_text, n_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("bigint").alias("idx"),
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("txt"),
            F.least(F.lit(chunk_tokens), n - s).cast("bigint").alias("nt"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.idx").alias("chunk_idx"),
        F.col("c.txt").alias("chunk_text"),
        F.col("c.nt").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 256,
    n_groups: int | None = None,
    est_rows: int | None = None,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing: assign chunks to fixed-token-budget
    packs — the step between chunking and tokenization that keeps
    training batches dense (unpacked short tails waste context).

    Global bin packing is inherently sequential, so the distributed
    formulation packs WITHIN deterministic groups: chunks hash-group
    by doc (``pmod`` of the first 60 bits of ``md5(doc_id)`` — an
    engine-portable hash, so a SQL oracle can replicate the exact
    grouping; a doc's chunks stay together), each group packs
    greedily in (doc, chunk) order via applyInPandas, and pack ids
    are namespaced by group. One shuffle; waste vs global packing is
    at most one partial pack per group.

    ``n_groups`` bounds BOTH parallelism (there are never more
    concurrent packing tasks than groups) and per-task memory (each
    group is one in-memory pandas frame of ~N/n_groups rows). When
    not given it derives from the session: ``max(64, 4 ×
    defaultParallelism)``, further raised to ``est_rows // 50_000``
    when the caller passes a row estimate — at 100 TB always pass
    ``est_rows`` (or an explicit ``n_groups``) so group size stays
    bounded; a fixed default would cap parallelism regardless of
    corpus size. Changing ``n_groups`` renames packs but preserves
    every packing invariant (pytest-pinned).

    Deterministic for a fixed ``n_groups``: same inputs → same
    packs, any partitioning, any engine run. Output: one row per
    chunk (pack_id, doc_id, chunk_idx, n_tokens); a chunk larger
    than the budget gets a pack of its own (never split, never
    dropped).
    """
    import pandas as pd

    if n_groups is None:
        par = chunks.sparkSession.sparkContext.defaultParallelism
        n_groups = max(64, 4 * par)
        if est_rows is not None:
            n_groups = max(n_groups, est_rows // 50_000)

    src = chunks.select(
        F.col(doc_col),
        F.col(idx_col),
        F.col(tokens_col),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(doc_col).cast("string")), 1, 15),
                16,
                10,
            ).cast("bigint"),
            F.lit(n_groups),
        ).alias("__g"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([doc_col, idx_col])
        gid = int(pdf["__g"].iloc[0])
        pack_ids = []
        cur, acc = 0, 0
        for nt in pdf[tokens_col]:
            if acc > 0 and acc + nt > budget_tokens:
                cur += 1
                acc = 0
            acc += int(nt)
            pack_ids.append(f"{gid}-{cur}")
        out = pdf.assign(pack_id=pack_ids)
        return out[["pack_id", doc_col, idx_col, tokens_col]]

    return src.groupBy("__g").applyInPandas(
        pack,
        schema=(
            f"pack_id string, {doc_col} bigint, {idx_col} bigint,"
            f" {tokens_col} bigint"
        ),
    )


def tokenize_to_ids(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map every token to its vocabulary id: (doc_id, pos, token_id).

    The step between raw text and a training batch: a bounded
    vocabulary (the top-``vocab_size`` terms by collection frequency,
    id = deterministic rank from :func:`corpus_vocab`, 1-based) is
    broadcast-joined onto the position-exploded corpus; OOV tokens
    map to id 0. Shapes for 100 TB:

    - the vocab is aggregate-sized (<= vocab_size rows after one
      map-side-combined shuffle), so the id lookup is a broadcast
      hash join -- the corpus is never shuffled to tokenize;
    - output is flat (doc_id, pos, token_id) rows: downstream
      packing/batching re-assembles arrays per consumer, and flat
      rows keep the relation hashable by any engine (the SQL twin
      emits identical triples).

    Reference parity: the reference stops at landing raw rows
    (etl.py:14-57); this is the tokenizer stage its corpus consumers
    would run next.
    """
    vocab = corpus_vocab(docs, k=vocab_size, text_col=text_col).select(
        "term", F.col("rank").alias("__vid")
    )
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .select(
            F.col(id_col),
            F.col("pos").cast("bigint").alias("pos"),
            F.coalesce(F.col("__vid"), F.lit(0)).cast("bigint").alias("token_id"),
        )
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style document quality rule battery (Rae et al. 2021,
    "Scaling Language Models" §A1.1.1, public arXiv:2112.11446).

    One flag column per rule plus the conjunction -- the standard
    pre-training corpus filter pass. All pure Column expressions
    (codegen'd, zero shuffle): a single narrow projection over the
    corpus scan, embarrassingly parallel at any scale. Thresholds
    are the published defaults except ``min_words`` (20, not 50 --
    the synthetic docs are short; callers pass their own).

    Rules (flags are 1 = passes):

    - ok_words: min_words <= n words <= max_words
    - ok_mean_len: mean word length in [min_mean_word_len,
      max_mean_word_len] (computed as non-space chars / words --
      exact for the single-space-separated corpus and identical
      arithmetic in the SQL twin)
    - ok_symbols: (# '#' chars + # '...' runs) / words <= max_symbol_ratio
    - ok_alpha: fraction of words containing [a-z] >= min_alpha_word_ratio
    - ok_stops: >= min_stop_hits stopword occurrences
    """
    lt = F.lower(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_words = F.size(toks).cast("bigint")
    n_nonspace = F.length(F.regexp_replace(lt, " ", "")).cast("bigint")
    mean_wl = n_nonspace.cast("double") / n_words
    n_hash = (F.length(lt) - F.length(F.regexp_replace(lt, "#", ""))).cast("bigint")
    n_ellipsis = F.size(F.regexp_extract_all(lt, F.lit("\\.\\.\\."), F.lit(0))).cast(
        "bigint"
    )
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("bigint")
    alpha_ratio = n_alpha_words.cast("double") / n_words
    n_stop = stop_count(toks, STOPWORDS).cast("bigint")

    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean_len = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_symbols = symbol_ratio <= max_symbol_ratio
    ok_alpha = alpha_ratio >= min_alpha_word_ratio
    ok_stops = n_stop >= min_stop_hits
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        ok_words.cast("int").alias("ok_words"),
        ok_mean_len.cast("int").alias("ok_mean_len"),
        ok_symbols.cast("int").alias("ok_symbols"),
        ok_alpha.cast("int").alias("ok_alpha"),
        ok_stops.cast("int").alias("ok_stops"),
        (ok_words & ok_mean_len & ok_symbols & ok_alpha & ok_stops)
        .cast("int")
        .alias("passes"),
    )


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Standard corpus text canonicalization (the C4/CCNet cleanup
    prologue): Unicode NFC composition, then control / zero-width
    stripping, then whitespace-run collapse + trim.

    Per doc: ``norm_text`` plus exact BIGINT ``n_chars_raw`` /
    ``n_chars_norm`` so downstream filters can gate on how much the
    cleanup removed (a doc that shrinks drastically was mostly
    control/format junk).

    Determinism across engines is the design driver:
    - NFC runs in an Arrow-batched kernel over Python's
      ``unicodedata`` — both it and DuckDB's ``nfc_normalize``
      implement UAX#15 canonical composition and agree bit-for-bit
      (verified over combining marks, ligatures, fullwidth forms);
      NFC is the ONLY Python step, one Arrow hop, map-only.
    - the strip/collapse steps use EXPLICIT code-point ranges, never
      regex classes: Java's ``\\s`` includes U+000B where RE2's does
      not, and ``\\p{Cf}`` membership shifts with each engine's
      Unicode table version. C0 controls (minus the whitespace the
      collapse step owns), DEL, bidi/zero-width marks U+200B-200F
      and the BOM are stripped; runs of [space \\t \\n \\r \\f \\x0B]
      collapse to one space.

    Scale shape: map-only, zero shuffle, zero joins — output
    partitioning follows input, so it composes upstream of any
    dedup/tokenize stage for free.
    """
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        # NFC is the identity on pure ASCII; str.isascii() is a
        # C-speed scan, so the common web-corpus row skips the
        # normalize call entirely (the Arrow transfer still pays —
        # that's the price of the one Python step)
        return s.map(
            lambda t: t
            if t is None or t.isascii()
            else unicodedata.normalize("NFC", t)
        )

    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    nfc = pandas_udf(_nfc, "string")
    ctl = "[\\x00-\\x08\\x0e-\\x1f\\x7f\\u200b-\\u200f\\ufeff]"
    ws = "[ \\t\\n\\r\\f\\x0b]+"
    out = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.length(F.col(text_col)).cast("bigint").alias("n_chars_raw"),
            nfc(F.col(text_col)).alias("__nfc"),
        )
        .select(
            "doc_id",
            "n_chars_raw",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("__nfc"), ctl, ""), ws, " "
                )
            ).alias("norm_text"),
        )
        .select(
            "doc_id",
            "norm_text",
            "n_chars_raw",
            F.length("norm_text").cast("bigint").alias("n_chars_norm"),
        )
    )
    return out


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Token coverage curve: for every distinct collection frequency
    ``f`` in the corpus, how many distinct terms occur >= f times
    (the vocab size if you cut there) and what share of ALL corpus
    tokens that vocab covers — the curve behind every "32k vs 64k
    vocab" tokenizer decision (coverage knees are where extra vocab
    stops paying).

    Three strictly shrinking relations: corpus -> term counts (one
    explode + one groupBy with map-side combine) -> frequency
    histogram (#distinct-frequency rows, thousands at most by Zipf)
    -> running sums over the histogram. The only unpartitioned
    window runs over the histogram, never the vocab or the corpus.
    Integer masses summed exactly; only the final share divides.
    Emits (min_cf, vocab_size, tokens_covered, coverage) ordered by
    descending frequency; coverage rounds to 6 decimals.
    """
    from pyspark.sql.window import Window

    terms = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    cf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("__cf"))
    hist = cf.groupBy("__cf").agg(F.count(F.lit(1)).alias("__nterms"))
    w = Window.orderBy(F.col("__cf").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    return (
        hist.select(
            F.col("__cf").alias("min_cf"),
            F.sum("__nterms").over(w).cast("bigint").alias("vocab_size"),
            F.sum(F.col("__cf") * F.col("__nterms")).over(w)
            .cast("bigint")
            .alias("tokens_covered"),
            F.sum(F.col("__cf") * F.col("__nterms")).over(w_all)
            .cast("double")
            .alias("__total"),
        )
        .select(
            "min_cf",
            "vocab_size",
            "tokens_covered",
            F.round(F.col("tokens_covered") / F.col("__total"), 6).alias(
                "coverage"
            ),
        )
    )


def quality_calibration(
    docs: DataFrame,
    n_bands: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    **gopher_kwargs,
) -> DataFrame:
    """Filter-agreement calibration: bucket docs into fixed-width
    bands of the heuristic quality score and measure, per band, what
    fraction passes the Gopher rule battery — do the two independent
    quality signals agree, and where is the score threshold that
    matches the rules' judgment? (The report you read before picking
    a quality cutoff for a 100 TB filter sweep.)

    Single corpus scan: the band expression rides through
    :func:`gopher_rules` as a pass-through column, so flags and band
    come out of ONE projection — no self-join on doc id, no second
    scan; then a #bands-row aggregate. Bands are the fixed-width
    slices of stratified_sample_by_quality (scale-free; no global
    rank). Emits (band, n_docs, n_pass, pass_rate) with pass_rate
    rounded to 6 decimals.
    """
    q = quality_expr(text_col)
    # empty/NULL text has an undefined quality score; unfiltered, the
    # NULL would land in the TOP band (F.least skips NULLs) — the
    # stratified_sample_by_quality contract: unscoreable docs are
    # excluded from the calibration population
    banded = docs.where(
        F.length(F.lower(F.col(text_col))) > 0
    ).withColumn(
        "band",
        F.least(F.floor(q * n_bands).cast("bigint"), F.lit(n_bands - 1)),
    )
    flags = gopher_rules(
        banded, text_col=text_col, id_col=id_col, extra_cols=("band",),
        **gopher_kwargs,
    )
    return (
        flags.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("passes").cast("bigint").alias("n_pass"),
        )
        .select(
            "band",
            "n_docs",
            "n_pass",
            F.round(F.col("n_pass") / F.col("n_docs").cast("double"), 6).alias(
                "pass_rate"
            ),
        )
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-doc zlib compression ratio — the classic cheap proxy for
    repetitive / low-entropy text (highly compressible = templated,
    degenerate, or spammy; the signal Gopher-style batteries add on
    top of token heuristics because n-gram rules miss long-range
    repetition).

    Arrow-batched pandas UDF (zlib is C-speed; one call per row on
    the batch, no Python loop over characters), map-only — zero
    shuffle, output partitioning follows the scan. Deterministic for
    a fixed zlib level (RFC 1950 stream, stable across runs and
    workers). Emits (doc_id, n_raw, n_compressed, ratio) with ratio
    = compressed/raw rounded to 6 decimals; empty docs report ratio
    NULL (0-byte raw). Rows-only: DuckDB ships no zlib scalar, so
    this is pytest-pinned against direct zlib calls instead of an
    oracle twin.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` stringifies signatures, so
    # the pandas_udf type hint goes in via __annotations__ directly
    def _zlen_fn(texts):
        import zlib

        return texts.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    _zlen_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _zlen = pandas_udf(_zlen_fn, "long")

    n_raw = F.length(F.col(text_col)).cast("bigint")
    return docs.select(
        F.col(id_col),
        n_raw.alias("n_raw"),
        _zlen(F.col(text_col)).alias("n_compressed"),
    ).withColumn(
        "ratio",
        F.when(
            F.col("n_raw") > 0,
            F.round(F.col("n_compressed") / F.col("n_raw").cast("double"), 6),
        ),
    )


def lang_diversity(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source language-diversity report: docs, distinct
    languages, and the Gini-Simpson index 1 − Σ p² (the probability
    two random docs differ in language) with its inverse-Simpson
    "effective language count" — the mix-planning diagnostic for
    multilingual corpora, chosen over Shannon entropy because it is
    a RATIONAL function of integer counts (no logs), so both engine
    twins compute bit-identical doubles.

    Two nested tiny aggregates: (source, lang) counts, then one row
    per source. Emits (source, n_docs, n_langs, simpson,
    effective_langs), floats rounded to 6.
    """
    by_lang = docs.groupBy(
        F.col(source_col).alias("source"), F.col(lang_col)
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        by_lang.groupBy("source")
        .agg(
            F.sum("__n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.sum(F.col("__n") * F.col("__n")).alias("__sq"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_langs",
            F.round(
                1.0 - F.col("__sq") / (F.col("n_docs") * F.col("n_docs")).cast("double"),
                6,
            ).alias("simpson"),
            F.round(
                (F.col("n_docs") * F.col("n_docs")).cast("double") / F.col("__sq"),
                6,
            ).alias("effective_langs"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    max_distinct_terms: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Wordlist safety/curation filter: count blocklisted-term hits
    per document and flag which docs survive — the standing first
    pass of corpus curation (NSFW/spam/boilerplate wordlists) before
    any model-based scoring.

    Pure map-side Column arithmetic: tokenize, keep the tokens that
    appear in the (tiny, literal) term array, count them and their
    distinct forms. A doc is kept while it matches FEWER than
    ``max_distinct_terms`` distinct blocklist entries — distinct, so
    one unlucky high-frequency token can't sink a long document the
    way a raw-hit threshold would. NO shuffle, NO join: the term
    list folds into the plan as an array literal (wordlists are
    KB-sized; a corpus-sized blocklist would be decontaminate_ngrams'
    job instead). Exact-token equality, not substring: "class"
    never matches a blocklisted "ass" (the scunthorpe failure of
    regex blocklists).

    Output: (id, source, n_blocked bigint, n_blocked_terms bigint,
    keep boolean). Deterministic; engine-twin via list_filter /
    list_distinct on the identical whitespace tokenization.
    """
    if not terms:
        # F.array() with zero elements types as array<null> and
        # array_contains rejects it; an empty blocklist is almost
        # certainly a config bug upstream, not "keep everything"
        raise ValueError("blocklist_filter: terms must be non-empty")
    toks = F.split(F.lower(F.col(text_col)), " ")
    terms_arr = F.array(*[F.lit(t) for t in terms])
    hits = F.filter(toks, lambda t: F.array_contains(terms_arr, t))
    n_blocked = F.size(hits).cast("bigint")
    n_terms = F.size(F.array_distinct(hits)).cast("bigint")
    return df.select(
        F.col(id_col),
        F.col(source_col),
        n_blocked.alias("n_blocked"),
        n_terms.alias("n_blocked_terms"),
        (n_terms < F.lit(max_distinct_terms)).alias("keep"),
    )


def kwic_search(
    df: DataFrame,
    term: str,
    width: int = 3,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context (KWIC) concordance: every occurrence of
    ``term`` with ``width`` tokens of context on each side — the
    corpus-inspection primitive behind "show me how this token is
    actually used" (quality triage, contamination spot-checks,
    annotation sampling).

    Scale shape: hit POSITIONS are found map-side with a
    transform-with-index over the token array (no exploding every
    token of every document — only matches are exploded, so a rare
    term costs ~nothing beyond the scan), contexts are two array
    slices of the same token array, and the output is cut to
    ``top_k`` by the deterministic (doc, position) order via a
    distributed TakeOrdered heap. Exact-token equality (the
    blocklist_filter contract), not substring.

    Output: (doc_id, pos bigint 1-based, left_ctx, right_ctx),
    top_k rows by (doc_id, pos).
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    hit_pos = F.filter(
        F.transform(
            toks, lambda x, i: F.when(x == F.lit(term), i + F.lit(1))
        ),
        lambda v: v.isNotNull(),
    )
    out = df.select(
        F.col(id_col), toks.alias("__t"), F.explode(hit_pos).alias("pos")
    )
    p = F.col("pos")
    left = F.slice(
        F.col("__t"),
        F.greatest(p - F.lit(width), F.lit(1)),
        F.least(F.lit(width), p - F.lit(1)),
    )
    right = F.slice(F.col("__t"), p + F.lit(1), F.lit(width))
    return (
        out.select(
            F.col(id_col),
            p.cast("bigint").alias("pos"),
            F.array_join(left, " ").alias("left_ctx"),
            F.array_join(right, " ").alias("right_ctx"),
        )
        .orderBy(id_col, "pos")
        .limit(top_k)
    )


def strip_markup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4-style markup stripping (arXiv:1910.10683 §2.2 drops pages
    the cleanup can't save; this is the cleanup): remove
    <script>/<style> blocks wholesale (their CONTENT is code, not
    language), HTML comments, then every remaining tag (replaced by
    a space — tags are block separators, and gluing 'word</p><p>word'
    would mint fake tokens), unescape the core named entities, and
    collapse whitespace. The step every web-crawl corpus takes
    between "HTML bytes" and "text the quality/dedup stages see".

    Engine-portable by construction (the normalize_text contract):
    every pattern is shared Java-regex/RE2 syntax — non-greedy
    ``.*?`` with inline ``(?is)`` flags, explicit ``[ \\t\\n\\r]``
    whitespace classes (never ``\\s``, whose membership differs),
    plain string replaces for entities with ``&amp;`` LAST so
    double-escaped input unescapes exactly one level (the standard
    ordering bug, pinned in pytest). Unterminated script blocks
    degrade identically in both engines: the open tag strips as a
    tag, its content stays (a data bug surfaced, not hidden).
    Numeric character references pass through untouched — decoding
    them needs chr(), which SQL twins can't express portably.

    Scale shape: map-only codegen'd regexp_replace chain, zero
    shuffle, zero joins, composes upstream of normalize_text /
    gopher_rules for free. Emits (id, text_clean, n_chars_raw,
    n_chars_clean) — the shrink ratio is the "was this page mostly
    markup" signal.
    """
    raw = F.col(text_col)
    x = F.regexp_replace(raw, r"(?is)<script\b.*?</script[^>]*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b.*?</style[^>]*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # LAST: one unescape level for &amp;lt;
    ):
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.trim(F.regexp_replace(x, "[ \t\n\r]+", " "))
    return docs.select(
        F.col(id_col),
        x.alias("text_clean"),
        F.length(raw).cast("bigint").alias("n_chars_raw"),
        F.length(x).cast("bigint").alias("n_chars_clean"),
    )
