"""Corpus-level training-data operators: eval-set decontamination
and bigram language-model surprisal scoring.

Both are standard large-scale LLM-pipeline steps (decontamination:
remove eval-set n-gram overlap from training data; LM scoring:
CCNet-style corpus-fit filtering). No reference twin — the reference
(397 LoC ETL) has no corpus analytics; these extend SURVEY §2.3.

Scale design:
- ``decontaminate_ngrams``: both sides reduce to DISTINCT
  (doc, 64-bit shingle hash) relations *before* the join, so the
  shuffle carries 16-byte rows, never text. The join key is the
  hash; at 100 TB the eval side (benchmarks, ~1e6 n-grams) is
  broadcast and the train side streams through map-side — zero
  shuffle of the training corpus.
- ``bigram_surprisal``: the "model" is two count relations derived
  from one positional-bigram explode (one shuffle each); scoring
  joins them back per position. The prefix-count table is
  vocab-bounded and broadcast; the bigram-count table grows with
  observed bigrams (unbounded at corpus scale) and is joined with a
  plain shuffle hash join on the same key the count already
  partitioned by.
  Surprisal is measured in *whole bits* — floor(log2(c1/c2))
  computed with integer shift/compare only (no float log), because
  libm ``log`` differs by 1 ulp across engines and a 50k-doc corpus
  hits round-boundary divergence with near-certainty (same
  determinism argument as the integer TF-IDF ordering, PERF.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def _floor_log2_ratio(num: Column, den: Column) -> Column:
    """floor(log2(num/den)) for positive BIGINT num >= den, exactly.

    d = floor(log2(num)) - floor(log2(den)) is either the answer or
    one too high; fix up with one integer shift compare. floor(log2)
    of a BIGINT is length(bin(n)) - 1 — string length of the binary
    representation, no float involved.
    """
    fl_num = F.length(F.bin(num)) - 1
    fl_den = F.length(F.bin(den)) - 1
    d = (fl_num - fl_den).cast("int")
    # PySpark's F.shiftleft wrapper only accepts a Python int for the
    # shift amount; call the SQL function directly for a Column shift.
    shifted = F.call_function("shiftleft", den, d)
    return F.when(num >= shifted, d).otherwise(d - 1).cast("bigint")


def _floor_log2_ratio_signed(num: Column, den: Column) -> Column:
    """floor(log2(num/den)) for positive BIGINTs with the ratio on
    EITHER side of 1, exactly — the extension _floor_log2_ratio
    (which requires num >= den) needs for KL terms, where a word
    rarer in the source than in the rest has negative bits.

    num >= den delegates to the unsigned helper. num < den: with
    e = floor(log2(den/num)) >= 0 from the same construction,
    floor(log2(num/den)) = -e when den == num·2^e exactly, else
    -(e+1). Shift amounts are clamped nonnegative so the untaken
    branch stays well-defined under vectorized evaluation (Spark
    codegen and DuckDB both evaluate CASE arms eagerly).
    """
    fl_num = F.length(F.bin(num)) - 1
    fl_den = F.length(F.bin(den)) - 1
    d = F.greatest((fl_num - fl_den).cast("int"), F.lit(0))
    pos = F.when(
        num >= F.call_function("shiftleft", den, d), d
    ).otherwise(d - 1)
    d2 = F.greatest((fl_den - fl_num).cast("int"), F.lit(0))
    e = F.when(
        den >= F.call_function("shiftleft", num, d2), d2
    ).otherwise(d2 - 1)
    neg = F.when(
        F.call_function("shiftleft", num, e) == den, -e
    ).otherwise(-e - 1)
    return F.when(num >= den, pos).otherwise(neg).cast("bigint")


def decontaminate_ngrams(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Report training docs sharing any k-gram with the eval set.

    Returns one row per contaminated train doc: ``doc_id``,
    ``n_shared_ngrams`` (distinct k-grams also present in ANY eval
    doc) and ``n_eval_docs`` (distinct eval docs hit). Docs shorter
    than k tokens cannot be contaminated.
    """
    def grams(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out),
                F.explode(shingles(tokens(F.col(text_col)), k=k)).alias("__s"),
            )
            .select(out, F.xxhash64("__s").alias("__h"))
            .distinct()
        )

    t = grams(train, "doc_id")
    e = grams(eval_docs, "eval_doc")
    return (
        t.join(F.broadcast(e), "__h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("__h").alias("n_shared_ngrams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CLEAN training docs — those sharing NO k-gram with the eval
    set — via a Bloom prefilter in front of an exact confirm join.
    Exact result (the Bloom can only admit false POSITIVES, which the
    confirm join then rejects); the sketch is pure optimization.

    The regime this exists for: :func:`decontaminate_ngrams`
    broadcasts the eval shingle set exactly, which stops working when
    the contamination list is itself huge (every eval suite + its
    paraphrases ~ 10⁸ shingles). A Bloom filter keeps the broadcast
    O(m bits) regardless of list size, and the exact join that
    resolves its false positives only ever sees the bloom-POSITIVE
    train shingles — at 1% fpp the anti-join shuffle shrinks from
    the whole corpus's shingles to (true hits + 1% noise).

    Spark-first build, fully lazy, no driver-side key set (or
    bitmap) at any size:

    1. eval shingle hashes feed ``n_hashes`` positions each
       (``pmod(xxhash64(h, i), m_bits)``); a distributed
       ``bit_or`` groupBy over 64-bit words assembles the sparse
       word set, and a single global aggregate densifies it into ONE
       row holding the full ``array<bigint>`` bitmap (map_from_entries
       + transform over sequence — nothing ever touches the driver).
    2. That 1-row relation broadcast-cross-joins onto the probe side
       (a BroadcastNestedLoopJoin of exactly one 128 KiB row at the
       2²⁰ default); the membership test is shift/mask arithmetic on
       the array column inside whole-stage codegen. Carrying the
       bitmap as DATA rather than a plan literal matters twice: a
       2²⁰-bit ``F.lit`` array is 16 384 py4j round-trips (~8 s of
       driver time, measured) and a 16 384-node expression tree for
       the analyzer, while the broadcast row is O(1) plan nodes at
       any m.
    3. Bloom-positive train shingles confirm against the eval
       relation with a left-semi shuffle join; contaminated doc ids
       anti-join back onto the train ids.

    Sizing contract: keep ``m_bits >= ~10x`` the distinct eval
    shingle count for ~1% fpp; the broadcast row scales to ~2³⁰ bits
    (128 MiB) before executor-memory pressure, two decades past the
    plan-literal ceiling. Shingle identity is xxhash64 (the
    decontaminate_ngrams collision convention).

    Output: (doc_id, n_grams) — every clean train doc and its
    distinct-shingle count (0 for docs shorter than k tokens, which
    cannot be contaminated).
    """
    def grams(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out),
                F.explode(shingles(tokens(F.col(text_col)), k=k)).alias("__s"),
            )
            .select(out, F.xxhash64("__s").alias("__h"))
            .distinct()
        )

    tr = grams(train, "doc_id")
    ev = grams(eval_docs, "__edoc").select("__h").distinct()

    def positions(h):
        return [
            F.pmod(F.xxhash64(h, F.lit(i)), F.lit(m_bits))
            for i in range(n_hashes)
        ]

    # the python F.shiftleft/shiftright helpers only accept literal
    # shift amounts; call_function reaches the SQL variants that
    # take a column
    def shl(value, bits):
        return F.call_function("shiftleft", value, bits.cast("int"))

    def shr(value, bits):
        return F.call_function("shiftright", value, bits.cast("int"))

    # densify the sparse word set into ONE row holding the full
    # array<bigint> bitmap: left-join a range spine (zero-fill) and
    # collect_list + array_sort into index order. NOT map_from_entries
    # + per-index element_at — Spark map lookup is a linear scan, so
    # that densify is O(n_words^2): 8.9 s vs 0.7 s at the 2^20
    # default, measured. The single-row collect_list is bounded by
    # n_words (16 B each), never by eval-list size.
    n_words = m_bits >> 6
    spark = train.sparkSession
    words = (
        ev.select(F.explode(F.array(*positions(F.col("__h")))).alias("__p"))
        .select(
            F.shiftright("__p", 6).alias("__w"),
            shl(F.lit(1).cast("long"), F.col("__p") % 64).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
    )
    bitmap_row = (
        spark.range(n_words)
        .join(words, F.col("id") == F.col("__w"), "left")
        .select(
            F.struct(
                F.col("id").alias("i"),
                F.coalesce(F.col("__bits"), F.lit(0).cast("long")).alias("b"),
            ).alias("__s")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list("__s")), lambda s: s["b"]
            ).alias("__bm")
        )
    )

    arr = F.col("__bm")
    might = None
    for pos in positions(F.col("__h")):
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        hit = shr(word, pos % 64).bitwiseAND(F.lit(1)) == 1
        might = hit if might is None else (might & hit)

    # Gate ORDERING is load-bearing at scale: the confirm semi-join
    # must see only bloom-POSITIVE shingles, but Catalyst's
    # PushLeftSemiLeftAntiThroughJoin will happily reorder the semi
    # join below the bloom cross-join when the semi key is derived
    # from the probe side alone (observed in the physical plan) —
    # which re-shuffles the ENTIRE training shingle set, the exact
    # cost this operator exists to avoid. Deriving the confirm key
    # THROUGH the bloom test (NULL when bloom-negative) references
    # both join children, making that push illegal; bloom-negative
    # rows carry a NULL key, which a left-semi probe never matches
    # and the inferred IsNotNull filter drops before any exchange.
    probed = tr.crossJoin(F.broadcast(bitmap_row)).select(
        "doc_id", F.when(might, F.col("__h")).alias("__h")
    )
    hits = (
        probed.join(ev, "__h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    counts = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left_anti")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_grams"),
        )
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc corpus-fit score: mean bigram surprisal in whole bits.

    Trains MLE bigram statistics on ``docs`` itself (count of each
    bigram, count of each prefix token over bigram positions), then
    scores every doc as the average over its bigram positions of
    floor(log2(c(w1)/c(w1,w2))) — 0 bits for a bigram that always
    follows its prefix, more bits the more surprising the
    continuation. Emits ``sum_bits``/``n_bigrams`` (exact BIGINTs)
    and their ratio ``avg_bits`` (one double division,
    deterministic). Docs with fewer than 2 tokens are dropped.
    """
    toks = tokens(F.col(text_col))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.zip_with(
                F.slice(toks, 1, n),
                F.slice(toks, 2, n),
                lambda a, b: F.struct(a.alias("w1"), F.concat(a, F.lit(" "), b).alias("bg")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))

    c_bigram = pos.groupBy("bg").agg(F.count("*").alias("c2"))
    c_prefix = pos.groupBy("w1").agg(F.count("*").alias("c1"))

    # c_bigram grows with observed bigrams — unbounded on a 100 TB
    # corpus, so it must NOT be broadcast: pos is already shuffled by
    # `bg` for the count, and AQE reuses that co-partitioning for the
    # shuffle hash join. c_prefix is vocab-sized (bounded) -> broadcast.
    scored = (
        pos.join(c_bigram, "bg")
        .join(F.broadcast(c_prefix), "w1")
        .withColumn("bits", _floor_log2_ratio(F.col("c1"), F.col("c2")))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("bits").alias("sum_bits"),
        F.count("*").alias("n_bigrams"),
        (F.sum("bits").cast("double") / F.count("*")).alias("avg_bits"),
    )


def heldout_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    holdout_mod: int = 10,
) -> DataFrame:
    """Out-of-sample bigram-LM scoring with add-one smoothing: train
    on docs where ``id % holdout_mod != 0``, score the held-out rest.

    The CCNet/KenLM corpus-fit loop in miniature: a model trained on
    the corpus scores *unseen* text, so unseen bigrams must get
    finite mass — add-one smoothing gives each position
    p = (c2 + 1) / (c1 + V) where c2/c1 are train bigram/prefix
    counts (0 when unseen) and V is the train prefix-vocabulary
    size. Like bigram_surprisal the score is measured in *whole
    bits* with integer shift/compare arithmetic only — per position
    floor(log2((c1 + V) / (c2 + 1))) — because libm log differs
    across engines at the ulp and a float sum's order is not
    deterministic under shuffle. num >= den always: c2 <= c1 and
    V >= 1.

    Per held-out doc: ``n_bigrams``, ``oov_bigrams`` (positions
    whose bigram never occurs in train), exact ``sum_bits``, and
    ``avg_bits`` (one double division at the end — deterministic).
    Held-out docs with fewer than 2 tokens are dropped.

    Scale shape: one positional explode per side; train reduces to
    two count relations before any join — the bigram-count join is
    a plain shuffle hash join on the key the count already
    partitioned by (AQE reuses the partitioning), the vocab-bounded
    prefix counts and the 1-row vocab size broadcast. The held-out
    side is the small side by construction (1/holdout_mod of the
    corpus) but the dataflow never assumes it fits in memory.
    """

    def positions(df: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        n = F.greatest(F.size(toks) - 1, F.lit(0))
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, n),
                    F.slice(toks, 2, n),
                    lambda a, b: F.struct(
                        a.alias("w1"), F.concat(a, F.lit(" "), b).alias("bg")
                    ),
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))

    train = positions(docs.where(F.col(id_col) % holdout_mod != 0))
    held = positions(docs.where(F.col(id_col) % holdout_mod == 0))

    c_bigram = train.groupBy("bg").agg(F.count("*").alias("c2"))
    # lazily persisted (r11): c_prefix feeds both the broadcast join
    # AND the vocab count — without it the train-side tokenize +
    # posexplode subplan evaluates a third time just to count the
    # vocabulary (Catalyst doesn't dedupe subtrees). Vocab-sized, so
    # the cache is as small as the broadcast it already ships.
    c_prefix = train.groupBy("w1").agg(F.count("*").alias("c1")).persist()
    vocab = c_prefix.agg(F.count("*").alias("v"))

    scored = (
        held.join(c_bigram, "bg", "left")
        .join(F.broadcast(c_prefix), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            "v",
        )
        .withColumn(
            "bits", _floor_log2_ratio(F.col("c1") + F.col("v"), F.col("c2") + 1)
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum((F.col("c2") == 0).cast("bigint")).alias("oov_bigrams"),
        F.sum("bits").alias("sum_bits"),
        (F.sum("bits").cast("double") / F.count("*")).alias("avg_bits"),
    )
    out._cached_inputs = [c_prefix]
    return out


def dataset_card_report(
    docs: DataFrame,
    bucket_tokens: int = 64,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-relation dataset card: the corpus composition summary a
    training run publishes alongside its data (per-language and
    per-source doc/token counts and shares, a token-length
    histogram, and the corpus totals).

    ONE corpus scan, one tokenization: the per-doc (lang, source,
    length-bucket, n_tokens) projection pre-aggregates to the finest
    (lang, source, bucket) grain, and GROUPING SETS
    ((lang),(source),(bucket),()) expands the PRE-AGGREGATED
    partials — the grouping-set multiplication touches
    cardinality-bounded rows, never the corpus (same
    pre-aggregate-then-expand shape as grouping_sets_summary).
    `dim` names the section, `key` the member; shares divide exact
    BIGINTs by the corpus total in double, bit-identical
    cross-engine. Length buckets are integer floor(n/width)*width,
    the length_histogram contract.
    """
    n = F.size(tokens(F.col(text_col))).cast("bigint")
    pre = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.col(source_col).alias("source"),
            (F.floor(n / bucket_tokens) * bucket_tokens)
            .cast("bigint")
            .alias("bucket_lo"),
            n.alias("__n"),
        )
        .groupBy("lang", "source", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("__docs"), F.sum("__n").alias("__toks"))
    )
    agg = pre.groupingSets(
        [["lang"], ["source"], ["bucket_lo"], []],
        "lang",
        "source",
        "bucket_lo",
    ).agg(
        F.grouping_id().cast("bigint").alias("__gid"),
        F.sum("__docs").alias("n_docs"),
        F.sum("__toks").alias("n_tokens"),
    )
    # grouping_id over (lang, source, bucket_lo): a bit is SET when
    # the column is aggregated away, so (lang)=3, (source)=5,
    # (bucket_lo)=6, ()=7
    dim = (
        F.when(F.col("__gid") == 3, F.lit("lang"))
        .when(F.col("__gid") == 5, F.lit("source"))
        .when(F.col("__gid") == 6, F.lit("length_bucket"))
        .otherwise(F.lit("corpus"))
    )
    key = (
        F.when(F.col("__gid") == 3, F.col("lang"))
        .when(F.col("__gid") == 5, F.col("source"))
        .when(F.col("__gid") == 6, F.col("bucket_lo").cast("string"))
        .otherwise(F.lit("total"))
    )
    total = pre.agg(F.sum("__docs").alias("__total"))
    return (
        agg.select(dim.alias("dim"), key.alias("key"), "n_docs", "n_tokens")
        .crossJoin(F.broadcast(total))
        .select(
            "dim",
            "key",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs").cast("double") / F.col("__total"), 6).alias(
                "doc_share"
            ),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    top_k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` adjacent-word collocations by pointwise mutual
    information — the classic phrase-mining signal ("new york"
    scores high because its joint count beats what its parts'
    frequencies predict), the input to phrase-aware tokenization and
    stopword-phrase lists.

    PMI = log2(c(ab)·N / (c(a)·c(b))), kept in WHOLE BITS via the
    same integer shift/compare arithmetic as bigram_surprisal (libm
    log differs across engines at the ulp): products stay in BIGINT
    (c·c ≤ ~1e18 for counts to ~1e9 — fine at test scale; at true
    100 TB counts route the product through DECIMAL). Only
    POSITIVE-PMI pairs qualify (c(ab)·N ≥ c(a)·c(b) — negative
    association is not a collocation), and ``min_count`` kills the
    hapax pairs whose PMI is spuriously high (the standard gate).

    One positional explode, three count aggregates (pair counts
    shuffle-joined on the key they grouped by, vocab-sized unigram
    counts broadcast, 1-row N broadcast), one sort-limit heap cut —
    no corpus-sized sort. Ordering: pmi_bits DESC, c_pair DESC,
    pair ASC — total and integer-only.
    """
    toks = tokens(F.col(text_col))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pos = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, n),
                F.slice(toks, 2, n),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    pairs = (
        pos.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .where(F.col("c_pair") >= min_count)
    )
    # unigram counts come from the TOKEN stream, not the bigram
    # slots — counting both slots doubles every word and biases PMI
    # ~2 bits negative across the board (found: zero positive pairs)
    words = docs.select(F.explode(toks).alias("w"))
    c_uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = words.agg(F.count(F.lit(1)).alias("n_pos"))
    scored = (
        pairs.join(
            F.broadcast(c_uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1"))),
            "w1",
        )
        .join(
            F.broadcast(c_uni.select(F.col("w").alias("w2"), F.col("c").alias("c_w2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .withColumn("__num", F.col("c_pair") * F.col("n_pos"))
        .withColumn("__den", F.col("c_w1") * F.col("c_w2"))
        .where(F.col("__num") >= F.col("__den"))
        .withColumn("pmi_bits", _floor_log2_ratio(F.col("__num"), F.col("__den")))
    )
    return (
        scored.orderBy(
            F.col("pmi_bits").desc(),
            F.col("c_pair").desc(),
            F.col("w1"),
            F.col("w2"),
        )
        .limit(top_k)
        .select("w1", "w2", "c_pair", "c_w1", "c_w2", "pmi_bits")
    )


def ngram_novelty(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram novelty: what fraction of a doc's distinct
    word ``k``-grams appear in NO doc with a smaller id — the
    marginal-contribution metric curation loops rank by ("this doc
    adds nothing the corpus hasn't seen" → drop it first), and the
    degenerate-generation check run over model outputs.

    First-occurrence attribution via one shingle-keyed MIN
    aggregate, joined back co-partitioned on the shingle key (AQE
    reuses the exchange), then a doc-keyed count — two shuffles
    total, no all-pairs anything; ids give the deterministic
    "earlier" order (swap in a timestamp column upstream for
    crawl-date semantics). Docs shorter than ``k`` tokens emit no
    shingles and are absent from the output by contract. Emits
    (doc_id, n_shingles, n_novel, novelty) with novelty rounded to
    6 decimals.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), k)).alias("__s"),
    )
    first = sh.groupBy("__s").agg(F.min("doc_id").alias("__first"))
    novel = (F.col("__first") == F.col("doc_id")).cast("bigint")
    return (
        sh.join(first, "__s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel") / F.col("n_shingles").cast("double"), 6
            ).alias("novelty"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantized Zipf-law fit over corpus token frequencies — "does
    this corpus look like natural language, and how steep is its
    head" (Zipf exponent ~1 for natural text; synthetic/boilerplate
    corpora skew flat or cliff-shaped). A standard corpus-health
    check next to vocab_coverage / repetition_stats.

    Zipf's law predicts log(freq) ~ -s * log(rank). The fit here is
    OLS over the WHOLE-BIT logs x = floor(log2(rank)),
    y = floor(log2(cf)) — length(bin(n))-1, pure integer, because
    libm log differs by 1 ulp across engines (the module-header
    determinism argument). Bit quantization rounds each coordinate
    down by <1, and the OLS slope over bit-bucketed points tracks
    the true exponent to ~0.1 — plenty to separate natural (~-1)
    from flat (~0) — while staying engine-bitwise-exact. The slope
    is emitted as the exact integer fraction (slope_num, slope_den)
    per the trend_report convention: slope = num/den, negative for
    Zipf-like decay; den = 0 when fewer than 2 distinct (x, y)
    points (emitted as-is).

    Plan shape — NO per-term rank is ever materialized (the r5
    version ranked the full vocabulary under one unpartitioned
    row_number, a single-task sort over ~1e7+ terms at 100 TB —
    the r5 verdict's flagged wall): because y = bits(cf) is
    constant across a tie group and the tie group occupies the
    consecutive rank run [start, start+n), the multiset of (x, y)
    points is a PURE FUNCTION of the frequency histogram
    (cf -> n_terms). So: one explode + (token) map-combined count
    (the only corpus-sized shuffle), collapse to the distinct-cf
    histogram (#distinct frequencies ~ O(sqrt(total_tokens)) —
    orders of magnitude below vocab), rank-run starts via the
    two-level decomposition (bit-bucket-of-cf offsets over a
    <=63-row relation + per-bucket local cumsum; (bits(cf) DESC,
    cf DESC) == cf DESC, so no unpartitioned window ever sees a
    data-sized relation), then each run [start, end] splits into
    its <=63 intersecting rank-bit buckets in closed form
    (explode over sequence(bits(start), bits(end))), and a one-row
    aggregate. Point multiset — and therefore (slope_num,
    slope_den) — bit-identical to the ranked formulation
    (pytest-pinned). BIGINT overflow headroom: n*Sxy <=
    V * (V*max_x*max_y) with max_x, max_y <= 63 — safe through
    vocab ~ 3e7; beyond that, fit over the top-3e7 ranks (the head
    defines the exponent).

    Output (one row): vocab_size, total_tokens, n_points,
    slope_num, slope_den — all BIGINT.
    """
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    # distinct-frequency histogram: cf -> number of terms at that cf
    hist = (
        freq.groupBy("cf")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__yb", (F.length(F.bin("cf")) - 1).cast("long"))
    )
    # rank-run start per cf under cf-DESC order, without ANY
    # unpartitioned window: the offset of bit bucket b is the term
    # count of all HIGHER buckets (higher cf ranks first), built by
    # exploding each histogram row into the buckets below its own
    # (<=63 rows each, histogram-sized total) and re-aggregating —
    # zero windows; the only window left is the within-bucket local
    # cumsum, partitioned by bucket (buckets split the histogram
    # geometrically). sequence() is guarded because Spark generates
    # DESCENDING sequences when start > stop (yb = 0 must
    # contribute nothing, not [0, -1]).
    contrib = hist.where(F.col("__yb") > 0).select(
        F.explode(
            F.sequence(F.lit(0), (F.col("__yb") - 1).cast("int"))
        ).alias("__b"),
        "__n",
    )
    boff = contrib.groupBy("__b").agg(F.sum("__n").alias("__boff"))
    w_loc = (
        Window.partitionBy("__yb")
        .orderBy(F.desc("cf"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runs = (
        hist.join(
            F.broadcast(boff), hist["__yb"] == boff["__b"], "left"
        )
        .drop("__b")
        .withColumn("__boff", F.coalesce(F.col("__boff"), F.lit(0)))
        .withColumn(
            "__start",
            (
                F.col("__boff")
                + F.coalesce(F.sum("__n").over(w_loc), F.lit(0))
                + 1
            ).cast("long"),
        )
        .withColumn("__end", (F.col("__start") + F.col("__n") - 1))
    )
    # split each rank run into its intersecting x = bits(rank)
    # buckets: count of ranks r in [start, end] with bits(r) = x is
    # the overlap of [start, end] and [2^x, 2^(x+1) - 1]
    two_x = F.expr("shiftleft(1L, cast(__x AS INT))")
    exp = runs.select(
        "__yb",
        "__start",
        "__end",
        F.explode(
            F.sequence(
                (F.length(F.bin("__start")) - 1).cast("int"),
                (F.length(F.bin("__end")) - 1).cast("int"),
            )
        ).alias("__x"),
    ).select(
        F.col("__x").cast("long").alias("__x"),
        F.col("__yb").alias("__y"),
        (
            F.least(F.col("__end"), two_x * 2 - 1)
            - F.greatest(F.col("__start"), two_x)
            + 1
        ).alias("__cnt"),
    )
    stats = exp.agg(
        F.coalesce(F.sum("__cnt"), F.lit(0)).alias("__n"),
        F.sum(F.col("__cnt") * F.col("__x")).alias("__sx"),
        F.sum(F.col("__cnt") * F.col("__y")).alias("__sy"),
        F.sum(F.col("__cnt") * F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__cnt") * F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    totals = hist.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("vocab_size"),
        F.sum(F.col("cf") * F.col("__n")).alias("total_tokens"),
    )
    return totals.crossJoin(F.broadcast(stats)).select(
        F.col("vocab_size").cast("bigint").alias("vocab_size"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("__n").cast("bigint").alias("n_points"),
        (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        .cast("bigint")
        .alias("slope_den"),
    )


def cooccurrence_pairs(
    docs: DataFrame,
    window: int = 3,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """GloVe-style windowed term co-occurrence counts — the
    preprocessing pass of count-based embeddings (GloVe, PPMI-SVD)
    and the raw material of collocation mining at corpus scale
    (arXiv:1406.5018-adjacent; pmi_collocations scores ADJACENT
    pairs, this counts ALL pairs within a +-window).

    Every (t_i, t_j) pair with 0 < j - i <= window counts once,
    keyed on the UNORDERED pair (least, greatest) so 'a b' and
    'b a' accumulate together. A token repeated inside one window
    co-occurs with itself (a==b rows) — real signal for repetition-
    heavy corpora, kept.

    Plan shape: the pair explode is MAP-SIDE — a transform-with-
    index over the token array zips each token against its
    following window slice, flatten + one explode; the only
    corpus-sized shuffle is the (a, b)-keyed count with map-side
    combine (pair cardinality ~ vocab^2-bounded, observed-pairs in
    practice). The top-k cut is a distributed TakeOrdered heap
    (orderBy + limit), never a global sort. At 100 TB this is the
    canonical "build the co-occurrence matrix" job: one shuffle of
    16-byte-ish pair keys; window size multiplies map output, not
    shuffle keys.

    Output: (a, b, n_cooc bigint), top_k rows by
    (n_cooc DESC, a, b) — the deterministic tie order.
    """
    toks = F.filter(tokens(text_col), lambda t: t != "")
    pair_lists = F.transform(
        toks,
        lambda x, i: F.transform(
            F.slice(toks, i + F.lit(2), F.lit(window)),
            lambda y: F.struct(
                F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
            ),
        ),
    )
    return (
        docs.select(F.explode(F.flatten(pair_lists)).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cooc"))
        .orderBy(F.desc("n_cooc"), F.asc("a"), F.asc("b"))
        .limit(top_k)
    )


def vocab_growth(
    docs: DataFrame,
    n_buckets: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct
    vocabulary vs cumulative tokens, sampled at n_buckets points
    along the doc-id order — the corpus-health diagnostic that
    answers "is new data still adding new language, or are we
    re-crawling the same text?" (V(n) ~ K*n^beta for fresh natural
    text, beta~0.5; a flattening curve means saturation/duplication;
    pairs with zipf_fit which reads the same health from the
    frequency axis).

    Scale shape: "cumulative distinct" is NOT computed by scanning
    in order — each term contributes its FIRST-APPEARANCE doc
    (one vocab-sized min aggregate), first appearances and token
    counts bucket by doc-id range (bounds from a 1-row broadcast
    aggregate, the Q11/densify_hours pattern), and the cumulative
    sums run over the n_buckets-row relation only. Corpus cost: one
    token explode feeding BOTH aggregates; nothing corpus-sized is
    ever sorted or windowed. Buckets with no docs zero-fill from a
    sequence spine so the curve is always exactly n_buckets points.

    Output: (bucket, n_tokens, n_new_terms, cum_tokens, cum_vocab)
    — all BIGINT, bucket 0..n_buckets-1 ascending.
    """
    from pyspark.sql import Window

    toks = (
        docs.select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
    )
    bounds = docs.agg(
        F.min(id_col).alias("__lo"),
        (F.max(id_col) - F.min(id_col) + 1).alias("__span"),
    )

    def bucket(idc: Column) -> Column:
        # floor((id - lo) * B / span). FLOOR of the double quotient,
        # not a bare BIGINT cast: Spark's cast truncates but DuckDB's
        # rounds, so only floor agrees across engines. The numerator
        # (id - lo) * B is exact in double while < 2^53 — ids at 1e12
        # docs x B=20 still clear it by 400x.
        return F.floor(
            (idc - F.col("__lo")) * F.lit(n_buckets) / F.col("__span")
        ).cast("bigint")

    tok_counts = (
        toks.join(F.broadcast(bounds))
        .groupBy(bucket(F.col("__id")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    first_seen = toks.groupBy("term").agg(F.min("__id").alias("__first"))
    new_terms = (
        first_seen.join(F.broadcast(bounds))
        .groupBy(bucket(F.col("__first")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_terms"))
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket")
    ).select(F.col("bucket").cast("bigint").alias("bucket"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(tok_counts, "bucket", "left")
        .join(new_terms, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_new_terms", F.lit(0)).cast("bigint").alias("n_new_terms"),
        )
        .select(
            "bucket",
            "n_tokens",
            "n_new_terms",
            F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
            F.sum("n_new_terms").over(w).cast("bigint").alias("cum_vocab"),
        )
    )


def nb_classify(
    docs: DataFrame,
    class_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    holdout_mod: int = 10,
) -> DataFrame:
    """Multinomial Naive Bayes source classifier in exact whole-bit
    arithmetic — the fastText/CCNet-style domain classifier closing
    the loop on ``chi2_features``: train token likelihoods per class
    on docs with ``id % holdout_mod != 0``, classify the held-out
    rest by minimum total surprisal.

    Scoring is the bigram_surprisal/heldout_perplexity whole-bits
    contract (libm log differs across engines at the ulp; float
    sums are shuffle-order-dependent): per token position the
    add-one-smoothed class surprisal
    ``bits(c,t) = floor(log2((total_c + V) / (c_tc + 1)))`` is an
    exact BIGINT, plus a per-class prior ``floor(log2(N/n_c))``
    counted once. Prediction = argmin of the integer score, ties to
    the lexicographically smallest class — bit-identical on any
    engine and partitioning.

    Scale shape — the DELTA formulation keeps vocabulary misses out
    of the join entirely: score(c) = prior_c + n_tokens·default_c
    + Σ_present (bits(c,t) − default_c), where
    ``default_c = bits(c, unseen)`` depends only on the class. So
    the only corpus-sized joins are (a) held tokens ⋈ the
    (class, token) count relation on token — each held token expands
    only by the number of classes that actually CONTAIN it, never by
    |classes| — and (b) a broadcast of the classes-sized constants
    table; per-(doc, class) partial sums combine map-side. Docs from
    classes absent in train still classify (across train classes).

    Emits one row per held-out doc with non-NULL text: (doc_id,
    source, predicted, score_bits, n_tokens, hit). A NULL-text doc
    has no token evidence to score and is dropped (both twins
    agree); a NULL source still classifies and counts as a miss
    (hit = 0).
    """
    cls = F.col(class_col).cast("string")
    train_docs = docs.where(F.col(id_col) % holdout_mod != 0)
    held_docs = docs.where(F.col(id_col) % holdout_mod == 0)

    tr = train_docs.select(
        cls.alias("cand"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    cells = tr.groupBy("cand", "tok").agg(F.count(F.lit(1)).alias("c_tc"))
    totals = cells.groupBy("cand").agg(F.sum("c_tc").alias("total_c"))
    vocab = cells.agg(F.count_distinct("tok").alias("v"))
    priors = train_docs.groupBy(cls.alias("cand")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    n_train = train_docs.agg(F.count(F.lit(1)).alias("n_train"))

    # classes-sized constants: default (unseen-token) bits and prior
    consts = (
        totals.join(F.broadcast(priors), "cand")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_train))
        .select(
            "cand",
            "total_c",
            "v",
            _floor_log2_ratio(
                F.col("total_c") + F.col("v"), F.lit(1)
            ).alias("default_bits"),
            _floor_log2_ratio(F.col("n_train"), F.col("n_c")).alias(
                "prior_bits"
            ),
        )
    )

    held = held_docs.select(
        F.col(id_col).alias("doc_id"),
        cls.alias("source"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    per_doc = held.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    # present-token deltas: bits(c,t) - default_c <= 0, only for
    # (token, class) pairs the train corpus actually contains
    deltas = (
        held.join(cells, "tok")
        .join(F.broadcast(consts.select("cand", "total_c", "v")), "cand")
        .select(
            "doc_id",
            "cand",
            (
                _floor_log2_ratio(
                    F.col("total_c") + F.col("v"), F.col("c_tc") + 1
                )
                - _floor_log2_ratio(F.col("total_c") + F.col("v"), F.lit(1))
            ).alias("delta"),
        )
        .groupBy("doc_id", "cand")
        .agg(F.sum("delta").alias("delta_sum"))
    )
    scored = (
        per_doc.crossJoin(
            F.broadcast(consts.select("cand", "default_bits", "prior_bits"))
        )
        .join(deltas, ["doc_id", "cand"], "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "cand",
            (
                F.coalesce(F.col("delta_sum"), F.lit(0))
                + F.col("n_tokens") * F.col("default_bits")
                + F.col("prior_bits")
            ).alias("score"),
        )
    )
    best = F.min(F.struct(F.col("score"), F.col("cand"))).alias("m")
    return (
        scored.groupBy("doc_id", "source", "n_tokens")
        .agg(best)
        .select(
            "doc_id",
            "source",
            F.col("m.cand").alias("predicted"),
            F.col("m.score").cast("bigint").alias("score_bits"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            # NULL-safe: a NULL source is a miss (0), not NULL — the
            # oracle's CASE WHEN = THEN 1 ELSE 0 semantics
            F.coalesce(
                (F.col("m.cand") == F.col("source")).cast("bigint"),
                F.lit(0),
            ).alias("hit"),
        )
    )


def ngram_overlap(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    id_a: str = "id_a",
    id_b: str = "id_b",
    n: int = 2,
) -> DataFrame:
    """ROUGE-N-style exact n-gram overlap between PAIRED texts — the
    eval primitive behind summarization/paraphrase scoring and the
    quantitative half of a dedup audit ("HOW similar are the pairs
    the LSH stage flagged?"). Per pair: n-gram counts of each side
    and the CLIPPED multiset intersection Σ_g min(cnt_a(g), cnt_b(g))
    (the ROUGE clipping — a gram repeated 10× in A and once in B
    matches once). Precision = overlap/n_b, recall = overlap/n_a are
    display-time divisions; only exact BIGINTs cross engines (the
    retrieval_eval contract).

    Scale shape: per-side gram explode keyed by (pair, gram) into
    ONE map-side-combined aggregate carrying both sides' counts
    (conditional sums — no self-join), then a pair-keyed rollup.
    The shuffle carries one row per DISTINCT (pair, gram), never
    positions; gram strings can be xxhash64-narrowed by callers via
    a pre-projection if pair texts are huge.

    Emits (id_a, id_b, n_grams_a, n_grams_b, n_overlap). Pairs where
    either side has fewer than ``n`` tokens contribute zero grams on
    that side (overlap 0, never NULL).
    """
    # positional (multiset) shingles: ROUGE clipping is about COUNTS,
    # and the default distinct=True would collapse every repeat
    a_grams = shingles(tokens(F.col(text_a)), n, distinct=False)
    b_grams = shingles(tokens(F.col(text_b)), n, distinct=False)
    base = pairs.select(
        F.col(id_a).alias("id_a"),
        F.col(id_b).alias("id_b"),
        a_grams.alias("__ga"),
        b_grams.alias("__gb"),
    )
    exploded = base.select(
        "id_a",
        "id_b",
        F.explode(
            F.concat(
                F.transform(
                    "__ga", lambda g: F.struct(g.alias("g"), F.lit(1).alias("s"))
                ),
                F.transform(
                    "__gb", lambda g: F.struct(g.alias("g"), F.lit(2).alias("s"))
                ),
            )
        ).alias("e"),
    ).select("id_a", "id_b", F.col("e.g").alias("g"), F.col("e.s").alias("s"))
    per_gram = exploded.groupBy("id_a", "id_b", "g").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).alias("cb"),
    )
    rolled = per_gram.groupBy("id_a", "id_b").agg(
        F.sum("ca").cast("bigint").alias("n_grams_a"),
        F.sum("cb").cast("bigint").alias("n_grams_b"),
        F.sum(F.least("ca", "cb")).cast("bigint").alias("n_overlap"),
    )
    # pairs whose BOTH sides were too short for any gram vanish in
    # the explode; restore them with zero counts (left join back)
    return (
        base.select("id_a", "id_b")
        .join(rolled, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce("n_grams_a", F.lit(0)).cast("bigint").alias("n_grams_a"),
            F.coalesce("n_grams_b", F.lit(0)).cast("bigint").alias("n_grams_b"),
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
        )
    )


def signed_floor_log2_ratio(num: Column, den: Column) -> Column:
    """floor(log2(num/den)) for positive BIGINTs, EITHER side larger.

    Extends :func:`_floor_log2_ratio` (which requires num >= den) to
    ratios below one: with e = floor(log2(den/num)), den/num lies in
    [2^e, 2^(e+1)), so num/den lies in (2^-(e+1), 2^-e] and the floor
    is -e exactly when num·2^e == den, else -(e+1). Pure integer
    shifts and compares — no float, no libm, bit-identical across
    engines (the bigram_surprisal determinism argument).
    """
    pos = _floor_log2_ratio(num, den)
    e = _floor_log2_ratio(den, num)
    exact = F.call_function("shiftleft", num, e.cast("int")) == den
    neg = F.when(exact, -e).otherwise(-(e + F.lit(1)))
    return F.when(num >= den, pos).otherwise(neg).cast("bigint")


def vocab_jaccard(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the
    corpus-composition screen next to source_overlap_matrix (which
    counts shared near-duplicate DOCUMENTS; this measures shared
    token TYPES): two crawls can share zero documents yet be the
    same register of text (high vocab Jaccard → redundant mixture
    weight), or a "multilingual" source pair can turn out
    vocabulary-disjoint. The standard mixture-design diagnostic
    before pretraining_mix assigns weights.

    No reference twin — extends SURVEY §2.3's corpus-health family.

    Exactness: pure set cardinalities — |Va ∩ Vb|, |Va|, |Vb| as
    BIGINTs over the distinct (source, token) relation (lowercase
    whitespace tokens, empties dropped — the corpus_vocab
    convention); union and Jaccard are display arithmetic from
    exact integers. Zero-overlap pairs emit a REAL row with 0 (the
    full a<b grid comes from the sources relation, not from the
    intersection join — absence of evidence rendered as evidence).

    Scale shape: one explode + map-combined distinct to the
    (source, token) vocabulary (the relation corpus_vocab already
    materializes), per-source sizes in one aggregate, and the
    intersection via ONE token-keyed self-join — each token
    contributes at most S(S−1)/2 pair rows (S = #sources, bounded
    by contract), aggregated map-side to the S²-row pair relation.
    The size grid is a broadcast of two S-row relations. No windows,
    no UDFs.

    Output: (src_a, src_b, n_inter, n_a, n_b, n_union, jaccard) —
    one row per unordered source pair (src_a < src_b).
    """
    vocab = (
        docs.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .where(F.col("__g").isNotNull() & (F.col("__t") != ""))
        .distinct()
        .persist()
    )
    # ^ r10 (ADVICE r9): the vocab relation is referenced ~4 times
    # (sizes + both sides of the intersection self-join); without
    # the lazy persist each reference re-tokenized the corpus —
    # exactly the subplan-reuse lesson rank_correlation fixed.
    sizes = vocab.groupBy(F.col("__g").alias("__s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    inter = (
        vocab.alias("a")
        .join(
            vocab.alias("b"),
            (F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.__g") < F.col("b.__g")),
        )
        .groupBy(
            F.col("a.__g").alias("src_a"), F.col("b.__g").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    grid = (
        sizes.select(F.col("__s").alias("src_a"), F.col("__n").alias("n_a"))
        .join(
            F.broadcast(
                sizes.select(
                    F.col("__s").alias("src_b"), F.col("__n").alias("n_b")
                )
            ),
            F.col("src_a") < F.col("src_b"),
        )
    )
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        grid.join(F.broadcast(inter), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("n_inter", F.lit(0)).cast("bigint").alias("n_inter"),
            "n_a",
            "n_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_inter",
            "n_a",
            "n_b",
            n_union.cast("bigint").alias("n_union"),
            F.when(
                n_union > 0,
                F.round(
                    F.col("n_inter").cast("double") / n_union.cast("double"),
                    6,
                ),
            ).alias("jaccard"),
        )
    )


def token_gini(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source Gini coefficient of the token-type frequency
    distribution — the vocabulary-concentration screen next to
    zipf_fit (slope says HOW the head decays; Gini says how much of
    the mass the head owns): boilerplate-heavy sources concentrate
    token mass in few types (Gini → 1), diverse natural text spreads
    it (lower Gini). The "is this source one template repeated?"
    question before source weighting.

    No reference twin — extends SURVEY §2.3's corpus-health family.

    Exactness: with type frequencies x_(1) <= ... <= x_(k) (k types,
    n total tokens), Gini = Σ_i (2i − k − 1)·x_(i) / (k·n). The
    numerator is EXACT integer arithmetic and — because coefficients
    of a tie run are a permutation-invariant set — independent of
    tie order, so it is bit-deterministic across engines without
    fixing a term order. Emitted DECIMAL(38,0)-as-VARCHAR (the KS/AUC
    numerator convention); the statistic is one rounded double
    division.

    Scale shape (the zipf_fit trick): NO per-term rank window. A run
    of m types with frequency c occupying ascending ranks
    (s, s+m] contributes c·m·(2s + m − k) in closed form, so the
    corpus collapses in one explode + map-combined (group, term)
    count, then to the (group, cf) histogram (#distinct frequencies
    ~ O(sqrt(n)) per group), and every window runs over that
    histogram partitioned by group. One corpus-sized shuffle total.

    Output: (group_col, n_types, n_tokens, gini_num VARCHAR, gini),
    one row per group; gini NULL when the group has no tokens.
    """
    from pyspark.sql import Window

    freq = (
        docs.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .where(F.col("__g").isNotNull() & (F.col("__t") != ""))
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cf"))
    )
    return gini_from_term_counts(freq, group_col=group_col)


def gini_from_term_counts(
    freq: DataFrame, group_col: str = "source"
) -> DataFrame:
    """The post-count half of :func:`token_gini`: the exact Gini
    fraction from a (__g, __t, __cf) term-frequency relation. THAT
    relation (not the cf histogram, which is counts-of-counts and
    does not merge) is the exact MONOID under union + groupBy-sum,
    so a streaming maintainer (streaming/gini.py) folds batch term
    counts and calls this per trigger — identical to the
    full-relation operator by construction (shared code path, pinned
    by the streaming twin, the fano/ks_drift contract)."""
    from pyspark.sql import Window

    hist = freq.groupBy("__g", "__cf").agg(
        F.count(F.lit(1)).cast("bigint").alias("__m")
    )
    w_run = (
        Window.partitionBy("__g")
        .orderBy("__cf")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("__g")
    dec = "decimal(38,0)"
    s = F.coalesce(F.sum("__m").over(w_run), F.lit(0)).cast(dec)
    k = F.sum("__m").over(w_all).cast(dec)
    n = F.sum(F.col("__cf") * F.col("__m")).over(w_all).cast(dec)
    contrib = hist.select(
        "__g",
        k.alias("__k"),
        n.alias("__n"),
        (
            F.col("__cf").cast(dec)
            * F.col("__m").cast(dec)
            * (F.lit(2).cast(dec) * s + F.col("__m").cast(dec) - k)
        ).alias("__c"),
    )
    return contrib.groupBy(F.col("__g").alias(group_col)).agg(
        F.first("__k").cast("bigint").alias("n_types"),
        F.first("__n").cast("bigint").alias("n_tokens"),
        F.sum("__c").cast(dec).cast("string").alias("gini_num"),
        F.when(
            (F.first("__k") > 0) & (F.first("__n") > 0),
            F.round(
                F.sum("__c").cast("double")
                / (
                    F.first("__k").cast("double")
                    * F.first("__n").cast("double")
                ),
                6,
            ),
        ).alias("gini"),
    )


def kn_continuation_counts(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """The deterministic counting half of Kneser–Ney smoothing — the
    LM-quality statistics pass (Chen & Goodman 1999): for each word,
    its unigram count, the number of DISTINCT left contexts
    (N1+(·w) — KN's continuation count: "san" precedes "francisco"
    constantly, but "francisco" follows almost nothing else, so its
    continuation probability is tiny despite a high raw count) and
    distinct right contexts (N1+(w·), the normalizer side). The
    iterative/discounted smoothing that consumes these is a model
    fit; the counts relation itself is pure integer arithmetic and
    oracle-twinned — the kmeans_update_pass / lr_gradient_pass
    pattern applied to LM estimation.

    No reference twin — extends SURVEY §2.3's corpus/LM family.

    p_cont = N1+(·w) / |distinct bigram types| is KN's unigram
    backoff; emitted as the exact integer pair plus one rounded
    double division (6 dp, the cosine-family convention).

    Scale shape: ONE positional-bigram explode feeds a map-combined
    distinct to (left, right) TYPES (the only corpus-sized shuffle;
    16-byte rows after the select), two word-keyed counts over it,
    and a token explode for unigram counts; the global type total is
    a 1-row broadcast cross (the Q11 pattern). Top-k by
    (n_left_ctx DESC, word ASC) is a sort-limit (TakeOrdered — never
    a global window); the rank window runs over k rows.

    Output: (word, c, n_left_ctx, n_right_ctx, n_bigram_types,
    p_cont, rank) — k rows.
    """
    toks = docs.select(tokens(text_col).alias("__ts")).where(
        F.size("__ts") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("__ts", 1, F.size("__ts") - 1).alias("l"),
                F.slice("__ts", 2, F.size("__ts") - 1).alias("r"),
            )
        ).alias("__p")
    ).select(
        F.col("__p.l").alias("__l"), F.col("__p.r").alias("__r")
    ).where((F.col("__l") != "") & (F.col("__r") != ""))
    types = pairs.distinct()
    left_ctx = types.groupBy(F.col("__r").alias("word")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left_ctx")
    )
    right_ctx = types.groupBy(F.col("__l").alias("word")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right_ctx")
    )
    uni = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    total = types.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigram_types")
    )
    from pyspark.sql import Window

    scored = (
        uni.join(left_ctx, "word", "left")
        .join(right_ctx, "word", "left")
        .select(
            "word",
            "c",
            F.coalesce("n_left_ctx", F.lit(0))
            .cast("bigint")
            .alias("n_left_ctx"),
            F.coalesce("n_right_ctx", F.lit(0))
            .cast("bigint")
            .alias("n_right_ctx"),
        )
        .orderBy(F.col("n_left_ctx").desc(), F.col("word"))
        .limit(k)
    )
    w = Window.orderBy(F.col("n_left_ctx").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .crossJoin(F.broadcast(total))
        .select(
            "word",
            "c",
            "n_left_ctx",
            "n_right_ctx",
            "n_bigram_types",
            F.round(
                F.col("n_left_ctx").cast("double")
                / F.col("n_bigram_types").cast("double"),
                6,
            ).alias("p_cont"),
            "rank",
        )
    )


def kl_source_divergence(
    documents: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source unigram KL divergence from the rest of the corpus,
    in WHOLE BITS — the distribution-shift screen at the vocabulary
    level: a source whose token distribution diverges hard from the
    remainder (boilerplate farms, code dumps in a prose corpus,
    wrong-language shards) shows up as high KL(source ‖ rest) long
    before a classifier is trained. The lexical companion to
    distribution_shift_report (which compares numeric feature
    histograms) and dsir_weights (importance ratios per DOCUMENT;
    this scores the SOURCE).

    No reference twin — extends SURVEY §2.3's corpus-statistics
    family.

    Exactness: KL(p‖q) = Σ_w p_w·log2(p_w/q_w) with p_w = c_w/N_s
    (source unigram) and add-1-smoothed rest q_w = (d_w+1)/(N_r+V)
    — so log2(p_w/q_w) = log2(c_w·(N_r+V) / ((d_w+1)·N_s)), a ratio
    of exact BIGINT products measured in whole bits via
    _floor_log2_ratio_signed (libm-free, the bigram_surprisal
    discipline; negative bits when the word is relatively rarer in
    the source). Σ c_w·bits is an exact BIGINT; kl_bits = that sum
    / N_s is the ONE rounded division. Bit-deterministic across
    engines and partitionings. Integer bound: the products need
    c_w·(N_r+V) and (d_w+1)·N_s < 2^63 — about 3·10⁹ corpus tokens;
    beyond that, run per-shard (documented limit, the
    calibration_bins convention).

    Scale shape: one corpus-sized tokenize → (source, word) count
    (map-combined); the per-word rest-count join runs at VOCAB grain
    (word-keyed hash join of two histograms), the totals join at
    SOURCE grain (broadcast). No windows, no UDFs, no collects.

    Output: (source, n_tokens, vocab, sum_bits, kl_bits) — vocab =
    distinct source words, sum_bits = Σ c_w·bits exact BIGINT,
    kl_bits rounded 6dp. Floor-quantized bits make this a LOWER
    estimate within 1 bit/token of true KL.
    """
    from ..functions.text import tokens

    sw = (
        documents.select(
            F.col(group_col).alias("source"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        )
        .where(F.col("source").isNotNull() & (F.col("w") != ""))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    totals = sw.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    word_tot = sw.groupBy("w").agg(
        F.sum("c").cast("bigint").alias("tw")
    )
    glob = sw.agg(
        F.sum("c").cast("bigint").alias("n_all"),
        F.count_distinct("w").cast("bigint").alias("v_all"),
    )
    scored = (
        sw.join(word_tot, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "source",
            "c",
            _floor_log2_ratio_signed(
                F.col("c")
                * (F.col("n_all") - F.col("n_s") + F.col("v_all")),
                (F.col("tw") - F.col("c") + 1) * F.col("n_s"),
            ).alias("bits"),
        )
    )
    out = (
        scored.groupBy("source")
        .agg(F.sum(F.col("c") * F.col("bits")).cast("bigint").alias("sum_bits"))
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "vocab",
            "sum_bits",
            F.round(
                F.col("sum_bits").cast("double") / F.col("n_s").cast("double"),
                6,
            ).alias("kl_bits"),
        )
    )
    # sw feeds the per-source, per-word and global aggregates plus
    # the scored join — expose the lazy pin for caller release.
    out._cached_inputs = [sw]
    return out


def token_entropy(
    documents: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source empirical unigram entropy in WHOLE BITS — the
    diversity-of-vocabulary-use gauge next to token_gini
    (concentration of mass) and kl_source_divergence (divergence
    from the rest): a template farm emitting the same boilerplate
    has low entropy long before dedup sees the pairs, and entropy
    per token is the idealized compression bound compression_ratio
    measures empirically through zlib.

    No reference twin — extends SURVEY §2.3's corpus-statistics
    family.

    Exactness: H = Σ_w p_w·log2(1/p_w) with p_w = c_w/N_s, measured
    as Σ c_w·floor(log2(N_s/c_w)) / N_s — the ratio N_s/c_w is
    always >= 1, so the plain unsigned _floor_log2_ratio bitlen/
    shift-compare construction applies (the bigram_surprisal
    discipline); Σ c_w·bits is an exact BIGINT and the entropy is
    ONE rounded division. Floor quantization makes this a LOWER
    bound within 1 bit/token of true entropy — same contract as the
    surprisal family, stated, not hidden.

    Scale shape: one corpus-sized tokenize → (source, word) count
    (map-combined); per-source totals broadcast back onto the vocab-
    grain histogram. No windows, no UDFs, no collects.

    Output: (source, n_tokens, vocab, sum_bits, entropy_bits) —
    entropy_bits rounded 6dp.
    """
    from ..functions.text import tokens

    # sw feeds the totals aggregate AND the scored join — lazy
    # persist so the corpus tokenize runs once (the rank_correlation
    # subplan-reuse lesson), exposed for caller release.
    sw = (
        documents.select(
            F.col(group_col).alias("source"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        )
        .where(F.col("source").isNotNull() & (F.col("w") != ""))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    totals = sw.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    scored = sw.join(F.broadcast(totals), "source").select(
        "source",
        "c",
        _floor_log2_ratio(F.col("n_s"), F.col("c")).alias("bits"),
    )
    out = (
        scored.groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("bits")).cast("bigint").alias("sum_bits")
        )
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "vocab",
            "sum_bits",
            F.round(
                F.col("sum_bits").cast("double") / F.col("n_s").cast("double"),
                6,
            ).alias("entropy_bits"),
        )
    )
    out._cached_inputs = [sw]
    return out
