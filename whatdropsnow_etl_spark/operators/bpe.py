"""Distributed BPE merge training (Sennrich et al., 2016).

The tokenizer-training step an LLM data pipeline runs over its
cleaned corpus. Spark-first shape:

1. ONE pass over the corpus builds the word-frequency histogram —
   the only corpus-sized operation. BPE statistics are a function of
   the histogram, not the corpus (every standard trainer does this),
   so a 100 TB corpus reduces to a vocab-sized relation (~1e6-1e8
   rows) before any iteration starts.
2. Each of the ``n_merges`` rounds counts adjacent symbol pairs
   weighted by word count (explode → groupBy(pair) → sum, map-side
   combined), takes the argmax with a deterministic tiebreak
   (count DESC, pair ASC), and applies the merge to the symbol
   arrays. The argmax is ONE row collected per round — the merge
   table IS the model, mirroring the kmeans codebook contract.
3. Merge application is per-word sequential (positions shift as
   pairs fuse). In TRAINING it runs as a pure-JVM regexp chain over
   the space-joined symbol string (``_merge_expr`` — Java
   ``replaceAll``'s left-to-right resume-after-match scan IS the
   non-overlapping BPE order, so the loop stays in WholeStageCodegen
   with no Python workers, r12). ENCODING applies the whole learned
   table per word with a Zipf-friendly per-worker cache, which the
   Arrow-batched pandas UDF expresses best.

The histogram is localCheckpointed once and each round's result
replaces it, so round N+1 never re-derives rounds 1..N's lineage.

Iterative fixpoint — no SQL oracle (rows-only driver check, like
ann_ivf_trained); correctness is pinned by pytest against a pure-
Python reference BPE on the same corpus (exact merge sequence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END = "</w>"


_RX_META = set("\\^$.|?*+()[]{}")


def _rx_quote(s: str) -> str:
    """Escape every Java-regex metacharacter (char-by-char, not
    \\Q...\\E, which a symbol containing a literal ``\\E`` would
    break)."""
    return "".join("\\" + c if c in _RX_META else c for c in s)


def _repl_quote(s: str) -> str:
    """Escape Java ``Matcher`` replacement metacharacters."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _merge_expr(col, merges):
    """Fuse every non-overlapping (a, b) occurrence, left to right,
    for each merge in rank order — as a pure-JVM regexp chain over
    the space-joined symbol string (guide §4.1: built-ins beat UDFs).

    Java's ``replaceAll`` scans left to right and resumes AFTER each
    replacement, which is exactly the non-overlapping greedy order
    every reference BPE implementation uses (for a run ``a a a`` the
    match at 0-1 consumes both and the lone trailing ``a`` survives).
    Symbols never contain spaces (words are whitespace-split), so the
    space-delimited rendering is unambiguous; the lookaround guards
    pin whole-symbol matches. Replaces the per-round pandas UDF: the
    training loop's histogram updates now stay inside WholeStageCodegen
    with zero Python-worker traffic, and the result is bit-identical
    (same strings, same order).
    """
    s = F.array_join(col, " ")
    for a, b in merges:
        # \A/\z, not ^/$: Java's $ matches before a FINAL newline even
        # without MULTILINE, which would mis-anchor a symbol whose
        # last character is a line terminator.
        pat = "(?<= |\\A)" + _rx_quote(a) + " " + _rx_quote(b) + "(?= |\\z)"
        s = F.regexp_replace(s, pat, _repl_quote(a + b))
    return F.split(s, " ")


def _char_word_histogram(docs: DataFrame, text_col: str) -> DataFrame:
    """The corpus's word-frequency histogram, words split to chars
    plus the ``</w>`` end sentinel — the ONLY corpus-sized pass in
    BPE training (statistics are a function of the histogram)."""
    from ..functions.parallel import ensure_min_parallelism

    # parallelism floor (r12): the tokenize + explode feeding the
    # histogram groupBy otherwise runs on a one-task under-split scan
    docs = ensure_min_parallelism(docs, F.xxhash64(F.col(text_col)))
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.split(F.col("w"), ""),  # chars
                F.array(F.lit(END)),
            ).alias("syms"),
            "freq",
        )
    )


def _adjacent_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of the histogram, weighted by word
    frequency: explode → groupBy(pair) → sum, map-side combined —
    one vocab-sized shuffle, never a corpus-sized one."""
    return (
        words.select(
            F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                "i", "a"
            ),
            F.col("syms"),
            F.col("freq"),
        )
        .select(
            F.col("a"),
            F.element_at("syms", F.col("i") + 2).alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("c"))
    )


def bpe_pair_counts_pass(
    docs: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The deterministic half of ONE BPE training round, as a
    relation (the kmeans_update_pass / lr_gradient_pass pattern
    applied to the last big rows-only trainer): weighted adjacent
    pair counts over the char-split word histogram, ranked by the
    trainer's exact argmax order (count DESC, left ASC, right ASC).
    Rank 1 is precisely the first merge ``bpe_merges`` learns, so
    the pair-count + tiebreak machinery is oracle-checkable even
    though the iterative fixpoint is not SQL-expressible.

    Pure integer arithmetic end to end (counts and sums of counts) —
    bit-identical across engines by construction. The top-k is a
    sort-limit on the pair-count relation (per-partition heaps);
    the ranking window then covers only k rows, so its single
    partition is k-bounded at any corpus scale.
    """
    from pyspark.sql.window import Window

    pairs = _adjacent_pair_counts(_char_word_histogram(docs, text_col))
    order = [F.col("c").desc(), F.col("a").asc(), F.col("b").asc()]
    top = pairs.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            "rank",
            F.col("a").alias("left"),
            F.col("b").alias("right"),
            F.col("c").cast("bigint").alias("pair_count"),
        )
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    checkpoint_every: int = 4,
    init_merges=None,
    merge_batch: int = 1,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns one row per
    merge: (merge_rank BIGINT, left STRING, right STRING,
    pair_count BIGINT), in learned order.

    ``checkpoint_every`` is a pure lineage/job-count dial (results
    are bit-identical): between checkpoints the histogram carries up
    to that many stacked merge UDFs, which re-evaluate over the
    VOCAB-sized relation — cheap — while each eager localCheckpoint
    costs a full materialization job. Checkpointing every round
    (=1) doubled the per-round job count for nothing at bench scale.

    ``init_merges`` (a bpe_merges relation or (left, right) list)
    CONTINUES training from an existing vocabulary: the word
    histogram starts with every existing merge applied and new ranks
    continue after the base table's — the vocab-extension loop that
    `bpe_fertility_report` triggers for a high-fertility slice.
    Only the NEWLY learned merges are returned (concatenate with the
    base table for the combined vocabulary).

    ``merge_batch`` > 1 learns up to that many merges PER pair-count
    round: the round's top pairs are collected once and a greedy
    pass keeps candidates, best-first, whose symbols are pairwise
    disjoint from every already-kept pair's symbols AND merged
    token, then all kept merges apply in ONE stacked UDF pass —
    cutting driver round-trips and Python-UDF stages ~batch× (a
    32k-merge production vocab at batch=1 means 32k scheduler
    round-trips of pure wall-clock). Symbol-disjointness makes the
    kept pairs' occurrence sets invariant under each other's merges,
    so their counts and relative order are exactly what sequential
    training would have seen. Divergence windows (absent, the table
    equals sequential): (1) a merge's DERIVED pairs (containing its
    fused token) enter the histogram only next round, so a derived
    pair that would out-count a later batch member gets interleaved
    earlier by sequential training; (2) a candidate SKIPPED for
    symbol overlap re-counts after the overlapping merge and may
    still out-rank a later batch member. batch=1 (the default)
    remains the reference-exact twin pinned against pure-Python
    BPE; batched equality on non-interfering rounds is pinned
    separately.
    """
    if merge_batch < 1:
        raise ValueError("merge_batch must be >= 1")
    spark = docs.sparkSession
    words = _char_word_histogram(docs, text_col).localCheckpoint(
        eager=True
    )
    base_rank = 0
    if init_merges is not None:
        if isinstance(init_merges, DataFrame):
            init = [
                (r["left"], r["right"])
                for r in init_merges.orderBy("merge_rank").collect()
            ]
        else:
            init = list(init_merges)
        for i, (a, b) in enumerate(init, 1):
            words = words.select(
                _merge_expr(F.col("syms"), [(a, b)]).alias("syms"), "freq"
            )
            if i % checkpoint_every == 0:
                words = words.localCheckpoint(eager=True)
        if init:
            words = words.localCheckpoint(eager=True)
        base_rank = len(init)
    learned: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(learned) < n_merges:
        pairs = _adjacent_pair_counts(words)
        want = min(merge_batch, n_merges - len(learned))
        # over-collect so disjointness rejections still fill the batch;
        # the relation is vocab-sized, the collect is want*4-row-sized
        top = (
            pairs.where(F.col("c") >= 2)
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(max(want * 4, 8))
            .collect()
        )
        if not top:
            break
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            a, b = r["a"], r["b"]
            if a in used or b in used or (a + b) in used:
                continue
            batch.append((a, b, int(r["c"])))
            used.update((a, b, a + b))
            if len(batch) >= want:
                break
        if not batch:
            break
        for a, b, c in batch:
            learned.append((base_rank + len(learned) + 1, a, b, c))
        words = words.select(
            _merge_expr(
                F.col("syms"), [(a, b) for a, b, _ in batch]
            ).alias("syms"),
            "freq",
        )
        rounds += 1
        if rounds % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return spark.createDataFrame(
        learned, "merge_rank bigint, left string, right string, pair_count bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table:
    (doc_id, pos BIGINT, token STRING) — the apply half of the
    train/apply tokenizer loop (:func:`bpe_merges` is the train half).

    ``merges`` is the bpe_merges relation (or a list of
    (left, right) pairs in rank order). The merge table is
    MODEL-sized (n_merges rows), so it is collected once and closed
    over by ONE Arrow-batched UDF that applies every merge in rank
    order per word, with a per-worker word cache (corpus word
    frequency is Zipfian — the cache hit rate is the point).
    Contrast with training, which must re-count pairs between
    rounds: encoding needs no per-round jobs, so the corpus is
    tokenized in a single map-only pass — zero shuffle, linear in
    executors at any scale.

    Per-word concatenation of the emitted tokens reconstructs
    word + '</w>' exactly (pytest-pinned), so the encoding is
    lossless.
    """
    if isinstance(merges, DataFrame):
        mlist = [
            (r["left"], r["right"])
            for r in merges.orderBy("merge_rank").collect()
        ]
    else:
        mlist = [(a, b) for a, b in merges]

    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _encode(col):
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w) + [END]
            for a, b in mlist:
                if len(syms) == 1:
                    break
                out = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = syms
            return syms

        def one(text: str) -> list[str]:
            toks: list[str] = []
            for w in text.lower().split(" "):
                if w:
                    toks.extend(enc_word(w))
            return toks

        return col.map(one)

    _encode.__annotations__ = {"col": pd.Series, "return": pd.Series}
    enc = pandas_udf(_encode, "array<string>")
    from ..functions.parallel import ensure_min_parallelism

    # parallelism floor (r12): the encode UDF otherwise runs in ONE
    # Python worker over a one-task under-split scan
    docs = ensure_min_parallelism(docs, id_col)
    return docs.select(
        F.col(id_col), F.posexplode(enc(F.col(text_col))).alias("pos", "token")
    ).select(
        F.col(id_col), F.col("pos").cast("bigint").alias("pos"), "token"
    )


def bpe_fertility_report(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Tokenizer evaluation per source: fertility (BPE tokens per
    whitespace word) and continuation share — the numbers that
    decide whether a trained vocabulary fits a corpus slice (a
    source whose fertility is far above the corpus mean is paying
    more context budget per word; rising fertility on a new source
    is the standard signal to retrain or extend the vocab).

    One map-only encode pass (the bpe_encode kernel — model-sized
    merge table in the closure, per-worker word cache), one
    aggregate by source. ``n_words`` counts whitespace words,
    ``n_tokens`` the emitted BPE symbols; ``fertility`` divides the
    two exact BIGINTs in double. ``continuation_share`` is the
    fraction of tokens that do NOT end a word (no '</w>' suffix) —
    0 when every word is a single vocab symbol.
    """
    toks = bpe_encode(docs, merges, text_col=text_col, id_col=id_col)
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__t"),
        F.sum(F.col("token").endswith("</w>").cast("bigint")).alias("__w"),
    )
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
    return (
        per_doc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("__w").alias("n_words"),
            F.sum("__t").alias("n_tokens"),
            (F.sum("__t").cast("double") / F.sum("__w")).alias("fertility"),
            (
                (F.sum("__t") - F.sum("__w")).cast("double") / F.sum("__t")
            ).alias("continuation_share"),
        )
    )


def extend_bpe_vocab(
    docs: DataFrame,
    merges: DataFrame,
    n_extra: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Fertility-driven vocabulary extension: find the source slice
    the current vocabulary serves WORST (max fertility in
    :func:`bpe_fertility_report`), continue BPE training on that
    slice (``init_merges=`` continuation — existing merges stay
    fixed, new ranks append), and return the COMBINED merge table.

    The standard domain-adaptation loop: a corpus gains a new source
    (code, another language), its fertility spikes, and extending
    the vocab with merges learned ON that slice brings it back down
    — pytest pins fertility(target) strictly decreasing under the
    extended table. Driver-side work is one fertility report
    (aggregate-sized) and the usual 1-row argmax per new merge;
    ranks stay globally ordered so bpe_encode applies the combined
    table unchanged.
    """
    rep = bpe_fertility_report(
        docs, merges, text_col=text_col, id_col=id_col, source_col=source_col
    )
    worst = (
        rep.orderBy(F.col("fertility").desc(), F.col("source"))
        .limit(1)
        .collect()
    )
    if not worst:
        return merges
    target = worst[0]["source"]
    extra = bpe_merges(
        docs.where(F.col(source_col) == target),
        n_merges=n_extra,
        text_col=text_col,
        init_merges=merges,
    )
    return merges.unionByName(extra)
