"""Distributed logistic-regression quality classifier.

Closes the loop the heuristic filters open: ``gopher_rules`` /
``quality_score`` are hand-tuned gates; the standard next step in a
pre-training pipeline (CCNet arXiv:1911.00359 §4, GPT-3's WebText
classifier) is to TRAIN a lightweight classifier on weak labels and
score the whole corpus with it. The reference (wdn_api.py) has no
analytics at all — this is engine-side capability its users gain.

Architecture (the kmeans/BPE division of labor):

- **Training state is model-sized, data stays distributed.** Each
  gradient-descent iteration is ONE corpus scan reduced map-side to
  k+1 numbers (k features + the loss) — the treeAggregate pattern
  expressed as a DataFrame aggregate; only the k-row gradient is
  collected. Weights live in the driver and enter the next scan as
  literals in a pure Column expression; nothing corpus-sized ever
  reaches the driver.
- **Bit-reproducible distributed training.** Float sums depend on
  partial-aggregation order, so a naive double gradient differs
  run-to-run on a cluster. Here each row's gradient contribution is
  computed in double (deterministic per row), quantized to
  DECIMAL(30,15), and summed EXACTLY — the gradient, and therefore
  every weight at every iteration, is bit-identical under any
  partitioning (pytest-pinned: 1-partition vs 17-partition training
  yields byte-equal weights). The 1e-15 quantization perturbs the
  gradient below float noise.
- **At 100 TB**: train on a sample (``sample_fraction``), score the
  full corpus map-only — scoring is a single codegen'd projection
  with weight literals, embarrassingly parallel. The train scan
  count is ``iters`` (default 30); the feature frame is cached so
  feature extraction runs once, not per-iteration.

Features are standardized with decimal-exact means/variances (same
order-independence argument). Weak labels default to the
``gopher_rules`` conjunction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import STOPWORDS
from ..functions.text import stop_count, tokens

#: feature-name -> Column factory over a text column. Fixed, small,
#: and pure-Column: one narrow projection extracts all of them.
def _feature_cols(text_col: str) -> dict[str, Column]:
    text = F.lower(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_stop = stop_count(toks, STOPWORDS).cast("double")
    n_punct = F.length(F.regexp_replace(text, "[a-z0-9 ]", "")).cast("double")
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    ).cast("double")
    n_types = F.size(F.array_distinct(toks)).cast("double")
    return {
        "log_len": F.log1p(n_tokens),
        "stop_ratio": n_stop / n_tokens,
        "punct_ratio": n_punct / n_chars,
        "mean_word_len": tok_len_sum / n_tokens,
        "ttr": n_types / n_tokens,
    }


_QDEC = "decimal(30,15)"  # gradient/statistic quantization grid


def _exact_mean_std(feat: DataFrame, names: list[str]) -> dict[str, tuple[float, float]]:
    """Per-feature (mean, std) via decimal-exact sums — identical on
    any partitioning. Variance via E[x^2] - E[x]^2 in double over the
    two exact sums; std floors at 1e-9 so constant features don't
    divide by zero (they standardize to 0)."""
    aggs = []
    for c in names:
        d = F.col(c).cast(_QDEC)
        aggs += [
            F.sum(d).cast("double").alias(f"s_{c}"),
            F.sum(d * d).cast("double").alias(f"ss_{c}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = feat.agg(*aggs).collect()[0]
    n = float(row["n"])
    if n == 0:
        raise ValueError(
            "lr_train: no trainable rows after NULL filtering/sampling "
            "(every row had a NULL feature or label, or sample_fraction "
            "selected nothing)"
        )
    out = {}
    for c in names:
        m = row[f"s_{c}"] / n
        var = row[f"ss_{c}"] / n - m * m
        out[c] = (m, max(var, 0.0) ** 0.5 or 1e-9)
    return out


def lr_train(
    df: DataFrame,
    feature_exprs: dict[str, Column],
    label_expr: Column,
    iters: int = 30,
    lr: float = 1.0,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> dict:
    """Train logistic regression by full-batch gradient descent.

    Returns a model dict: ``{"weights": {name: w}, "bias": w0,
    "stats": {name: (mean, std)}, "loss": [per-iter mean NLL]}``.
    Weights apply to STANDARDIZED features; :func:`lr_score` folds
    the standardization back in.
    """
    src = df
    if sample_fraction is not None and sample_fraction < 1.0:
        src = df.sample(fraction=sample_fraction, seed=seed)
    names = list(feature_exprs)
    feat = src.select(
        *[expr.alias(c) for c, expr in feature_exprs.items()],
        label_expr.cast("double").alias("__y"),
    )
    # rows with an undefined feature (e.g. punct_ratio = x/0 -> NULL
    # on an empty doc) or label are EXCLUDED from training: F.sum
    # skips NULLs but counts would include the rows, silently biasing
    # the standardization stats and every gradient's divisor
    cond = F.col("__y").isNotNull()
    for c in names:
        cond = cond & F.col(c).isNotNull()
    feat = feat.where(cond).persist()
    try:
        stats = _exact_mean_std(feat, names)
        std_cols = [
            ((F.col(c) - F.lit(stats[c][0])) / F.lit(stats[c][1])).alias(c)
            for c in names
        ]
        z = feat.select(*std_cols, "__y")

        w = {c: 0.0 for c in names}
        b = 0.0
        n = feat.count()
        losses = []
        for _ in range(iters):
            margin = F.lit(b)
            for c in names:
                margin = margin + F.lit(w[c]) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            err = (p - F.col("__y")).alias("__e")
            row = z.select(*names, "__y", err).agg(
                *[
                    F.sum((F.col("__e") * F.col(c)).cast(_QDEC))
                    .cast("double")
                    .alias(f"g_{c}")
                    for c in names
                ],
                F.sum(F.col("__e").cast(_QDEC)).cast("double").alias("g_b"),
                # mean NLL, same exact-sum treatment (monitoring only)
                F.sum(
                    (
                        -F.col("__y") * F.log(F.greatest(p, F.lit(1e-15)))
                        - (1 - F.col("__y"))
                        * F.log(F.greatest(1 - p, F.lit(1e-15)))
                    ).cast(_QDEC)
                )
                .cast("double")
                .alias("nll"),
            ).collect()[0]
            for c in names:
                w[c] -= lr * row[f"g_{c}"] / n
            b -= lr * row["g_b"] / n
            losses.append(row["nll"] / n)
        return {"weights": w, "bias": b, "stats": stats, "loss": losses}
    finally:
        feat.unpersist()


def lr_score(
    df: DataFrame, model: dict, feature_exprs: dict[str, Column]
) -> Column:
    """Sigmoid score column for ``model`` — a pure codegen'd
    projection (weight and standardization constants are literals),
    map-only at any scale."""
    margin = F.lit(model["bias"])
    for c, expr in feature_exprs.items():
        m, s = model["stats"][c]
        margin = margin + F.lit(model["weights"][c]) * ((expr - F.lit(m)) / F.lit(s))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def quality_lr(
    docs: DataFrame,
    iters: int = 30,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Train on gopher_rules weak labels, score every doc.

    Output (doc_id, weak_label, score_micro): score_micro =
    floor(sigmoid * 1e6) as BIGINT — integer-rendered because the
    training is bit-deterministic, so the scores are too (rows-only
    registry entry by design: the 30-iteration loop has no SQL twin;
    pytest pins partitioning-invariance and a numpy GD reference).
    Docs whose features are undefined (empty text makes punct_ratio
    x/0 -> NULL) are excluded from TRAINING (lr_train's NULL filter)
    and emit score_micro NULL here — explicitly unscoreable, never a
    silently-biased gradient.
    """
    from .textops import gopher_rules

    feats = _feature_cols(text_col)
    # carry the text column through so features and labels come off
    # one relation (no join; gopher_rules is a map-only projection)
    labeled = gopher_rules(
        docs, text_col=text_col, id_col=id_col, extra_cols=(text_col,)
    )
    # (r12) NO parallelism floor here, deliberately: the per-iteration
    # gradient aggregate over the cached feature relation is
    # scheduling-bound, not compute-bound, at parity SFs — flooring it
    # to 32 partitions made each of the 12 iteration jobs schedule 32
    # near-empty tasks and measured SLOWER (8.8 s vs 5.7 s at sf0.1).
    label = F.col("passes").cast("double")
    model = lr_train(
        labeled,
        feats,
        label,
        iters=iters,
        lr=lr,
        sample_fraction=sample_fraction,
    )
    score = lr_score(labeled, model, feats)
    return labeled.select(
        F.col(id_col).alias("doc_id"),
        F.col("passes").cast("bigint").alias("weak_label"),
        F.floor(score * 1e6).cast("bigint").alias("score_micro"),
    )


#: the libm-free feature subset used by the oracle-twinned gradient
#: kernel: pure ratios of small integer counts — every value is one
#: IEEE division, bit-identical across engines. log_len (log1p) is
#: deliberately absent: libm transcendentals are not guaranteed
#: correctly rounded, so a cross-engine twin cannot include them.
def _twin_feature_cols(text_col: str) -> "dict[str, Column]":
    feats = _feature_cols(text_col)
    return {
        k: feats[k]
        for k in ("stop_ratio", "punct_ratio", "mean_word_len", "ttr")
    }


#: quantization grid of the twinned kernel: DECIMAL(18,9) products
#: are DECIMAL(37,18) — inside the 38-digit cap in BOTH engines, so
#: q*q and its sum are exact with no precision-loss rescaling
#: (Spark's (30,15)×(30,15) product would silently round; DuckDB
#: would refuse it).
_TWIN_DEC = "decimal(18,9)"


def lr_gradient_pass(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The engine-exact kernel of :func:`lr_train` as ONE
    declarative relation — the deterministic half of quality_lr that
    a SQL oracle CAN verify (the 30-iteration driver loop on top
    stays rows-only by design): the first full-batch GD gradient at
    weights = 0 (p = 1/2, err = 1/2 − y) over decimal-standardized
    libm-free features with gopher_rules weak labels.

    Everything is exact or IEEE-deterministic: features are integer
    ratios (one division), quantized to the DECIMAL(18,9) grid;
    means/variances come from exact decimal sums (one double
    division + one IEEE sqrt at the end); each row's err·z term is
    re-quantized before the final exact sum, so the gradient is
    BIT-IDENTICAL under any partitioning — the property lr_train's
    pytest pins, here made oracle-checkable. Rows with undefined
    features are excluded (lr_train's NULL-filter contract).

    Scale shape: two corpus scans (stats, then gradient), both
    map-side-combined to 1-row aggregates; the stats row joins back
    as a broadcast crossJoin (the Q11 pattern — fully lazy, no
    driver collect). Emits 5 rows (term, grad) with grad rendered
    DECIMAL-as-VARCHAR (the trend_report/hourly_acf exact-fraction
    idiom).
    """
    from .textops import gopher_rules

    feats = _twin_feature_cols(text_col)
    names = list(feats)
    labeled = gopher_rules(docs, text_col=text_col, id_col=id_col,
                           extra_cols=(text_col,))
    feat = labeled.select(
        *[expr.cast(_TWIN_DEC).alias(c) for c, expr in feats.items()],
        F.col("passes").cast("double").alias("__y"),
    )
    cond = F.col("__y").isNotNull()
    for c in names:
        cond = cond & F.col(c).isNotNull()
    feat = feat.where(cond)

    stats = feat.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(c)).alias(f"__s_{c}") for c in names],
        *[F.sum(F.col(c) * F.col(c)).alias(f"__ss_{c}") for c in names],
    )
    joined = feat.crossJoin(F.broadcast(stats))
    std_cols = []
    for c in names:
        m = F.col(f"__s_{c}").cast("double") / F.col("__n")
        var = F.col(f"__ss_{c}").cast("double") / F.col("__n") - m * m
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        std = F.when(std == 0.0, F.lit(1e-9)).otherwise(std)
        std_cols.append(
            ((F.col(c).cast("double") - m) / std).alias(f"__z_{c}")
        )
    err = (F.lit(0.5) - F.col("__y")).alias("__e")
    z = joined.select(*std_cols, err)
    grad = z.agg(
        *[
            F.sum((F.col("__e") * F.col(f"__z_{c}")).cast(_TWIN_DEC))
            .alias(f"g_{c}")
            for c in names
        ],
        F.sum(F.col("__e").cast(_TWIN_DEC)).alias("g_bias"),
    )
    stack_args = ", ".join(
        [f"'{c}', cast(g_{c} as string)" for c in names]
        + ["'__bias', cast(g_bias as string)"]
    )
    return grad.selectExpr(
        f"stack({len(names) + 1}, {stack_args}) AS (term, grad)"
    )


def active_learning_batch(
    scored: DataFrame,
    k_per_group: int = 10,
    score_col: str = "score",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Max-uncertainty annotation batch: per group, the ``k`` docs
    whose classifier score sits closest to the 0.5 decision boundary
    — the standard active-learning loop step (label where the model
    is least sure; grouped per source so one noisy domain doesn't
    monopolize the annotation budget).

    Uncertainty = |score - 1/2| exactly (one subtraction + abs of
    the already-deterministic score); the per-group cut is the
    salted group_topk primitive (few sources = the one-task-per-
    group window trap), ordered by (uncertainty, id) — a total
    order, so the batch is a pure function of the scores.

    Output: (id, group, score, uncertainty, rank_in_group).
    """
    from .windows import group_topk

    unc = F.abs(F.col(score_col) - F.lit(0.5))
    base = scored.select(
        F.col(id_col), F.col(group_col), F.col(score_col),
        unc.alias("uncertainty"),
    )
    return group_topk(
        base,
        [group_col],
        [F.col("uncertainty").asc(), F.col(id_col).asc()],
        k_per_group,
        id_col,
    )


def classifier_eval(
    preds: DataFrame,
    true_col: str = "source",
    pred_col: str = "predicted",
) -> DataFrame:
    """Per-class evaluation of ANY (true, predicted) relation — the
    scorecard that closes the classifier loop (nb_classify /
    quality_lr / knn_label_vote all emit one): for every class seen
    as truth OR prediction, the exact BIGINT counts
    (n_true, n_pred, n_correct) from which precision (correct/pred),
    recall (correct/true) and F1 are display-time divisions — no
    float aggregate crosses engines (the retrieval_eval contract).

    NULL labels are a real class (unlabeled docs get predicted too):
    the class join is null-safe, so a NULL-truth row counts toward
    its predicted class's n_pred and surfaces as a label=NULL row
    rather than silently vanishing from the report. The correctness
    predicate is null-safe too (``eqNullSafe`` / ``IS NOT DISTINCT
    FROM`` in the oracle): a correct NULL prediction counts toward
    the NULL class's n_correct, so its precision/recall are real
    metrics rather than permanently 0.

    Scale shape: two map-side-combined aggregates over the
    predictions relation to #classes-sized partials, one null-safe
    full-outer join over those — nothing bigger than the class set
    ever shuffles twice.
    """
    t = preds.groupBy(F.col(true_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            F.when(
                F.col(pred_col).eqNullSafe(F.col(true_col)), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )
    p = preds.groupBy(F.col(pred_col).alias("__plabel")).agg(
        F.count(F.lit(1)).alias("__n_pred")
    )
    return (
        t.join(p, F.col("label").eqNullSafe(F.col("__plabel")), "full_outer")
        .select(
            F.coalesce(F.col("label"), F.col("__plabel")).alias("label"),
            F.coalesce(F.col("n_true"), F.lit(0)).cast("bigint").alias("n_true"),
            F.coalesce(F.col("__n_pred"), F.lit(0))
            .cast("bigint")
            .alias("n_pred"),
            F.coalesce(F.col("n_correct"), F.lit(0))
            .cast("bigint")
            .alias("n_correct"),
        )
    )


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    scale: int = 1000000,
) -> DataFrame:
    """Exact ROC-AUC as an integer fraction — the Mann-Whitney U
    rank statistic computed from a (group, score, label) histogram,
    never a global sort: AUC = P(score_pos > score_neg) + ½·P(tie).
    The standard quality-classifier / reranker eval (classifier_eval
    gives thresholded confusion counts; AUC is the
    threshold-free ranking quality those cuts are chosen from).

    No reference twin — the reference (397 LoC ETL) has no
    evaluation; extends SURVEY §2.3's classifier family.

    Exactness at scale: scores quantize to integer ``scale``-ths
    (the distribution_shift_report convention — both engines bucket
    identically), the input collapses in ONE map-combined groupBy to
    per-(group, score) positive/negative counts, and the rank-sum
    unrolls as a cumulative window over that histogram:
    2·U = Σ_s pos(s)·(2·cum_neg(<s) + neg(s)) — whole integers
    (the ×2 absorbs the half-credit tie term), so
    AUC = u2 / (2·P·N) is exact and bit-deterministic; u2 is
    DECIMAL(38,0) (u2 ≤ 2·P·N overflows int64 past ~2×10⁹ rows a
    side), VARCHAR-rendered like the KS numerator. Groups with an
    empty class emit NULL auc rather than a division blow-up.

    Output: (group, n_pos, n_neg, u2 VARCHAR, auc) — auc is the one
    double division, rounded to 6 like the cosine family.
    """
    from pyspark.sql.window import Window

    g = (
        F.col(group_col)
        if group_col is not None
        else F.lit("all")
    )
    h = (
        df.select(
            g.alias("__g"),
            F.round(F.col(score_col) * scale, 0)
            .cast("long")
            .alias("__s"),
            F.col(label_col).cast("bigint").alias("__y"),
        )
        .where(
            F.col("__g").isNotNull()
            & F.col("__s").isNotNull()
            & F.col("__y").isin(0, 1)
        )
        .groupBy("__g", "__s")
        .agg(
            F.sum("__y").cast("bigint").alias("__p"),
            F.sum(1 - F.col("__y")).cast("bigint").alias("__n"),
        )
    )
    return auc_from_histogram(h, group_col=group_col)


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 1000000,
) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) — the
    calibration half of classifier eval next to :func:`auc_exact`
    (AUC says the RANKING is right; calibration says the
    probabilities MEAN what they claim — a quality classifier that
    says 0.9 should be right 90% of the time before its scores gate
    a corpus or weight a mixture). Scores are assumed in [0, 1];
    out-of-range values clamp into the edge bins.

    No reference twin — the reference (397 LoC ETL) has no
    evaluation; extends SURVEY §2.3's classifier family.

    Exactness: scores quantize to integer ``scale``-ths first (the
    auc_exact convention — both engines bucket identically), bin =
    clamp(s_fp·n_bins div scale) in pure integer arithmetic, and
    every per-bin statistic is exact: n, n_pos BIGINT, Σs_fp as
    DECIMAL(38,0)-as-VARCHAR. The calibration gap has an exact
    integer numerator too — |n_pos·scale − Σs_fp| over n·scale —
    so ECE = Σ_b gap_num_b / (N·scale) is ONE exact fraction
    (DECIMAL-as-VARCHAR) + one rounded display division; no
    float-vs-float subtraction ever crosses engines.

    Scale shape: the corpus collapses in ONE map-combined groupBy to
    <= n_bins rows; the ECE total rides a 1-row broadcast back onto
    them (the Q11 pattern). No windows, no UDFs, no collects.

    Output: (bin, n, n_pos, sum_score_fp VARCHAR, mean_score,
    pos_rate, gap, ece_num VARCHAR, ece) — mean/rate/gap/ece are
    display divisions rounded 6dp; ece repeats on every row (it is
    the report's single number).
    """
    dec = "decimal(38,0)"
    s_fp = F.round(F.col(score_col) * scale, 0).cast("long")
    per_bin = (
        df.select(
            s_fp.alias("__s"),
            F.col(label_col).cast("bigint").alias("__y"),
        )
        .where(F.col("__s").isNotNull() & F.col("__y").isin(0, 1))
        .select(
            F.least(
                F.greatest(
                    F.expr(f"__s * {n_bins} div {scale}"),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(n_bins - 1).cast("bigint"),
            )
            .cast("bigint")
            .alias("bin"),
            "__s",
            "__y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__y").cast("bigint").alias("n_pos"),
            F.sum(F.col("__s").cast(dec)).cast(dec).alias("__ss"),
        )
    )
    gap_num = F.abs(
        F.col("n_pos").cast(dec) * scale - F.col("__ss")
    ).cast(dec)
    binned = per_bin.select(
        "bin",
        "n",
        "n_pos",
        F.col("__ss").alias("__ss"),
        gap_num.alias("__gap_num"),
    )
    tot = binned.agg(
        F.sum(F.col("n").cast(dec)).cast(dec).alias("__N"),
        F.sum("__gap_num").cast(dec).alias("__ece_num"),
    )
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        F.col("__ss").cast("string").alias("sum_score_fp"),
        F.round(
            F.col("__ss").cast("double")
            / (F.col("n").cast("double") * float(scale)),
            6,
        ).alias("mean_score"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("pos_rate"),
        F.round(
            F.col("__gap_num").cast("double")
            / (F.col("n").cast("double") * float(scale)),
            6,
        ).alias("gap"),
        F.col("__ece_num").cast("string").alias("ece_num"),
        F.round(
            F.col("__ece_num").cast("double")
            / (F.col("__N").cast("double") * float(scale)),
            6,
        ).alias("ece"),
    )


def token_budget_curve(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    n_bins: int = 10,
    scale: int = 1000000,
) -> DataFrame:
    """Score-threshold sweep vs a weight budget — the question a
    curation pipeline answers before fixing a quality cutoff: "if I
    keep everything scoring above bin b, how many documents and how
    many TOKENS survive?" (the FineWeb/DCLM budget-vs-threshold
    trade). One row per occupied score bin with the cumulative
    count/weight of that bin AND EVERYTHING ABOVE it; read the curve
    from the top until the token budget is hit.

    No reference twin — extends SURVEY §2.3's curation family.

    Exactness: scores quantize to integer ``scale``-ths and bins are
    the :func:`calibration_bins` integer clamp — identical bucketing
    in both engines; counts and weights are exact BIGINT sums and
    the cumulative step is a BOUNDED self-join over the <= n_bins
    histogram rows (b.bin >= a.bin), never a corpus window. The only
    float is the display share, one rounded division.

    Scale shape: ONE map-combined groupBy collapses the corpus to
    <= n_bins rows; everything after is n_bins²-bounded. No windows,
    no UDFs, no collects.

    Output: (bin, n_rows, sum_w, cum_rows, cum_w, cum_w_share) —
    cum_* accumulate from the TOP bin down; cum_w_share = cum_w over
    the relation's total weight, rounded 6dp.
    """
    s_fp = F.round(F.col(score_col) * scale, 0).cast("long")
    per = (
        df.select(
            s_fp.alias("__s"),
            F.col(weight_col).cast("bigint").alias("__w"),
        )
        .where(F.col("__s").isNotNull() & F.col("__w").isNotNull())
        .select(
            F.least(
                F.greatest(
                    F.expr(f"__s * {n_bins} div {scale}"),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(n_bins - 1).cast("bigint"),
            )
            .cast("bigint")
            .alias("bin"),
            "__w",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("__w").cast("bigint").alias("sum_w"),
        )
    )
    return budget_curve_from_bins(per)


def budget_curve_from_bins(per: DataFrame) -> DataFrame:
    """The post-histogram half of :func:`token_budget_curve` — the
    cumulative sweep from the (bin, n_rows, sum_w) histogram. Split
    out (the fano_from_histogram convention) so streaming
    maintenance (streaming/budget.py) reports through the SAME
    arithmetic the batch operator runs."""
    # The histogram relation feeds both sides of the cumulative
    # self-join AND the total aggregate (3 references) — without the
    # lazy persist Catalyst re-runs the full-corpus groupBy behind it
    # each time (the rank_correlation subplan-reuse lesson). n_bins
    # rows, so the pin is trivially cheap.
    per = per.select(
        F.col("bin").cast("bigint").alias("bin"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("sum_w").cast("bigint").alias("sum_w"),
    ).persist()
    hi = per.select(
        F.col("bin").alias("__hb"),
        F.col("n_rows").alias("__hn"),
        F.col("sum_w").alias("__hw"),
    )
    cum = (
        per.join(F.broadcast(hi), F.col("__hb") >= F.col("bin"))
        .groupBy("bin", "n_rows", "sum_w")
        .agg(
            F.sum("__hn").cast("bigint").alias("cum_rows"),
            F.sum("__hw").cast("bigint").alias("cum_w"),
        )
    )
    tot = per.agg(F.sum("sum_w").cast("bigint").alias("__tw"))
    out = cum.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_rows",
        "sum_w",
        "cum_rows",
        "cum_w",
        F.round(
            F.col("cum_w").cast("double") / F.col("__tw").cast("double"), 6
        ).alias("cum_w_share"),
    )
    out._cached_inputs = [per]
    return out


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa between two categorical label columns — the
    chance-corrected agreement score (Cohen 1960) behind
    annotator-agreement checks, silver-vs-gold label audits, and
    "does the cheap heuristic agree with the expensive model beyond
    chance" gates (raw accuracy flatters any pair that both predict
    the majority class; kappa does not).

    No reference twin — extends SURVEY §2.3's classifier family.

    Exactness: with N rows, A agreements, and marginal counts r_i /
    c_i per class, kappa = (p_o − p_e)/(1 − p_e) rewrites over the
    common denominator N² as the exact integer fraction
    (N·A − Σ_i r_i·c_i) / (N² − Σ_i r_i·c_i) — numerator and
    denominator DECIMAL(38,0)-as-VARCHAR (N² overflows int64 past
    ~3e9 rows), the statistic one rounded display division; NULL
    when the denominator is 0 (both raters constant — kappa is
    undefined there by definition).

    Scale shape: one map-combined (N, A) aggregate over the corpus,
    two map-combined marginal counts, and a classes-sized join for
    Σ r·c (class cardinality is bounded by contract); the scalars
    meet in 1-row broadcasts. Rows where either side is NULL are
    excluded (unlabeled ≠ a class — use classifier_eval's null-safe
    matrix to audit those).

    Output: one row (n, n_agree, kappa_num VARCHAR, kappa_den
    VARCHAR, kappa).
    """
    dec = "decimal(38,0)"
    pairs = df.select(
        F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    base = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("__a") == F.col("__b")).cast("bigint"))
        .cast("bigint")
        .alias("n_agree"),
    )
    ra = pairs.groupBy(F.col("__a").alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__r")
    )
    cb = pairs.groupBy(F.col("__b").alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    rc = ra.join(cb, "__k").agg(
        F.coalesce(
            F.sum(F.col("__r").cast(dec) * F.col("__c").cast(dec)),
            F.lit(0).cast(dec),
        )
        .cast(dec)
        .alias("__rc")
    )
    num = F.col("n").cast(dec) * F.col("n_agree").cast(dec) - F.col("__rc")
    den = F.col("n").cast(dec) * F.col("n").cast(dec) - F.col("__rc")
    return base.crossJoin(F.broadcast(rc)).select(
        "n",
        "n_agree",
        num.cast(dec).cast("string").alias("kappa_num"),
        den.cast(dec).cast("string").alias("kappa_den"),
        F.when(
            den != F.lit(0).cast(dec),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def auc_from_histogram(
    h: DataFrame, group_col: str | None = None
) -> DataFrame:
    """The post-histogram half of :func:`auc_exact`: the exact
    Mann-Whitney rank-sum from a (__g, __s, __p, __n) score
    histogram. The histogram is a MONOID under union + groupBy-sum,
    so a streaming maintainer (streaming/auc.py) folds batch
    histograms and calls this per trigger — identical to the
    full-relation operator by construction (shared code path, pinned
    by the streaming twin, the fano/ks_drift contract)."""
    from pyspark.sql.window import Window

    w_below = (
        Window.partitionBy("__g")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("__g")
    dec = "decimal(38,0)"
    cum_n_below = F.coalesce(
        F.sum("__n").over(w_below), F.lit(0)
    ).cast(dec)
    n_pos = F.sum("__p").over(w_all).cast(dec)
    n_neg = F.sum("__n").over(w_all).cast(dec)
    contrib = F.col("__p").cast(dec) * (
        cum_n_below * 2 + F.col("__n").cast(dec)
    )
    scored = h.select(
        "__g",
        n_pos.alias("__np"),
        n_neg.alias("__nn"),
        contrib.alias("__c2"),
    )
    return (
        scored.groupBy("__g")
        .agg(
            F.first("__np").alias("__np"),
            F.first("__nn").alias("__nn"),
            F.sum("__c2").cast(dec).alias("__u2"),
        )
        .select(
            F.col("__g").alias(group_col if group_col else "group"),
            F.col("__np").cast("bigint").alias("n_pos"),
            F.col("__nn").cast("bigint").alias("n_neg"),
            F.col("__u2").cast("string").alias("u2"),
            F.when(
                (F.col("__np") > 0) & (F.col("__nn") > 0),
                F.round(
                    F.col("__u2").cast("double")
                    / (
                        F.lit(2.0)
                        * F.col("__np").cast("double")
                        * F.col("__nn").cast("double")
                    ),
                    6,
                ),
            ).alias("auc"),
        )
    )
