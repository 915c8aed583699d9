"""Iterative graph analytics over edge lists: PageRank.

The duplicate-pair graph (MinHash/SimHash candidate pairs) is the
corpus-scale graph a curation pipeline actually owns, and
`dup_degree_report` already ranks its hubs by raw degree. PageRank
is the standard refinement — a doc that near-duplicates OTHER hubs
outranks one with the same degree of leaf neighbors (template pages
and boilerplate clusters surface first), and the same operator runs
provenance graphs (page → linked page) when the corpus carries link
metadata.

Spark-first shape: the classic synchronous iteration as DataFrame
joins — ranks ⋈ edges on src (both sides hash-partitioned on the
node key, so every round reuses one exchange pattern), a map-side
combined sum per dst, and a #nodes-row dangling-mass scalar folded
back via the 1-row-broadcast pattern. Each round ends in
``localCheckpoint(eager=True)`` — the two-stars convention — so
lineage stays flat across iterations instead of doubling (10 rounds
of lazy joins otherwise compile a 2^10-deep plan). Convergence is
geometric in the damping factor; fixed ``iters`` keeps the round
count deterministic (the BPE/kmeans contract: iteration count is
part of the operator's identity, not a runtime race).

Rows-only by nature (float mass diffusion has no SQL twin the
driver could hash bit-identically — sums of doubles are
partition-order sensitive at the ulp); pinned in pytest against a
pure-Python reference to 1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KCoreRoundsExhausted(RuntimeError):
    """kcore_decompose ran out of rounds with nodes still active —
    the decomposition would be partial, so it refuses to return."""


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Directed PageRank with uniform teleport and dangling-mass
    redistribution over an (src, dst) edge list.

    rank_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_t(u)/out(u)
                                   + dangling_t/N)

    where dangling_t is the total rank parked on nodes with no
    out-edges (redistributed uniformly — the standard fix that keeps
    total mass at exactly 1). Undirected graphs pass each edge in
    both directions (then no node dangles).

    Output: (node, rank DOUBLE, out_deg BIGINT) for every node that
    appears as an endpoint. Scale: per round, one co-partitioned
    join + one combined aggregate; the only driver-side values are
    N and the dangling scalar (1-row collects, the kmeans/BPE
    model-sized contract).
    """
    # materialize the edge list once: it is re-joined EVERY round,
    # and a lazy lineage (e.g. the whole MinHash pair pipeline)
    # would re-execute per iteration — the classic iterative-graph
    # trap. One localCheckpoint beats 8 recomputes; the edge list is
    # the dataset an iterative graph algorithm owns by contract.
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0.0).alias("rank"),
            F.lit(0).cast("bigint").alias("out_deg"),
        )
    out_deg = e.groupBy(F.col("__src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = (
        nodes.join(out_deg, "node", "left")
        .select(
            "node", F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg")
        )
        .localCheckpoint(eager=True)
    )
    ranks = base.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    # dangling-node EXISTENCE is a property of the graph, not the
    # iteration: check it once. Undirected pair graphs (every node
    # has an out-edge) then skip the per-round dangling-sum job
    # entirely — at 8 iterations that halves the scheduled jobs.
    has_dangling = base.where(F.col("out_deg") == 0).limit(1).count() > 0
    for _ in range(iters):
        dangling = (
            ranks.where(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
            if has_dangling
            else 0.0
        )
        contrib = (
            ranks.where(F.col("out_deg") > 0)
            .join(e, F.col("node") == F.col("__src"))
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("__in"))
        )
        ranks = base.join(contrib, "node", "left").select(
            "node",
            "out_deg",
            (
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce("__in", F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        # Iteration materialization (r12): WITH dangling nodes each
        # round's dangling sum is a driver action, so the round must
        # be pinned eagerly (the old behavior, unchanged). WITHOUT
        # dangling (undirected pair graphs — every bench caller) the
        # loop is pure dataflow: ranks_i is referenced exactly once
        # by round i+1, so the whole `iters`-round recurrence stays
        # ONE lazy plan executed by the caller's single action.
        # Per-round eager localCheckpoints cost `iters` scheduled
        # jobs and erase partitioning info (ExistingRDD scans plan as
        # UnknownPartitioning, forcing a fresh shuffle of BOTH join
        # sides every round); lazily, the loop-invariant e- and
        # base-side Exchange subtrees are identical every round and
        # ReuseExchange computes each ONCE (guide §2.4 — share one
        # exchange), leaving only the rank-side shuffle per round.
        if has_dangling:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank", "out_deg")


def pagerank_update_pass(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_ppm: int = 850_000,
) -> DataFrame:
    """One synchronous PageRank mass-diffusion step in exact
    fixed-point — the kmeans_update_pass / lr_gradient_pass /
    bpe_pair_counts_pass twin-the-deterministic-half pattern applied
    to the last big rows-only iterative operator (:func:`pagerank`):
    the float fixpoint has no SQL twin (double sums are
    partition-order sensitive), but ONE step from the uniform init
    with every per-edge contribution quantized to integer mass units
    IS an integer relation a DuckDB oracle can hash bit-identically.

    Semantics (SCALE = 1e12 mass units; damping as integer PPM so
    every literal both engines see is an exactly-representable
    integer-valued double, never a 0.15*1e12 float residue):

    - out(u) counts u's out-edges; N counts distinct endpoint nodes;
    - per-edge contribution c(u) = round_even(d_fp / (N·out(u)))
      where d_fp = damping_ppm · SCALE/1e6 — one IEEE divide + one
      half-to-even round per DISTINCT (N, out) pair, bit-equal
      across engines (the kmeans_update_pass round_even contract);
    - rank_fp(v) = round_even(t_fp / N) + Σ_{u→v} c(u)
      + round_even(d_fp · n_dangling / N²) with t_fp the teleport
      numerator (1e6 − damping_ppm) · SCALE/1e6 — integer additions
      from there on, so the sum is partition-order free.

    Quantization parks O(E) half-ulps of mass (≤ E/2 units of 1e-12)
    — documented, not hidden: the fixpoint loop belongs to
    :func:`pagerank`; this pass is the driver-checkable single round.

    Scale shape: one distinct over endpoints, one out-degree
    aggregate, one src-keyed join of the edge list against the
    out-degree relation (corpus-sized, plain shuffle), one
    map-combined per-dst integer sum; N and the dangling count ride
    a 1-row broadcast (the Q11 pattern). Fully lazy — no collect.

    Output: (node, out_deg BIGINT, rank_fp VARCHAR — exact integer
    mass in 1e-12 units, rank DOUBLE — display division rounded 9dp).
    """
    scale_over_ppm = 10**12 // 10**6
    d_fp = float(damping_ppm * scale_over_ppm)
    t_fp = float((10**6 - damping_ppm) * scale_over_ppm)
    dec = "decimal(38,0)"
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).persist()
    # ^ the edge relation feeds nodes (twice, via the union),
    # out-degrees and the contribution join — ~5 references, and an
    # expensive upstream (the registry passes the MinHash pair
    # pipeline) would re-run per reference since Catalyst does not
    # dedupe subplans (the rank_correlation lesson, lazy persist)
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy(F.col("__src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_deg")
    )
    base = nodes.join(out_deg, "node", "left").select(
        "node",
        F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__N"),
        F.sum((F.col("out_deg") == 0).cast("bigint"))
        .cast("bigint")
        .alias("__ndang"),
    )
    contrib = (
        e.join(
            out_deg.select(
                F.col("node").alias("__src"), F.col("out_deg").alias("__o")
            ),
            "__src",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__dst").alias("node"),
            F.bround(
                F.lit(d_fp)
                / (F.col("__N").cast("double") * F.col("__o").cast("double")),
                0,
            )
            .cast(dec)
            .alias("__c"),
        )
        .groupBy("node")
        .agg(F.sum("__c").alias("__in"))
    )
    fp = (
        F.bround(F.lit(t_fp) / F.col("__N").cast("double"), 0).cast(dec)
        + F.coalesce(F.col("__in"), F.lit(0).cast(dec))
        + F.bround(
            F.lit(d_fp)
            * F.col("__ndang").cast("double")
            / (F.col("__N").cast("double") * F.col("__N").cast("double")),
            0,
        ).cast(dec)
    )
    out = (
        base.crossJoin(F.broadcast(tot))
        .join(contrib, "node", "left")
        .select("node", "out_deg", fp.cast(dec).alias("__fp"))
        .select(
            "node",
            "out_deg",
            F.col("__fp").cast("string").alias("rank_fp"),
            F.round(
                F.col("__fp").cast("double") / F.lit(1_000_000_000_000.0), 9
            ).alias("rank"),
        )
    )
    # r10 (ADVICE r9): expose the persisted edge relation so a
    # caller iterating passes can release it once the round's output
    # is materialized (result._cached_inputs[0].unpersist()) instead
    # of pinning one cached relation per round until LRU eviction.
    out._cached_inputs = [e]
    return out


def triangle_count(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Per-node triangle counts over the (undirected) duplicate-pair
    graph — the clustering-structure diagnostic between raw degree
    (dup_degree_report) and full components (dedup_clusters): many
    triangles = genuinely cohesive near-dup cliques (templates,
    mirrors); a high-degree node with NO triangles is a boilerplate
    hub stitching unrelated docs, exactly the node to cut before
    clustering merges half the corpus.

    Scale shape — DEGREE ORIENTATION (Suri & Vassilvitskii's
    "curse of the last reducer" fix): each undirected edge is
    directed from its lower-(degree, id) endpoint, so every
    vertex's out-degree is O(sqrt(m)) even for celebrity hubs; the
    wedge self-join (out-neighbor pairs per source) is therefore
    per-vertex-bounded where the naive adjacency join explodes
    quadratically on hubs. Each triangle is found exactly once, at
    its minimum-order vertex, by closing the wedge against the
    canonical edge set. Joins are plain vertex-keyed shuffles
    (AQE broadcasts the small sides at test scale).

    Input: a candidate-pair relation with canonical doc_a < doc_b
    rows (duplicates tolerated — edges are distinct'd).
    Output: (doc_id, n_tri bigint), one row per node in >=1
    triangle; every triangle credits its 3 corners.
    """
    edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        edges.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    )
    # orient low-(degree, id) -> high; canonical a < b breaks ties
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    directed = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    w1, w2 = directed.alias("w1"), directed.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (F.col("w1.dst") < F.col("w2.dst")),
    ).select(
        F.col("w1.src").alias("x"),
        F.col("w1.dst").alias("y"),
        F.col("w2.dst").alias("z"),
    )
    # close against the canonical (id-ordered) edge set: y < z by id
    tri = wedges.join(
        edges, (F.col("y") == F.col("a")) & (F.col("z") == F.col("b"))
    ).select("x", "y", "z")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )


def kcore_peel_pass(
    pairs: DataFrame,
    k: int = 2,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """One k-core peeling round (Matula & Beck 1983; Batagelj–
    Zaveršnik's distributed variant peels synchronously) over the
    undirected duplicate-pair graph — the kmeans/LPA/pagerank
    twin-the-half pattern applied to coreness: drop every node whose
    degree is below ``k``, then report the SURVIVOR-induced
    subgraph's new degrees. Iterating to fixpoint yields the k-core
    (the honest loop the caller owns — survivors whose new degree
    fell below k are the next round's peel set, visible in the
    output); one round is a driver-checkable relation. On the
    near-dup graph the k-core separates genuinely cohesive template
    clusters from the degree-k fringe that dup_degree_report's raw
    counts and triangle_count's local closure both blur.

    No reference twin — extends SURVEY §2.3's graph family.

    Semantics: edges canonicalize (least/greatest, self-loops
    dropped, distinct); deg0 = full-graph degree; survivors have
    deg0 >= k; deg1 counts only survivor↔survivor edges. Pure
    integer arithmetic — bit-deterministic everywhere.

    Scale shape: one distinct over canonical edges (persisted — the
    degree aggregate and two survivor semi-joins reference it, and
    Catalyst does not dedupe subplans: the rank_correlation /
    pagerank_update_pass lesson), one map-combined degree count, a
    broadcast-eligible survivor join back to the edge list, one more
    map-combined count. No windows, no collects.

    Output: (node, deg0, deg1) for surviving nodes — deg1 = 0 for a
    survivor whose neighbors all peeled.
    """
    edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg0"))
    )
    surv = deg.where(F.col("deg0") >= k)
    kept = (
        edges.join(
            surv.select(F.col("node").alias("a")), "a", "left_semi"
        ).join(surv.select(F.col("node").alias("b")), "b", "left_semi")
    )
    deg1 = (
        kept.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg1"))
    )
    out = surv.join(deg1, "node", "left").select(
        "node",
        "deg0",
        F.coalesce("deg1", F.lit(0)).cast("bigint").alias("deg1"),
    )
    # r10 (ADVICE r9): fixpoint callers should release the round's
    # cached edge relation after materializing the output
    # (result._cached_inputs[0].unpersist()) — kcore_decompose below
    # does exactly this — so iterated rounds don't pin one cached
    # relation each until LRU eviction.
    out._cached_inputs = [edges]
    return out


def kcore_decompose(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 10_000,
) -> DataFrame:
    """Full coreness decomposition (Matula & Beck 1983) by iterated
    synchronous peeling — the honest-fixpoint companion to
    :func:`kcore_peel_pass` (which stays the driver-checkable oracle
    twin; this owns the loop, the pagerank/two-stars convention).
    coreness(v) = the largest k such that v survives in the k-core.

    Algorithm: for k = 1, 2, ... repeatedly peel every ACTIVE node
    whose degree in the surviving subgraph is < k; a node peeled
    while testing level k has coreness k-1. Synchronous peeling is
    order-free, so the result is bit-deterministic (pure integer
    degree compares). The level advances only when a peel round
    removes nothing, so total rounds are O(V) worst case but
    O(max coreness + #peel-waves) in practice — degeneracy of the
    near-dup pair graph is small (tens), not corpus-sized.

    Iteration materialization contract (the pair_pagerank
    convention): each round ``localCheckpoint(eager=True)``s the
    surviving edge/node relations — lineage stays flat instead of
    doubling per round — and the round's driver-side signal is ONE
    1-row count (how many peeled), the kmeans/BPE model-sized
    collect allowance. Superseded checkpoints unpersist as soon as
    the next round materializes (the ADVICE-r9 scoped-release
    pattern), so cache usage is two generations, not one per round.

    Scale shape per round: one map-combined degree aggregate over
    the surviving edges, one broadcast-eligible anti-join of the
    peel set against nodes, two semi-joins filtering edges. No
    windows, no UDFs.

    Output: (node, coreness BIGINT) for every endpoint of the
    canonical pair graph (isolated-by-peeling nodes included).
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    active = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: DataFrame | None = None
    k = 1
    # n_active tracks the loop condition from the checkpoint
    # materializations themselves — no per-round active.isEmpty()
    # probe job (VERDICT r11 #7: fold the per-round driver actions).
    n_active = active.count()
    for _ in range(max_rounds):
        if n_active == 0:
            break
        # ONE degree materialization per round; the min-degree scalar
        # and the peel filter both read it from cache. The min-degree
        # collect (1 row, the kmeans/BPE model-sized allowance) jumps
        # k straight past empty levels: if min __deg >= k, levels
        # k..min produce empty peels by definition, and a node peeled
        # at level min+1 has coreness min — identical output, zero
        # wasted per-level rounds (each previously cost a full degree
        # shuffle + probe jobs).
        deg = (
            edges.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("__deg"))
        )
        adeg = (
            active.join(deg, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__deg"), F.lit(0)).alias("__deg"),
            )
            .localCheckpoint(eager=True)
        )
        mindeg = adeg.agg(F.min("__deg")).collect()[0][0]
        k = max(k, int(mindeg) + 1)
        peel = adeg.where(F.col("__deg") < k).select("node")
        batch = peel.select(
            "node", F.lit(k - 1).cast("bigint").alias("coreness")
        )
        done = batch if done is None else done.unionByName(batch)
        new_active = active.join(peel, "node", "left_anti").localCheckpoint(
            eager=True
        )
        # peel is the SMALL side of the round (a wave, not the
        # surviving bulk): anti-joining edges against it twice beats
        # the old both-endpoint semi-joins against the (large)
        # survivor set; AQE converts either side to broadcast at
        # runtime when it fits, so the shape stays scale-adaptive.
        new_edges = (
            edges.join(
                peel.select(F.col("node").alias("a")), "a", "left_anti"
            )
            .join(
                peel.select(F.col("node").alias("b")), "b", "left_anti"
            )
            .localCheckpoint(eager=True)
        )
        n_active = new_active.count()
        # NOTE: adeg must stay cached — the accumulated `done` union
        # still references this round's peel slice, and a localCheck-
        # pointed RDD cannot be recomputed once unpersisted (same
        # lifetime contract the old per-round peel checkpoints had).
        active.unpersist()
        edges.unpersist()
        active, edges = new_active, new_edges
    else:
        # max_rounds exhausted with nodes still active — a silent
        # return here would hand back a PARTIAL decomposition (the
        # still-active nodes simply get no coreness row), which reads
        # as complete downstream. Fail loudly instead (ADVICE r10).
        if n_active > 0:
            raise KCoreRoundsExhausted(
                f"kcore_decompose: max_rounds={max_rounds} exhausted with "
                f"{n_active} node(s) still active at level k={k}; raise "
                "max_rounds (the loop needs O(max coreness + peel waves) "
                "rounds) or peel with kcore_peel_pass manually"
            )
    out = done if done is not None else spark.createDataFrame(
        [], "node string, coreness bigint"
    )
    return out


def neighborhood_jaccard(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the undirected
    duplicate-pair graph (Liben-Nowell & Kleinberg 2003's
    common-neighbors/Jaccard scores): for every two-hop node pair —
    the pairs that share at least ``min_common`` neighbors — report
    |N(a)∩N(b)| / |N(a)∪N(b)|. On the near-dup graph this is the
    transitivity QC screen: a high-score NON-edge is a pair the LSH
    banding probably missed (dedup_clusters will merge them anyway
    via the shared neighbor, but a verify pass should rescore them);
    a low-score edge is a suspicious bridge between clusters.

    No reference twin — extends SURVEY §2.3's graph family.

    Semantics: edges canonicalize (least/greatest, self-loops
    dropped, distinct); neighborhoods exclude the node itself;
    candidates are UNORDERED two-hop pairs (a < b). ``is_edge``
    flags candidates already connected directly. Pure integer
    counts; jaccard = cn / (deg_a + deg_b − cn) is one rounded
    double division — bit-deterministic everywhere.

    Scale shape: one distinct over canonical edges (persisted — the
    wedge self-join and the is_edge join reference it), degrees via
    one map-combined count, the wedge self-join on the shared
    endpoint (Σ deg² rows — the triangle_count bound, never N²),
    one map-combined pair count, two node-keyed degree joins. No
    windows, no UDFs, no collects.

    100 TB hub cap: Σ deg² is dominated by hot hubs (a boilerplate
    template with 10⁶ near-dups contributes 10¹² wedges), and unlike
    triangle counting the wedge CENTER cannot be degree-oriented
    away — both neighbors legitimately flow through it. Pass
    ``max_center_degree`` to exclude hubs above the cap from acting
    as wedge centers (their edges still count toward deg_a/deg_b and
    is_edge): the standard bounded-wedge approximation — scores
    through surviving centers are exact, pairs ONLY connected
    through capped hubs are missed, and a hub's own neighborhood
    is precisely the cluster dedup_clusters already merges wholesale.
    Default None stays exact (the DuckDB-twin-checkable flavor).

    Output: (node_a, node_b, n_common, deg_a, deg_b, is_edge,
    jaccard 6dp), one row per two-hop pair with n_common >=
    ``min_common``.
    """
    edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    sym = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionByName(edges.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    # lazily persisted (r11): referenced by the deg_a AND deg_b
    # joins (plus the optional hub-cap filter) — each reference
    # otherwise re-runs the |E|-row symmetrize + shuffle; the cache
    # is node-count-sized.
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).persist()
    centers = sym
    if max_center_degree is not None:
        keep = deg.where(F.col("deg") <= max_center_degree).select(
            F.col("node").alias("nbr")
        )
        centers = sym.join(keep, "nbr", "left_semi")
    wedge = (
        centers.alias("l")
        .join(centers.alias("r"), F.col("l.nbr") == F.col("r.nbr"))
        .where(F.col("l.node") < F.col("r.node"))
        .select(
            F.col("l.node").alias("node_a"), F.col("r.node").alias("node_b")
        )
    )
    cn = wedge.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    flagged = cn.join(
        edges.select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            F.lit(1).cast("bigint").alias("__e"),
        ),
        ["node_a", "node_b"],
        "left",
    )
    out = (
        flagged.where(F.col("n_common") >= min_common)
        .join(deg.select(F.col("node").alias("node_a"),
                         F.col("deg").alias("deg_a")), "node_a")
        .join(deg.select(F.col("node").alias("node_b"),
                         F.col("deg").alias("deg_b")), "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            "deg_a",
            "deg_b",
            F.coalesce("__e", F.lit(0)).cast("bigint").alias("is_edge"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    out._cached_inputs = [edges]
    return out


def label_propagation_pass(
    edges: DataFrame,
    labels: DataFrame,
    node_col: str = "node",
    label_col: str = "label",
    a_col: str = "src",
    b_col: str = "dst",
) -> DataFrame:
    """One SYNCHRONOUS label-propagation round (Raghavan et al. 2007)
    over an undirected edge list — the kmeans_update_pass /
    lr_gradient_pass / nn_descent_pass pattern applied to community
    detection: each round is a driver-checkable integer relation
    (neighbor-label vote counts + a deterministic argmax), the
    fixpoint loop honest iteration the caller owns. On the
    duplicate-pair graph this answers "which source-community does
    this doc's near-duplicate neighborhood belong to" — a doc whose
    neighbors vote for ANOTHER source is cross-source contamination
    (mirrors, syndication) that dup_degree_report's raw degree and
    dedup_clusters' components both miss.

    No reference twin — extends SURVEY §2.3's graph family.

    Semantics: edges are symmetrized and distinct'd (self-loops
    dropped); each labeled neighbor votes its CURRENT label;
    new_label = argmax votes with the deterministic (count DESC,
    label ASC) tiebreak — bit-identical across engines and
    partitionings, no float anywhere. Nodes with no labeled
    neighbor keep their own label; unlabeled nodes that receive
    votes adopt the winner (old_label NULL).

    Scale shape: one distinct over the symmetrized edges, one
    node-keyed join to attach neighbor labels (label side is a plain
    shuffle join — corpus-sized, never broadcast), one map-combined
    (node, label) vote count, and a node-partitioned argmax window
    over the vote relation (bounded by distinct neighbor labels per
    node, not degree). No collects, no UDFs.

    Output: (node, old_label, new_label, n_neighbors, top_count) —
    n_neighbors counts LABELED neighbors; top_count the winning
    vote; both 0 for vote-less nodes.
    """
    from pyspark.sql import Window

    sym = (
        edges.select(F.col(a_col).alias("__n"), F.col(b_col).alias("__m"))
        .unionByName(
            edges.select(
                F.col(b_col).alias("__n"), F.col(a_col).alias("__m")
            )
        )
        .where(F.col("__n") != F.col("__m"))
        .distinct()
    )
    lab = labels.select(
        F.col(node_col).alias("__node"), F.col(label_col).alias("__lab")
    )
    votes = (
        sym.join(
            lab.select(
                F.col("__node").alias("__m"), F.col("__lab").alias("__nl")
            ),
            "__m",
        )
        .where(F.col("__nl").isNotNull())
        .groupBy("__n", "__nl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__votes"))
    )
    w = Window.partitionBy("__n").orderBy(
        F.col("__votes").desc(), F.col("__nl").asc()
    )
    picked = (
        votes.withColumn("__rn", F.row_number().over(w))
        .groupBy("__n")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("__nl"))).alias("__win"),
            F.max(F.when(F.col("__rn") == 1, F.col("__votes")))
            .cast("bigint")
            .alias("top_count"),
            F.sum("__votes").cast("bigint").alias("n_neighbors"),
        )
    )
    return (
        lab.join(picked, F.col("__node") == F.col("__n"), "full")
        .select(
            F.coalesce("__node", "__n").alias("node"),
            F.col("__lab").alias("old_label"),
            F.coalesce("__win", "__lab").alias("new_label"),
            F.coalesce("n_neighbors", F.lit(0))
            .cast("bigint")
            .alias("n_neighbors"),
            F.coalesce("top_count", F.lit(0))
            .cast("bigint")
            .alias("top_count"),
        )
    )


def degree_assortativity(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Newman degree assortativity of the undirected duplicate-pair
    graph (Newman 2002): the Pearson correlation of the degree pair
    at the two ends of every edge — positive when high-degree nodes
    link to each other (a template MESH: near-dup hubs citing hubs),
    negative when hubs link to leaves (a boilerplate STAR: one
    template radiating copies). The one-number structural summary
    between dup_degree_report (per-node degrees) and triangle_count
    (local closure); star vs mesh decides whether cluster_keep_best
    keeps one exemplar or a spread.

    No reference twin — extends SURVEY §2.3's dedup-graph family.

    Exactness: over the M = 2m directed orientations of the m
    canonical distinct edges, Σx = Σy and Σx² = Σy² by symmetry, so
    r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) with Σxy = Σ 2·da·db,
    Σx = Σ (da+db), Σx² = Σ (da²+db²) — all exact BIGINT degree
    sums carried as DECIMAL(38,0), VARCHAR-rendered (the fano/KS
    numerator convention); the statistic is ONE rounded double
    division. NULL r for a degree-regular graph (zero variance).

    Scale shape: canonical edges persist (degree aggregate + the
    two degree joins re-reference them — the kcore_peel_pass
    lesson); degrees are one map-combined explode-groupBy; the two
    joins are node-keyed (high cardinality, no hot key unless the
    graph itself is a single star, where the hub row is one key of
    #neighbors rows — bounded by the LSH band contract upstream).
    The moment aggregate is one 1-row reduce. No windows, no UDFs.

    Output: one row (n_nodes, n_edges, r_num VARCHAR, r_den VARCHAR,
    assortativity DOUBLE rounded 6dp).
    """
    dec = "decimal(38,0)"
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # lazily persisted (r11): referenced by BOTH endpoint joins and
    # the n_nodes aggregate — 3 subplan copies of the |E|-row explode
    # + shuffle otherwise; the cache is node-count-sized.
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .persist()
    )
    joined = (
        e.join(deg.select(F.col("node").alias("a"), F.col("d").alias("__da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("__db")), "b")
    )
    m = joined.agg(
        F.count(F.lit(1)).cast(dec).alias("__m"),
        F.sum(F.col("__da") + F.col("__db")).cast(dec).alias("__sx"),
        F.sum(
            F.col("__da") * F.col("__da") + F.col("__db") * F.col("__db")
        )
        .cast(dec)
        .alias("__sxx"),
        F.sum(F.lit(2).cast(dec) * F.col("__da") * F.col("__db"))
        .cast(dec)
        .alias("__sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    big_m = F.lit(2).cast(dec) * F.col("__m")
    num = big_m * F.col("__sxy") - F.col("__sx") * F.col("__sx")
    den = big_m * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    out = m.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        F.col("__m").cast("bigint").alias("n_edges"),
        num.cast(dec).cast("string").alias("r_num"),
        den.cast(dec).cast("string").alias("r_den"),
        F.when(
            den.cast(dec) != F.lit(0).cast(dec),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("assortativity"),
    )
    out._cached_inputs = [e, deg]
    return out
