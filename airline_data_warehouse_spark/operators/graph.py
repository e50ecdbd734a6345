"""Iterative graph scoring: PageRank over an edge table — the
link-graph importance weighting a web-scale corpus pipeline runs
before quality-weighted sampling (Common-Crawl-style link-graph
curation; Page et al. 1999), and the iterative-graph class the dedup
family's pointer-doubling connected components doesn't cover
(propagation to a FIXPOINT of a numeric score, not a label).

Exact-integer arithmetic throughout (the round-10 PQ-family lesson,
taken as a design rule for every new numeric-iterative operator):
ranks live in micro-units of 1e-12 as BIGINTs, every division is the
integer half-up q = (2a + b) // (2b), and damping multiplies as
(170x + 100) // 200 — so the result is deterministic by ARITHMETIC in
any engine, never by float-rounding convention, and the DuckDB oracle
unrolls the iterations bit-for-bit. The rounded mass drifts from the
true real-valued PageRank by < 1e-12 per node per step (documented,
bounded, and identical everywhere).

Scale shape: per iteration one edges ⋈ ranks ⋈ outdeg join keyed on
src (AQE-planned — the ranks/outdeg sides are node-cardinality), one
dst-keyed sum, and two 1-row scalar aggregates (node count, dangling
mass) that ride as broadcast scalars — the exact_counts precedent.
Nothing is ever corpus² and no rank state lives on the driver;
``iters`` is fixed (the kmeans_assign bounded-iteration convention)
so the oracle can unroll it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators.dedup import _persist


def _round_barrier(df: DataFrame, prev: DataFrame | None) -> DataFrame:
    """Per-round materialization + lineage truncation + cache release
    for the bounded-iteration loops (VERDICT r11 item 4, and a latent
    driver-plan scale bug it exposed): each round's plan references the
    previous round's frame TWICE (pagerank: contribution + dangling;
    label propagation: neighbor join + reassembly; kcore: two degree
    semi-joins), and Catalyst tree transforms copy shared subtrees, so
    WITHOUT truncation driver-side analysis is O(2^iters) — measured on
    a 40-node kcore: 1.8 s at iters=3, 13.9 s at 6, driver heap death
    at 8, independent of data size. localCheckpoint(eager=True)
    materializes the round's rows AND roots the next round's plan at a
    LogicalRDD (the connected_components precedent, dedup.py). The
    previous round's checkpoint blocks are then released immediately —
    they have no reader once this round is materialized — so live
    storage stays O(1) in iters; the FINAL round's blocks stay for the
    caller and are reclaimed by the ContextCleaner when the result
    frame drops. On a cluster where executor loss mid-query matters,
    swap in reliable checkpoint() with a checkpoint dir — same shape,
    durable blocks (the connected_components note)."""
    out = df.localCheckpoint(eager=True)
    if prev is not None:
        _release_checkpoint(prev)
    return out


def _release_checkpoint(df: DataFrame) -> None:
    """Deterministically free a localCheckpoint'ed frame's RDD blocks
    (best-effort: the plan root of such a frame is a LogicalRDD whose
    rdd is the persisted checkpoint). Falls back silently to the
    ContextCleaner's GC-driven cleanup if the internal accessor moves."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _div_halfup(n: Column, d: Column) -> Column:
    """Integer half-up division for non-negative integer micro-units:
    (2n + d) // (2d), computed in DECIMAL(38,0) (the triangle_counts
    precedent) so it is exact at ANY magnitude a graph can produce.
    The r10 long/double path was exact only for numerators ≤ ~2^53;
    label_propagation's numerator 2·Σ(in-neighbor scores) passes that
    once a node has ~4,500 full-score in-neighbors — exactly the
    template-spam/LSH-hub case the operator targets (ADVICE r10-medium;
    pinned by test_label_propagation_high_degree_hub_exact).
    num − num % den is exactly divisible, and dividing exactly-divisible
    DECIMAL(38,0)s yields the exact integer quotient."""
    nd = n.cast("decimal(38,0)")
    dd = d.cast("decimal(38,0)")
    num = F.lit(2).cast("decimal(38,0)") * nd + dd
    den = F.lit(2).cast("decimal(38,0)") * dd
    return ((num - num % den) / den).cast("long")


def _damp(x: Column) -> Column:
    """half-up of 0.85 × x in micro-units: (170x + 100) // 200 — same
    DECIMAL(38,0) discipline as _div_halfup (x is bounded by total rank
    mass ~1.3e12 today, but exactness must not depend on that bound
    holding for every future caller)."""
    num = F.lit(170).cast("decimal(38,0)") * x.cast("decimal(38,0)") \
        + F.lit(100).cast("decimal(38,0)")
    den = F.lit(200).cast("decimal(38,0)")
    return ((num - num % den) / den).cast("long")


def pagerank(edges: DataFrame, iters: int = 3,
             src_col: str = "src", dst_col: str = "dst",
             id_col: str = "node_id",
             seeds: DataFrame | None = None,
             weight_col: str | None = None) -> DataFrame:
    """Damped PageRank (d = 0.85) over a directed edge list, ``iters``
    synchronous iterations, dangling mass redistributed to the teleport
    distribution each step (the standard formulation).

    ``seeds=None`` (default): the classic global variant — teleport is
    uniform over all nodes, start is uniform. With ``seeds`` (a frame
    with an ``id_col`` column): PERSONALIZED PageRank — teleport mass,
    the dangling redistribution, and the start distribution all
    concentrate uniformly on the seed set, so ranks measure relevance
    RELATIVE TO the seeds (random walk with restarts; the
    retrieval/recommendation form — "importance from these anchors'
    point of view"). Seed ids not present in the graph still receive
    teleport mass (they are part of the node set).

    Returns (node_id, rank_micro BIGINT, rank DOUBLE): rank_micro is
    the exact integer result (what the oracle hash-compares); rank is
    rank_micro / 1e12 for human use — the same double in every engine
    because the integer is.

    ``weight_col`` (optional, positive integers — e.g. order totals in
    exact cents): the WEIGHTED random surfer — an edge receives
    halfup(rank × w_e, W_src) where W_src is the source's total
    out-weight, so a node's rank splits proportionally to edge weight
    instead of uniformly. Rows with w ≤ 0 are dropped (zero transition
    probability). The unweighted form is the weighted form at w ≡ 1
    (halfup(rank·1, outdeg) ≡ halfup(rank, outdeg) — bit-identical to
    the r10 certified shape). rank × w runs in DECIMAL(38,0), so no
    magnitude of weight can overflow (the oracle's HUGEINT twin).

    Duplicate edges are NOT collapsed (a multi-edge contributes its
    multiplicity, matching the random-surfer model on a multigraph);
    callers wanting simple-graph semantics pass ``edges.distinct()``.
    Self-loops count as ordinary edges."""
    if weight_col is not None:
        e = (edges.select(F.col(src_col).cast("long").alias("src"),
                          F.col(dst_col).cast("long").alias("dst"),
                          F.col(weight_col).cast("long").alias("w"))
             .filter(F.col("w") > 0))
    else:
        e = edges.select(F.col(src_col).cast("long").alias("src"),
                         F.col(dst_col).cast("long").alias("dst"),
                         F.lit(1).cast("long").alias("w"))
    # loop-invariant frames are cached ONCE (freed by release_caches):
    # every iteration reads e (contribution join), nodes (reassembly)
    # and outw (division) — without the cache each round re-runs the
    # caller's whole edge-building subtree (often a multi-table join)
    e = _persist(e)
    nodes = (e.select(F.col("src").alias(id_col))
             .unionByName(e.select(F.col("dst").alias(id_col)))
             .distinct())
    if seeds is not None:
        sfr = seeds.select(F.col(id_col).cast("long").alias(id_col)) \
                   .distinct()
        nodes = nodes.unionByName(sfr).distinct()
        # teleport membership flag: node-cardinality left-semi marker
        nodes = _persist(
            nodes.join(sfr.withColumn("_p", F.lit(True)), id_col, "left")
                 .select(id_col, F.coalesce("_p", F.lit(False)).alias("_p")))
        # fail fast on an empty teleport set: n = 0 would make every
        # half-up division NULL and propagate an all-null rank column
        # silently (ADVICE r10-low). The count is a 1-row scalar.
        n_seeds = nodes.filter("_p").agg(
            F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        if not n_seeds:
            raise ValueError(
                "pagerank: personalized teleport set is empty after "
                "cast/distinct — seeds must contain at least one id")
        from airline_data_warehouse_spark.operators.frames import (
            jvm_local_frame,
        )
        pcount = jvm_local_frame(nodes.sparkSession,
                                 [(int(n_seeds),)], "n long")
    else:
        nodes = _persist(nodes.withColumn("_p", F.lit(True)))
        pcount = nodes.agg(F.count(F.lit(1)).alias("n"))
    # wsum widens to DECIMAL(38,0) BEFORE aggregation (ADVICE r11-low):
    # a node whose total out-weight passes 2^63 would wrap a BIGINT sum
    # silently (ANSI off) while the oracle's HUGEINT SUM stays exact —
    # the same pre-aggregation class as label_propagation's cnt.
    # _div_halfup consumes it unchanged (it casts to DECIMAL(38,0)
    # anyway).
    outw = _persist(
        e.groupBy(F.col("src").alias(id_col))
         .agg(F.sum(F.col("w").cast("decimal(38,0)")).alias("wsum")))
    # 1-row scalar frame: teleport-set size (the exact_counts broadcast
    # precedent — schema-bounded, never grows)

    scale = F.lit(10 ** 12).cast("long")
    zero = F.lit(0).cast("long")
    ranks = (nodes.crossJoin(F.broadcast(pcount))
             .select(id_col,
                     F.when(F.col("_p"),
                            _div_halfup(scale, F.col("n")))
                      .otherwise(zero).alias("micro")))
    prev_round: DataFrame | None = None
    for _ in range(iters):
        # per-round barrier: materialize, truncate lineage (each round
        # reads ranks twice — contrib + dangling — so un-truncated
        # analysis is O(2^iters)), release the previous round's blocks
        ranks = _round_barrier(ranks, prev_round)
        prev_round = ranks
        if weight_col is not None:
            # per-EDGE contribution halfup(rank·w, W_src): one src-keyed
            # edges ⋈ ranks ⋈ outw join (AQE-planned, node-cardinality
            # sides), arithmetic rides the edge rows inside codegen
            inflow = (e.join(ranks.withColumnRenamed(id_col, "src"), "src")
                      .join(outw.withColumnRenamed(id_col, "src"), "src")
                      .select(F.col("dst"),
                              _div_halfup(
                                  F.col("micro").cast("decimal(38,0)")
                                  * F.col("w"),
                                  F.col("wsum")).alias("c"))
                      .groupBy(F.col("dst").alias(id_col))
                      .agg(F.sum("c").alias("infl")))
        else:
            # unweighted fast path: contribution halfup(rank, outdeg)
            # is PER-NODE (V divisions, not E — at 1e12 edges the
            # per-edge decimal halfup would be pure waste since every
            # edge of a node carries the same value); identical results
            # to the weighted form at w ≡ 1, pinned by
            # test_pagerank_weighted_matches_integer_reference
            contrib = (ranks.join(outw, id_col)
                       .select(id_col,
                               _div_halfup(F.col("micro"),
                                           F.col("wsum")).alias("c")))
            inflow = (e.join(contrib.withColumnRenamed(id_col, "src"),
                             "src")
                      .groupBy(F.col("dst").alias(id_col))
                      .agg(F.sum("c").alias("infl")))
        # dangling mass: ranks of nodes with no out-edges — a 1-row
        # scalar, rides with the teleport count in one broadcast frame
        dang = (ranks.join(outw.select(id_col), id_col, "left_anti")
                .agg(F.coalesce(F.sum("micro"), F.lit(0)).alias("dang")))
        scal = pcount.crossJoin(dang)
        base = F.when(F.col("_p"),
                      _div_halfup(F.lit(150_000_000_000).cast("long"),
                                  F.col("n"))).otherwise(zero)
        dshare = F.when(F.col("_p"),
                        _div_halfup(F.col("dang"),
                                    F.col("n"))).otherwise(zero)
        ranks = (nodes.join(inflow, id_col, "left")
                 .crossJoin(F.broadcast(scal))
                 .select(
                     id_col, "_p",
                     (base
                      + _damp(F.coalesce(F.col("infl"), F.lit(0))
                              + dshare))
                     .alias("micro")))
    return ranks.select(
        id_col, F.col("micro").alias("rank_micro"),
        (F.col("micro") / F.lit(1e12)).alias("rank"))


def label_propagation(nodes: DataFrame, edges: DataFrame,
                      seeds: DataFrame, iters: int = 2,
                      prior_micro: int = 500_000_000_000,
                      id_col: str = "node_id",
                      weight_col: str | None = None) -> DataFrame:
    """Semi-supervised score propagation with clamped seeds (Zhu &
    Ghahramani 2002): every seeded node keeps its seed score at every
    step; every unlabeled node takes the half-up integer MEAN of its
    in-neighbors' previous scores; an unlabeled node with no
    in-neighbors keeps its previous score (the ``prior_micro`` start —
    an uninformative 0.5 by default). The corpus-curation use: spread a
    small human-rated quality subset over the near-dup/similarity
    graph, so unrated documents inherit their cluster's rating before
    quality-weighted sampling.

    Inputs: ``nodes`` (id) — the FULL population, not just graph
    endpoints (isolated documents must still come out, at their seed or
    prior); ``edges`` (src, dst) — influence flows src → dst, pass both
    directions for an undirected similarity graph; ``seeds``
    (id, seed_micro BIGINT in [0, 1e12]).

    ``weight_col`` (optional, positive integers — e.g. the number of
    LSH band collisions a pair shares): the WEIGHTED mean — an
    unlabeled node takes halfup(Σ w·score, Σ w) over its in-edges, so
    stronger-similarity neighbors pull harder. Rows with w ≤ 0 are
    dropped; w ≡ 1 reproduces the unweighted results bit-for-bit
    (halfup(Σ score, count)). w·score runs in DECIMAL(38,0) — exact at
    any magnitude (the weighted-pagerank discipline).

    Integer micro-unit arithmetic throughout (the pagerank discipline):
    deterministic by arithmetic in any engine, oracle-unrollable.
    Per iteration: one edges ⋈ scores join keyed on src, one dst-keyed
    (sum, count) aggregate, one id-keyed reassembly — node-cardinality
    frames only, nothing corpus². Output: (node_id, score_micro,
    score DOUBLE = micro / 1e12, seeded BOOLEAN)."""
    sd = seeds.select(F.col(id_col),
                      F.col("seed_micro").cast("long").alias("_seed"))
    scores = (nodes.select(id_col).join(sd, id_col, "left")
              .select(id_col,
                      F.coalesce("_seed",
                                 F.lit(prior_micro).cast("long"))
                       .alias("score")))
    if weight_col is not None:
        e = (edges.select(F.col("src").cast("long"),
                          F.col("dst").cast("long"),
                          F.col(weight_col).cast("long").alias("w"))
             .filter(F.col("w") > 0))
    else:
        e = edges.select(F.col("src").cast("long"),
                         F.col("dst").cast("long"),
                         F.lit(1).cast("long").alias("w"))
    # loop-invariant: every iteration's neighbor join reads e — cache
    # it once instead of re-running the caller's edge-building subtree
    # (often a band-collision self-join) per round
    e = _persist(e)
    prev_round: DataFrame | None = None
    for _ in range(iters):
        scores = _round_barrier(scores, prev_round)
        prev_round = scores
        # the sums widen to DECIMAL(38,0) BEFORE aggregation: a hub with
        # ~9e6 full-score in-neighbors would wrap a BIGINT sum silently
        # (ANSI off); the oracle's SUM(BIGINT) is HUGEINT — exact — so
        # the Spark side must be too (same ADVICE-r10 class as
        # _div_halfup)
        joined = e.join(scores.withColumnRenamed(id_col, "src"), "src")
        if weight_col is not None:
            inflow = (joined.groupBy(F.col("dst").alias(id_col))
                      .agg(F.sum(F.col("w").cast("decimal(38,0)")
                                 * F.col("score")).alias("tot"),
                           F.sum(F.col("w").cast("decimal(38,0)"))
                            .alias("cnt")))
        else:
            # unweighted fast path: plain sum + count (the r10 certified
            # shape); w ≡ 1 equality pinned by test
            inflow = (joined.groupBy(F.col("dst").alias(id_col))
                      .agg(F.sum(F.col("score").cast("decimal(38,0)"))
                            .alias("tot"),
                           F.count(F.lit(1)).alias("cnt")))
        scores = (scores.join(sd, id_col, "left")
                  .join(inflow, id_col, "left")
                  .select(id_col,
                          F.when(F.col("_seed").isNotNull(),
                                 F.col("_seed"))
                           .when(F.col("cnt").isNull(), F.col("score"))
                           .otherwise(_div_halfup(F.col("tot"),
                                                  F.col("cnt")))
                           .alias("score")))
    return (scores.join(sd, id_col, "left")
            .select(id_col, F.col("score").alias("score_micro"),
                    (F.col("score") / F.lit(1e12)).alias("score"),
                    F.col("_seed").isNotNull().alias("seeded")))


def triangle_counts(edges: DataFrame,
                    id_col: str = "node_id") -> DataFrame:
    """Per-node triangle participation + local clustering coefficient —
    the graph-density diagnostics a similarity/link graph gets profiled
    with (a near-dup graph whose clustering coefficient is ~1 is
    template spam; ~0 is chance collisions).

    Input edges are taken as an UNDIRECTED simple graph: the operator
    canonicalizes to distinct (lo, hi) pairs and drops self-loops, so
    callers may pass either direction or both.

    Spark-first shape — the Suri–Vassilvitskii degree orientation: every
    undirected edge is directed from its (degree, id)-smaller endpoint
    to the larger, so every enumeration fans out from the LOWER-degree
    vertex — the hot high-degree hub never enumerates its own neighbor
    pairs, bounding per-edge work by O(sqrt(|E|)) on any graph (the
    classic MR triangle-counting trick; a naive wedge join is quadratic
    in the hub degree).

    r15 optimization (guide §2.3/§2.4 — shuffle fewer bytes, remove
    exchanges): the r10–r14 shape MATERIALIZED every wedge — Θ(Σ
    C(outdeg, 2)) = O(E^1.5) rows — and shuffled them into a
    closing-edge semi-join (on the dense sf0.1 co-supplier graph: ~253 M
    wedge rows through an Exchange for ~95 M actual triangles). The
    oriented out-adjacency LIST form does the same O(E^1.5) work inside
    one codegen stage instead: attach N+(u) and N+(v) to each oriented
    edge (two node-keyed joins against the V-row adjacency table —
    broadcast when small, node-keyed shuffle of E rows otherwise), and
    `array_intersect` gives exactly the triangle apices w with u→v,
    u→w, v→w. Each triangle is found exactly once (its unique
    apex→middle edge: the sink w has no out-edges inside the triangle),
    only TRUE triangles ever become rows (the witness explode), and the
    wedge Exchange + semi-join disappear. Per-edge intersect cost is
    bounded by min(|N+(u)|, |N+(v)|) ≤ O(sqrt(|E|)) — the same
    Suri–Vassilvitskii bound, with the E^1.5 term moved from shuffled
    rows to in-row array scans. Measured at sf0.1: 24.6 s → 9.3 s
    median-of-5, identical 1000-row output (tools/opt_experiments.py).

    Clustering coefficient in integer micro-units (the module's exact
    rule): cc = halfup(2·T·1e12, d·(d−1)) for d ≥ 2, 0 below.
    Output: (node_id, degree, triangles, clustering_micro, clustering).
    """
    und = (edges.select(F.least("src", "dst").cast("long").alias("a"),
                        F.greatest("src", "dst").cast("long").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    und = _persist(und)
    deg = (und.select(F.col("a").alias(id_col))
           .unionByName(und.select(F.col("b").alias(id_col)))
           .groupBy(id_col).agg(F.count(F.lit(1)).alias("degree")))
    deg = _persist(deg)
    da = deg.select(F.col(id_col).alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col(id_col).alias("b"), F.col("degree").alias("_db"))
    # orient: from the (degree, id)-smaller endpoint to the larger
    lower_first = ((F.col("_da") < F.col("_db"))
                   | ((F.col("_da") == F.col("_db"))
                      & (F.col("a") < F.col("b"))))
    oriented = _persist(
        und.join(da, "a").join(db, "b")
           .select(F.when(lower_first, F.col("a"))
                    .otherwise(F.col("b")).alias("u"),
                   F.when(lower_first, F.col("b"))
                    .otherwise(F.col("a")).alias("v")))
    adj = (oriented.groupBy("u")
           .agg(F.collect_list("v").alias("nbrs")))
    n_u = adj.select("u", F.col("nbrs").alias("_nu"))
    n_v = adj.select(F.col("u").alias("v"), F.col("nbrs").alias("_nv"))
    tri_edges = _persist(
        oriented.join(n_u, "u").join(n_v, "v")
                .select("u", "v",
                        F.array_intersect("_nu", "_nv").alias("_ws"))
                .filter(F.size("_ws") > 0))
    # per-node counts: u and v each join size(_ws) triangles on this
    # edge; every witness w joins one — three corners, each attributed
    # without ever materializing a (u, v, w) row per triangle twice
    uv_counts = (tri_edges.select(F.explode(F.array("u", "v"))
                                  .alias(id_col),
                                  F.size("_ws").cast("long").alias("_c"))
                 .groupBy(id_col).agg(F.sum("_c").alias("triangles")))
    w_counts = (tri_edges.select(F.explode("_ws").alias(id_col))
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).cast("long").alias("triangles")))
    per_node = (uv_counts.unionByName(w_counts)
                .groupBy(id_col).agg(F.sum("triangles").alias("triangles")))
    # cc numerator 2·T·1e12 can pass 2^63 on a dense hub (T > ~2.3e6),
    # so the half-up runs in DECIMAL(38,0): num - num%den is an exact
    # integer decimal, and the division of exactly-divisible decimals
    # is exact at any magnitude here
    two_t = (F.coalesce(F.col("triangles"), F.lit(0)).cast("decimal(38,0)")
             * F.lit(2 * 10 ** 12).cast("decimal(38,0)"))
    dd1 = (F.col("degree") * (F.col("degree") - 1)).cast("decimal(38,0)")
    num = F.lit(2).cast("decimal(38,0)") * two_t + dd1
    den = F.lit(2).cast("decimal(38,0)") * dd1
    cc_micro = F.when(F.col("degree") < 2, F.lit(0).cast("long")) \
        .otherwise(((num - num % den) / den).cast("long"))
    return (deg.join(per_node, id_col, "left")
            .select(id_col, "degree",
                    F.coalesce("triangles", F.lit(0)).cast("long")
                     .alias("triangles"),
                    cc_micro.alias("clustering_micro"),
                    (cc_micro / F.lit(1e12)).alias("clustering")))


def kcore(edges: DataFrame, k: int = 2, iters: int = 8,
          id_col: str = "node_id") -> DataFrame:
    """Bounded-iteration k-core peel — the standard spam/quality
    degeneracy filter a link-graph curation pipeline runs alongside
    PageRank and triangle counting (Seidman 1983: the k-core is the
    maximal subgraph where every node has degree ≥ k; link farms and
    template clusters concentrate in high cores, leaf/orphan pages
    peel away immediately).

    Input edges are taken as an UNDIRECTED simple graph (canonicalized
    to distinct pairs, self-loops dropped — the triangle_counts
    convention). Each iteration removes every node whose degree WITHIN
    the surviving subgraph is < k; ``iters`` is FIXED (the kmeans_assign
    bounded-iteration convention) so the DuckDB oracle unrolls the peel
    bit-for-bit. The peel is idempotent at its fixpoint — extra
    iterations after convergence are no-ops — so on graphs that
    converge within ``iters`` the output IS the exact k-core; otherwise
    it is the deterministic ``iters``-step upper bound (documented,
    identical in every engine).

    Scale shape: per iteration two node-keyed left-semi joins (edge
    endpoints against the survivor set) and one node-keyed count — all
    edge-linear, nothing corpus². The survivor set only shrinks, so
    per-iteration cost is non-increasing.

    Output: (node_id, core_degree) for nodes alive after ``iters``
    peels, where core_degree is the node's degree within the surviving
    subgraph (≥ k whenever the peel has converged)."""
    und = (edges.select(F.least("src", "dst").cast("long").alias("a"),
                        F.greatest("src", "dst").cast("long").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    sym = _persist(
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(und.select(F.col("b").alias("u"),
                                   F.col("a").alias("v"))))

    def _deg(alive: DataFrame) -> DataFrame:
        return (sym.join(alive.withColumnRenamed(id_col, "u"), "u",
                         "left_semi")
                .join(alive.withColumnRenamed(id_col, "v"), "v",
                      "left_semi")
                .groupBy(F.col("u").alias(id_col))
                .agg(F.count(F.lit(1)).alias("core_degree")))

    alive = sym.select(F.col("u").alias(id_col)).distinct()
    prev_round: DataFrame | None = None
    for _ in range(iters):
        alive = _round_barrier(alive, prev_round)
        prev_round = alive
        alive = (_deg(alive).filter(F.col("core_degree") >= k)
                 .select(id_col))
    return _deg(_round_barrier(alive, prev_round))


def degree_profile(edges: DataFrame, id_col: str = "node_id") -> DataFrame:
    """Graph shape diagnostics: degree histogram + Newman (2002) degree
    assortativity — the profile a link/similarity graph gets read with
    before curation decisions (a near-complete histogram head is
    template spam; strongly negative assortativity is a hub-and-leaf
    crawl frontier; ~0 is chance collisions). Completes the profiling
    trio with triangle_counts (local density) and kcore (degeneracy).

    Input: undirected simple graph (canonicalized like triangle_counts:
    distinct (lo, hi) pairs, self-loops dropped).

    Assortativity in EXACT integer arithmetic (the module rule): with
    per-edge endpoint degrees (j, k), M edges, and integer sums
    Sjk = Σ j·k, Ss = Σ (j+k), Sq = Σ (j²+k²), Newman's r reduces to
    r = (4·M·Sjk − Ss²) / (2·M·Sq − Ss²) — numerator and denominator
    are exact DECIMAL(38,0) integers, the single double division is of
    identical doubles in every engine, rounded 6 dp. A regular graph
    (every degree equal) has denominator 0 → NULL, not a crash.

    Output rows (stat, k, value):
      ('degree_hist', degree, n_nodes) · one per distinct degree
      ('nodes', -1, n) ('edges', -1, M) ('max_degree', -1, d_max)
      ('assortativity', -1, r)

    Scale shape: one edge-keyed canonicalization, one node-keyed degree
    count, two node-keyed joins to attach endpoint degrees, then one
    global aggregate of four scalars and a degree-keyed histogram —
    everything edge-linear, the exchanges schema- or degree-bounded."""
    und = (edges.select(F.least("src", "dst").cast("long").alias("a"),
                        F.greatest("src", "dst").cast("long").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    und = _persist(und)
    deg = _persist(
        und.select(F.col("a").alias(id_col))
           .unionByName(und.select(F.col("b").alias(id_col)))
           .groupBy(id_col).agg(F.count(F.lit(1)).alias("degree")))
    hist = (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).cast("double").alias("value"))
            .select(F.lit("degree_hist").alias("stat"),
                    F.col("degree").cast("long").alias("k"), "value"))
    da = deg.select(F.col(id_col).alias("a"),
                    F.col("degree").alias("_ja"))
    db = deg.select(F.col(id_col).alias("b"),
                    F.col("degree").alias("_kb"))
    d38 = "decimal(38,0)"
    j, k = F.col("_ja").cast(d38), F.col("_kb").cast(d38)
    sums = (und.join(da, "a").join(db, "b")
            .agg(F.count(F.lit(1)).cast(d38).alias("m"),
                 F.sum(j * k).alias("sjk"),
                 F.sum(j + k).alias("ss"),
                 F.sum(j * j + k * k).alias("sq")))
    nodes_n = deg.agg(F.count(F.lit(1)).cast("double").alias("n"),
                      F.max("degree").cast("double").alias("dmax"))
    num = F.lit(4).cast(d38) * F.col("m") * F.col("sjk") \
        - F.col("ss") * F.col("ss")
    den = F.lit(2).cast(d38) * F.col("m") * F.col("sq") \
        - F.col("ss") * F.col("ss")
    r = F.when(den == 0, F.lit(None).cast("double")) \
        .otherwise(F.round(num.cast("double") / den.cast("double"), 6)
                   + 0.0)
    scalars = (sums.crossJoin(F.broadcast(nodes_n))
               .select(F.explode(F.array(
                   F.struct(F.lit("nodes").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("n").alias("value")),
                   F.struct(F.lit("edges").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("m").cast("double").alias("value")),
                   F.struct(F.lit("max_degree").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("dmax").alias("value")),
                   F.struct(F.lit("assortativity").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            r.alias("value")))).alias("s"))
               .select("s.stat", "s.k", "s.value"))
    return hist.unionByName(scalars)


def component_profile(labels: DataFrame, id_col: str = "doc_id",
                      label_col: str = "cluster_id") -> DataFrame:
    """Connectivity profile of a labeled vertex set: component-size
    histogram + scalar summary — the one graph read a curation pipeline
    does over a near-dup pair graph that the profiling trio
    (triangles / k-core / degree profile) doesn't emit. A giant
    component is a templated-spam farm or a crawler trap; a long tail
    of pairs/triples is ordinary incremental editing; the singleton
    count is the fraction of the corpus dedup leaves untouched
    (VERDICT r11 item 6).

    Input: (id_col, label_col) — one row per vertex with its component
    label, i.e. exactly what dedup.connected_components returns. This
    function is pure aggregation over that certified output: per-label
    size, then a size-keyed histogram and four scalars.

    Output rows (stat, k, value):
      ('size_hist', size, n_components) · one per distinct size
      ('components', -1, count) ('vertices', -1, n)
      ('max_size', -1, largest) ('singletons', -1, size-1 components)

    Scale shape: one label-keyed count (components are the grouping
    key — never corpus²), one size-keyed count (histogram, bounded by
    the number of DISTINCT sizes), one scalar aggregate. All exchanges
    key- or schema-bounded; nothing iterative, nothing driver-side."""
    sizes = _persist(labels.groupBy(F.col(label_col).alias("_c"))
                     .agg(F.count(F.lit(1)).alias("size")))
    hist = (sizes.groupBy("size")
            .agg(F.count(F.lit(1)).cast("double").alias("value"))
            .select(F.lit("size_hist").alias("stat"),
                    F.col("size").cast("long").alias("k"), "value"))
    scalars = (sizes.agg(
                   F.count(F.lit(1)).cast("double").alias("c"),
                   F.sum("size").cast("double").alias("n"),
                   F.max("size").cast("double").alias("mx"),
                   F.sum(F.when(F.col("size") == 1, 1).otherwise(0))
                    .cast("double").alias("s1"))
               .select(F.explode(F.array(
                   F.struct(F.lit("components").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("c").alias("value")),
                   F.struct(F.lit("vertices").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("n").alias("value")),
                   F.struct(F.lit("max_size").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("mx").alias("value")),
                   F.struct(F.lit("singletons").alias("stat"),
                            F.lit(-1).cast("long").alias("k"),
                            F.col("s1").alias("value")))).alias("s"))
               .select("s.stat", "s.k", "s.value"))
    return hist.unionByName(scalars)


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int = 3,
             src_col: str = "src", dst_col: str = "dst",
             id_col: str = "node_id") -> DataFrame:
    """Bounded-hop BFS distance from a seed set: (node_id, hops) for
    every node reachable in ≤ ``max_hops`` directed hops — the
    link-distance feature a curation pipeline derives around anchor
    content (distance-from-trusted-seeds as a quality prior, the
    crawl-frontier depth read), and the graph family's reachability
    primitive next to the score-propagation (PageRank/LP) and
    structure (k-core/triangles/CC) members.

    Exact integers end to end: hops is an INT min-plus relaxation —
    round i extends every frontier node's distance along its out-edges
    with min() folds, so the result is deterministic in any engine
    with no arithmetic convention at all. Seeds are hops=0 (distinct);
    a seed id absent from the edge set still reports (isolated seed).
    Fixed ``iters`` = max_hops, so the oracle unrolls rounds
    bit-for-bit (the kmeans/kcore bounded-iteration convention).

    Scale shape: per round one src-keyed edges ⋈ frontier join + a
    dst-keyed min + a full-outer fold into the running distance table
    — edge-linear; the distance table only grows toward the reachable
    set. Round plans are localCheckpoint-barriered like every loop in
    this module (_round_barrier: analysis is O(2^iters) without
    truncation; previous round's blocks released)."""
    dist = _round_barrier(
        seeds.select(F.col(id_col).cast("long").alias("v"))
             .distinct()
             .withColumn("hops", F.lit(0).cast("int")),
        None)
    e = _persist(edges.select(F.col(src_col).cast("long").alias("src"),
                              F.col(dst_col).cast("long").alias("dst")))
    for _ in range(max_hops):
        nbr = (e.join(dist, e.src == dist.v)
               .groupBy(F.col("dst"))
               .agg((F.min("hops") + 1).cast("int").alias("nh")))
        merged = (dist.join(nbr, dist.v == nbr.dst, "full")
                  .select(F.coalesce(F.col("v"), F.col("dst")).alias("v"),
                          F.least(F.coalesce(F.col("hops"), F.col("nh")),
                                  F.coalesce(F.col("nh"), F.col("hops")))
                          .alias("hops")))
        dist = _round_barrier(merged, dist)
    return dist.select(F.col("v").alias(id_col), "hops")


def hits(edges: DataFrame, iters: int = 2,
         src_col: str = "src", dst_col: str = "dst",
         id_col: str = "node_id") -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999), ``iters``
    synchronous rounds, exact integer micro-units: the link-analysis
    complement to PageRank — a node is a good AUTHORITY when good hubs
    point at it and a good HUB when it points at good authorities (the
    query-dependent ranking read; in a curation pipeline: directories/
    link farms light up as hubs, canonical content as authorities).

    Departure from the classic (documented, deliberate): normalization
    is L1 (scores halfup-rescaled to total 10¹² each half-step) instead
    of the textbook L2 — L2 needs a square root, which is FLOAT
    territory and breaks the module's deterministic-by-arithmetic rule;
    L1 preserves the eigenvector direction's ORDER and ratios
    identically in any engine, which is what a ranking consumer reads.
    Rounding drift < 1 micro-unit per node per half-step, same bound
    class as pagerank's.

    Returns (node_id, auth_micro, hub_micro, auth, hub) — the doubles
    are micro/1e12 for human use, identical everywhere because the
    integers are. Fixed ``iters`` so the oracle unrolls rounds; loop
    frames are localCheckpoint-barriered (_round_barrier) with the
    previous round's blocks released. Scale shape per half-step: one
    edge-keyed join + a node-keyed sum + a 1-row total that rides as a
    broadcast scalar — edge-linear, the pagerank class."""
    e = _persist(edges.select(F.col(src_col).cast("long").alias("src"),
                              F.col(dst_col).cast("long").alias("dst")))
    nodes = _persist(e.select(F.col("src").alias(id_col))
                     .unionByName(e.select(F.col("dst").alias(id_col)))
                     .distinct())
    ncount = nodes.agg(F.count(F.lit(1)).alias("n"))
    scale = F.lit(10 ** 12).cast("long")
    zero = F.lit(0).cast("long")

    def _renorm(raw: DataFrame, val: str) -> DataFrame:
        """nodes ⟕ raw totals → halfup(raw·10¹², Σraw) per node; an
        edgeless graph half (Σ = 0) yields all-zero scores, not NULLs."""
        tot = raw.agg(F.coalesce(F.sum(val), F.lit(0)
                                 .cast("decimal(38,0)")).alias("t"))
        return (nodes.join(raw, id_col, "left")
                .crossJoin(F.broadcast(tot))
                .select(id_col,
                        F.when(F.col("t") > 0,
                               _div_halfup(
                                   F.coalesce(F.col(val),
                                              F.lit(0).cast("decimal(38,0)"))
                                   * F.lit(10 ** 12).cast("decimal(38,0)"),
                                   F.col("t")))
                        .otherwise(zero).alias("micro")))

    hub = (nodes.crossJoin(F.broadcast(ncount))
           .select(id_col, _div_halfup(scale, F.col("n")).alias("micro")))
    prev_hub: DataFrame | None = None
    prev_auth: DataFrame | None = None
    auth = hub
    for _ in range(iters):
        hub = _round_barrier(hub, prev_hub)
        prev_hub = hub
        araw = (e.join(hub.withColumnRenamed(id_col, "src"), "src")
                .groupBy(F.col("dst").alias(id_col))
                .agg(F.sum(F.col("micro").cast("decimal(38,0)"))
                     .alias("raw")))
        auth = _round_barrier(_renorm(araw, "raw"), prev_auth)
        prev_auth = auth
        hraw = (e.join(auth.withColumnRenamed(id_col, "dst"), "dst")
                .groupBy(F.col("src").alias(id_col))
                .agg(F.sum(F.col("micro").cast("decimal(38,0)"))
                     .alias("raw")))
        hub = _renorm(hraw, "raw")
    # the final barrier releases the LAST round's checkpointed hub too
    # (prev_hub) — the unbarriered renorm above depends only on the
    # checkpointed auth, so prev_hub's blocks are dead here; leaving
    # them to GC-driven ContextCleaner cleanup was the one leak in the
    # module's otherwise-O(1) live-storage loops (ADVICE r12-low)
    hub = _round_barrier(hub, prev_hub)
    return (auth.withColumnRenamed("micro", "auth_micro")
            .join(hub.withColumnRenamed("micro", "hub_micro"), id_col)
            .select(id_col, "auth_micro", "hub_micro",
                    (F.col("auth_micro") / F.lit(1e12)).alias("auth"),
                    (F.col("hub_micro") / F.lit(1e12)).alias("hub")))


def bounded_shortest_paths(edges: DataFrame, seeds: DataFrame,
                           rounds: int = 3, src_col: str = "src",
                           dst_col: str = "dst",
                           weight_col: str = "w",
                           id_col: str = "node_id") -> DataFrame:
    """Bounded-round Bellman–Ford: (node_id, dist) — the minimum total
    edge weight over any path of ≤ ``rounds`` edges from the seed set
    (bfs_hops' weighted sibling; with w ≡ 1 the dist column equals the
    hop count). The cheapest-connection feature over a weighted link
    graph (edit-cost between near-dup revisions, trade-cost distance)
    without an unbounded fixpoint: ``rounds`` is fixed, so the oracle
    unrolls relaxations bit-for-bit.

    Exact integers: dist is a BIGINT min-plus fold (min(dist_v,
    min over in-edges dist_u + w)) — no division, no rounding, no
    arithmetic convention; a negative OR NULL weight RAISES ValueError
    before any relaxation runs (min-plus with bounded rounds is
    well-defined for negatives anyway, but a blocklist distance is
    non-negative by construction, a NULL weight would propagate
    dist=NULL through the min-plus fold, and rejecting early makes
    misuse loud — the module's fail-fast convention, like pagerank's
    empty-seed raise; VERDICT r12 item 2 closed the gap between this
    contract and a former silent per-edge filter, and the NULL arm
    covers what that filter used to drop silently). The guard is a
    1-row limit(1) probe, not a full count. Seeds are dist=0.

    Scale shape: identical to bfs_hops — per round one src-keyed
    edges ⋈ frontier join, a dst-keyed MIN, a full-outer fold;
    edge-linear, rounds localCheckpoint-barriered with previous-round
    block release."""
    e = _persist(edges.select(F.col(src_col).cast("long").alias("src"),
                              F.col(dst_col).cast("long").alias("dst"),
                              F.col(weight_col).cast("long").alias("w")))
    bad = e.filter((F.col("w") < 0) | F.col("w").isNull()) \
           .limit(1).collect()
    if bad:
        w = bad[0]["w"]
        kind = "negative" if w is not None else "NULL"
        raise ValueError(
            f"bounded_shortest_paths: {kind} edge weight "
            f"(src={bad[0]['src']}, dst={bad[0]['dst']}, w={w}) — "
            "min-plus distances here are non-negative by contract; "
            "clean or clamp weights upstream")
    dist = _round_barrier(
        seeds.select(F.col(id_col).cast("long").alias("v"))
             .distinct()
             .withColumn("dist", F.lit(0).cast("long")),
        None)
    for _ in range(rounds):
        nbr = (e.join(dist, e.src == dist.v)
               .groupBy(F.col("dst"))
               .agg(F.min(F.col("dist") + F.col("w")).alias("nd")))
        merged = (dist.join(nbr, dist.v == nbr.dst, "full")
                  .select(F.coalesce(F.col("v"), F.col("dst")).alias("v"),
                          F.least(F.coalesce(F.col("dist"), F.col("nd")),
                                  F.coalesce(F.col("nd"), F.col("dist")))
                          .alias("dist")))
        dist = _round_barrier(merged, dist)
    return dist.select(F.col("v").alias(id_col), "dist")
