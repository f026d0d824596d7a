"""Graph analytics over edge-list DataFrames — the link-graph signals a
web-corpus curation pipeline ranks crawl frontiers and weights domains
with (Page/Brin/Motwani/Winograd 1999; the simplified dangling-mass-
dropping formulation of the classic MapReduce/Pregel examples).

The library already has connected components (``dedup.dedup_clusters``);
this module adds the iterative-propagation family.

Determinism recipe: ranks are SCALED LONGS end-to-end.  Every update is
integer arithmetic — ``contrib = (rank * damping_x100) DIV (100 *
outdeg)`` (truncating integer division; all operands positive, so DIV ==
floor in both Spark and DuckDB), ``rank' = base + sum(contribs)`` — so N
iterations are bit-reproducible in ANSI SQL and the oracle replays them
as generated unrolled CTEs, the :func:`~.similarity.kmeans_md5`
convention for iterative algorithms.

Scale design (100 TB edge list): one iteration is ONE equi-join
(rank onto edges, key = src) plus ONE partial-aggregated groupBy
(contributions by dst) — hot destinations (the "everyone links to the
homepage" skew) combine map-side; nothing ever sorts, windows, or pulls
to the driver.  The edge+outdeg frame is read every iteration, so it is
pinned once with a lazy ``localCheckpoint`` (the repo's cache-hygiene
convention).  On a real cluster, bucketing the edge table by ``src``
makes the per-iteration join shuffle-free on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 3,
             damping_x100: int = 85, scale: int = 1_000_000,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: str | None = None,
             seeds: list | None = None,
             dangling: str = "drop") -> DataFrame:
    """Integer-scaled PageRank over a directed edge list: ``(node,
    rank_x)`` for every node appearing as a source or destination, where
    ``rank_x`` is the rank scaled by ``scale`` (a long; ``rank_x /
    scale`` is the conventional value).

    Semantics (the simplified classic formulation):

    * init: every node starts at ``scale DIV n_nodes``;
    * each iteration, node ``u`` sends ``(rank_u * damping_x100) DIV
      (100 * outdeg_u)`` along EACH out-edge (parallel edges contribute
      multiply — pre-``distinct()`` the edge list for simple-graph
      semantics);
    * ``rank'_v = base + sum(incoming contributions)`` with ``base =
      (scale * (100 - damping_x100)) DIV (100 * n_nodes)``;
    * dangling nodes (no out-edges) keep receiving; what happens to
      THEIR mass is ``dangling``: ``"drop"`` (default — total mass
      shrinks slightly, relative order is the standard simplified
      formulation) or ``"redistribute"`` (the sum-preserving classic:
      each iteration the danglers' pooled rank ``D`` is damped and
      spread uniformly — every node gains ``(D * damping_x100) DIV
      (100 * n_nodes)``; with ``seeds`` it lands on the seed set
      instead, ``DIV (100 * n_seeds)`` per seed — matching what
      NetworkX/GraphX users expect to cross-check against, up to the
      documented integer truncation).  Exact integer arithmetic
      throughout: any engine reproduces ``rank_x`` bit-for-bit; the
      redistribute variant costs one extra 1-row anti-join aggregate
      per iteration, broadcast back.

    Two standard variants, same integer recipe:

    * ``weight_col`` — WEIGHTED PageRank: the column must carry POSITIVE
      INTEGER edge weights (crawl link counts, click volumes); ``u``
      sends ``(rank_u * damping_x100 * w) DIV (100 * W_u)`` with ``W_u``
      its total out-weight.  Integer headroom: ``rank * 100 * w`` must
      stay under 2^63 (w < ~9e13 at the default scale).
    * ``seeds`` — PERSONALIZED PageRank (topic-sensitive, Haveliwala
      2002): the teleport mass lands only on the seed nodes (init and
      base = ``scale DIV n_seeds`` / ``(scale * (100-d)) DIV (100 *
      n_seeds)`` on seeds, 0 elsewhere) — rank becomes proximity to the
      seed set, the "rank hosts near these trusted domains" query.
      ``seeds`` is a bounded literal list (broadcast into the plan) of
      DISTINCT node ids that must ALL appear in the graph — a stale
      seed would silently shrink the total teleport mass, so the plan
      validates the seed count against the node set and raises
      (``raise_error``, the weight-guard pattern) on a miss.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not 0 <= damping_x100 <= 100:
        raise ValueError("damping_x100 must be in [0, 100]")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    if seeds is not None and not seeds:
        raise ValueError("seeds must be a non-empty list (or None)")
    if dangling not in ("drop", "redistribute"):
        raise ValueError("dangling must be 'drop' or 'redistribute'")
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        # enforce the documented positive-integer contract IN the plan:
        # a zero/negative weight would either divide by zero deep inside
        # iteration 1 or silently break DIV==// cross-engine equality
        w = F.col(weight_col).cast("long")
        cols.append(F.when(w > 0, w)
                    .otherwise(F.raise_error(F.lit(
                        "pagerank: edge weights must be positive "
                        "integers")).cast("long")).alias("__w"))
    e = edges.select(*cols)
    if weight_col is None:
        e = e.withColumn("__w", F.lit(1).cast("long"))
    # pinned like ed below: nodes (and the n1 count built on it) are
    # re-read by EVERY iteration's base/reattach join — unpinned, each
    # round would re-scan and re-distinct the full edge list
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    outdeg = e.groupBy("src").agg(
        F.sum("__w").cast("long").alias("__deg"))
    # read once per iteration — pin lazily (localCheckpoint, never bare
    # persist: CacheManager stays empty, block lifetime follows the frame)
    ed = e.join(outdeg, "src").localCheckpoint(eager=False)
    d = int(damping_x100)
    if seeds is None:
        n1 = F.broadcast(nodes.agg(
            F.count(F.lit(1)).cast("long").alias("__n")))
        rank = (nodes.crossJoin(n1)
                .select("node",
                        F.expr(f"CAST({scale} AS BIGINT) DIV __n")
                         .alias("rank_x")))
        base = (F.expr(f"(CAST({scale} AS BIGINT) * {100 - d}) "
                       f"DIV (100 * __n)"))

        def with_base(incoming, dg=None):
            out = nodes.crossJoin(n1).join(incoming, "node", "left")
            gain = F.lit(0).cast("long")
            if dg is not None:
                out = out.crossJoin(F.broadcast(dg))
                gain = F.expr(f"(__dg * {d}) DIV (100 * __n)")
            return out.select(
                "node",
                (base + gain + F.coalesce(F.col("__in"), F.lit(0)))
                 .cast("long").alias("rank_x"))
    else:
        ns = len(seeds)
        if len(set(seeds)) != ns:
            raise ValueError("pagerank: seeds must be distinct")
        is_seed = F.col("node").isin(*seeds)
        # enforce "every seed exists in the graph" IN the plan (the
        # weight-guard pattern): a stale seed list would silently shrink
        # the teleport mass below the documented scale DIV n_seeds
        # per-seed allocation.  One 1-row aggregate over the (pinned)
        # node set, broadcast into the init frame.
        seed_chk = F.broadcast(nodes.agg(
            F.when(F.sum(F.when(is_seed, 1).otherwise(0)) == ns,
                   F.lit(1))
             .otherwise(F.raise_error(F.lit(
                 "pagerank: every seed must appear in the graph "
                 "(as a source or destination)")).cast("int"))
             .alias("__ok")))
        rank = (nodes.crossJoin(seed_chk)
                .select(
                    "node",
                    (F.when(is_seed, F.lit(int(scale) // ns))
                      .otherwise(F.lit(0)) * F.col("__ok"))
                     .cast("long").alias("rank_x")))
        seed_base = (int(scale) * (100 - d)) // (100 * ns)

        def with_base(incoming, dg=None):
            out = nodes.join(incoming, "node", "left")
            gain = F.lit(0).cast("long")
            if dg is not None:
                out = out.crossJoin(F.broadcast(dg))
                gain = F.when(is_seed,
                              F.expr(f"(__dg * {d}) DIV (100 * {ns})")) \
                        .otherwise(F.lit(0))
            return out.select(
                "node",
                (F.when(is_seed, F.lit(seed_base)).otherwise(F.lit(0))
                 + gain + F.coalesce(F.col("__in"), F.lit(0)))
                 .cast("long").alias("rank_x"))

    rank = rank.localCheckpoint(eager=False)
    # the danglers are a FIXED set (nodes never appearing as a source)
    # — resolve it once, outside the loop, pinned with the node set
    dang_nodes = None
    if dangling == "redistribute":
        dang_nodes = (nodes.join(outdeg.select(F.col("src").alias("node")),
                                 "node", "left_anti")
                      .localCheckpoint(eager=False))
    for _ in range(int(iterations)):
        contrib = (ed.join(rank.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           F.expr(f"(rank_x * {d} * __w) "
                                  f"DIV (100 * __deg)")
                            .alias("__c")))
        incoming = contrib.groupBy("node").agg(
            F.sum("__c").cast("long").alias("__in"))
        dg = None
        if dang_nodes is not None:
            dg = (dang_nodes.join(rank, "node")
                  .agg(F.coalesce(F.sum("rank_x"), F.lit(0))
                        .cast("long").alias("__dg")))
        rank = with_base(incoming, dg).localCheckpoint(eager=False)
    return rank


def hits(edges: DataFrame, iterations: int = 2, scale: int = 1_000_000,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Integer-scaled HITS hubs-and-authorities (Kleinberg 1999) over a
    directed edge list: ``(node, hub_x, auth_x)`` scaled longs in
    ``[0, scale]``.

    Each iteration: authority = sum of in-neighbours' hub scores, hub =
    sum of out-neighbours' NEW authority scores, each vector rescaled so
    its maximum equals ``scale`` (the L-infinity normalization variant —
    a ratio of two exact integers via truncating DIV, unlike the classic
    L2 norm whose sqrt would break cross-engine bit-reproducibility; the
    ranking fixpoint is the same).  All-integer arithmetic end-to-end,
    replayed by generated unrolled CTEs like :func:`pagerank`.

    Scale shape: per iteration two equi-joins on src/dst + two
    partial-agg sums + two 1-row max aggregates broadcast back — no
    windows, no driver pulls.  Parallel edges contribute multiply
    (pre-``distinct()`` for simple-graph semantics).

    Integer headroom: the rescale computes ``raw * scale`` before the
    DIV, and ``raw <= max_degree * scale``, so the graph must satisfy
    ``max_degree * scale^2 < 2^63`` (max degree ~9.2M at the 1e6
    default; drop ``scale`` for denser graphs).  Spark 4's ANSI
    arithmetic raises on overflow rather than wrapping silently."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    ed = e.localCheckpoint(eager=False)
    hub = nodes.select("node", F.lit(int(scale)).cast("long").alias("h"))

    def _norm(df, col):
        mx = F.broadcast(df.agg(
            F.greatest(F.max(col), F.lit(1)).cast("long").alias("__mx")))
        return (df.crossJoin(mx)
                .select("node", F.expr(f"({col} * CAST({scale} AS BIGINT))"
                                       f" DIV __mx").alias(col)))

    for _ in range(int(iterations)):
        auth_raw = (ed.join(hub.withColumnRenamed("node", "src"), "src")
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("h").cast("long").alias("a")))
        auth = _norm(nodes.join(auth_raw, "node", "left")
                     .select("node", F.coalesce("a", F.lit(0))
                             .cast("long").alias("a")), "a") \
            .localCheckpoint(eager=False)
        hub_raw = (ed.join(auth.withColumnRenamed("node", "dst"), "dst")
                   .groupBy(F.col("src").alias("node"))
                   .agg(F.sum("a").cast("long").alias("h")))
        hub = _norm(nodes.join(hub_raw, "node", "left")
                    .select("node", F.coalesce("h", F.lit(0))
                            .cast("long").alias("h")), "h") \
            .localCheckpoint(eager=False)
    return (nodes.join(hub, "node", "left").join(auth, "node", "left")
            .select("node",
                    F.coalesce("h", F.lit(0)).cast("long").alias("hub_x"),
                    F.coalesce("a", F.lit(0)).cast("long").alias("auth_x")))


def label_propagation(edges: DataFrame, iterations: int = 3,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """SYNCHRONOUS label-propagation communities (Raghavan et al. 2007,
    the deterministic synchronous variant) over the undirected view of
    the edge list: ``(node, label)`` after exactly ``iterations``
    rounds, where each round every node simultaneously adopts the most
    frequent label among its neighbours, ties broken by the SMALLEST
    label — the spam-ring / topic-cluster signal a link-graph curation
    pass wants next to PageRank.

    Determinism: classic asynchronous LPA is order-dependent (its
    results change with visit order); the synchronous min-tie-break
    variant is a pure function of the graph, so N rounds replay
    bit-for-bit in ANSI SQL (generated unrolled CTEs, the
    :func:`pagerank` convention).  Synchronous LPA can oscillate on
    bipartite structures — a fixed ``iterations`` makes that
    deterministic too (the caller picks the horizon, as with
    :func:`pagerank`).  Known min-tie-break property: in round 1 every
    neighbour label is distinct, so sparse bridges can leak a small
    label one hop into a neighbouring community before majorities form
    (pytest pins the effect on 3- vs 4-cliques) — communities of
    minimum degree >= 3 separate cleanly.

    Scale shape: per round ONE equi-join (labels onto the doubled edge
    list) + TWO partial-aggregated groupBys — the per-(node, label)
    vote count, then the per-node argmax as ``min(struct(-count,
    label))`` — no windows, no driver pulls; hot nodes combine
    map-side.  Labels init to the node id, so parallel edges vote
    multiply (pre-``distinct()`` for simple-graph votes)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    ue = (e.unionByName(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
          .localCheckpoint(eager=False))
    labels = (ue.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=False))
    for _ in range(int(iterations)):
        votes = (ue.join(labels.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).cast("long").alias("__c")))
        # argmax by (count DESC, label ASC) as a plain aggregate:
        # min(struct(-count, label)) — partial-agg combinable, no window
        labels = (votes.groupBy("node")
                  .agg(F.min(F.struct((-F.col("__c")).alias("nc"),
                                      F.col("label").alias("l")))
                        .alias("__m"))
                  .select("node", F.col("__m.l").alias("label"))
                  .localCheckpoint(eager=False))
    return labels


def k_core(edges: DataFrame, k: int = 2, rounds: int = 8,
           src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """k-core decomposition by iterative peeling over the undirected
    SIMPLE view of the edge list: ``(node, deg)`` for every node still
    alive after exactly ``rounds`` peels, where each peel drops all
    nodes of current degree < ``k`` at once (Batagelj & Zaversnik's
    synchronous formulation) — the "densely-embedded host" signal
    (cores survive, tendrils and isolated chains peel away).

    ``rounds`` bounds the peel like :func:`pagerank`'s ``iterations``
    bounds the walk: synchronous peeling removes at least one node per
    round until fixpoint, so ``rounds`` >= the peel depth (typically
    tiny — each round strips a whole "onion layer") yields the exact
    k-core; a smaller horizon yields the documented intermediate.
    Every step is an exact integer degree count + a semi-join, so N
    rounds replay bit-for-bit in ANSI SQL (generated unrolled CTEs).

    Scale shape: per round one partial-agg degree count + two
    left-semi joins filtering the edge list — no windows, no driver
    pulls; the edge frame shrinks monotonically.  Self-loops drop and
    parallel edges collapse (simple-graph semantics, like
    :func:`triangle_count`)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    g = (edges.select(F.least(src_col, dst_col).alias("a"),
                      F.greatest(src_col, dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .localCheckpoint(eager=False))
    for _ in range(int(rounds)):
        deg = (g.select(F.col("a").alias("node"))
               .unionByName(g.select(F.col("b").alias("node")))
               .groupBy("node")
               .agg(F.count(F.lit(1)).cast("long").alias("deg")))
        keep = deg.filter(F.col("deg") >= int(k)).select("node")
        g = (g.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
             .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
             .localCheckpoint(eager=False))
    deg = (g.select(F.col("a").alias("node"))
           .unionByName(g.select(F.col("b").alias("node")))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    # the FINAL membership filter: a node can survive the last peel's
    # edge trim yet sit below k (its neighbours were trimmed in the
    # same round) — at fixpoint this filter is a no-op
    return deg.filter(F.col("deg") >= int(k))


def bfs_distances(edges: DataFrame, seeds: list, max_hops: int = 3,
                  src_col: str = "src", dst_col: str = "dst",
                  directed: bool = False) -> DataFrame:
    """Exact hop distances from a seed set: ``(node, dist)`` for every
    node within ``max_hops`` of any seed (layered BFS; unreached nodes
    are absent) — the crawl-depth / link-proximity signal ("how many
    hops from the trusted domains is this host?").

    Each round relaxes every edge once: ``dist'(v) = min(dist(v),
    min over in-neighbours u of dist(u) + 1)`` — pure integer
    arithmetic, so ``max_hops`` rounds replay bit-for-bit in ANSI SQL
    (generated unrolled CTEs, the :func:`pagerank` convention).
    ``directed=False`` (default) walks the undirected view.

    ``seeds`` is a bounded literal list of DISTINCT node ids that must
    all appear in the graph (the :func:`pagerank` in-plan guard — a
    stale seed would silently return an empty/shrunken neighbourhood).

    Scale shape: per round ONE equi-join (frontier distances onto the
    edge list) + one partial-agg min + a union-min with the previous
    round — no windows, no driver pulls.  The distance frame is at
    most the reached set, monotonically growing but bounded by
    nodes."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    if not seeds:
        raise ValueError("seeds must be a non-empty list")
    if len(set(seeds)) != len(seeds):
        raise ValueError("bfs_distances: seeds must be distinct")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    e = e.localCheckpoint(eager=False)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    is_seed = F.col("node").isin(*seeds)
    ns = len(seeds)
    seed_chk = F.broadcast(nodes.agg(
        F.when(F.sum(F.when(is_seed, 1).otherwise(0)) == ns, F.lit(0))
         .otherwise(F.raise_error(F.lit(
             "bfs_distances: every seed must appear in the graph "
             "(as a source or destination)")).cast("int"))
         .alias("__z")))
    dist = (nodes.filter(is_seed).crossJoin(seed_chk)
            .select("node", F.col("__z").cast("long").alias("dist"))
            .localCheckpoint(eager=False))
    for _ in range(int(max_hops)):
        relax = (e.join(dist.withColumnRenamed("node", "src"), "src")
                 .select(F.col("dst").alias("node"),
                         (F.col("dist") + 1).alias("dist")))
        dist = (dist.unionByName(relax)
                .groupBy("node")
                .agg(F.min("dist").cast("long").alias("dist"))
                .localCheckpoint(eager=False))
    return dist


def connected_components(edges: DataFrame, rounds: int = 8,
                         src_col: str = "src",
                         dst_col: str = "dst",
                         strategy: str = "hashmin",
                         check_convergence: bool = False) -> DataFrame:
    """Hash-min weakly-connected components over the undirected view:
    ``(node, comp)`` with ``comp`` = the minimum node id reachable in
    ``rounds`` hops — after ``rounds >= diameter`` rounds that IS the
    component's minimum member, the same representative convention as
    the dedup family's cluster ids (`dedup.py::dedup_clusters`, whose
    size-gated driver union-find this is the any-scale counterpart
    of).

    Each round relaxes every edge once: ``comp'(v) = min(comp(v), min
    over neighbours u of comp(u))`` — pure min-arithmetic, so the
    fixed-horizon result replays bit-for-bit in ANSI SQL (generated
    unrolled CTEs, the :func:`bfs_distances` convention).  Like
    :func:`k_core`'s peeling horizon, ``rounds`` is an explicit
    parameter.

    ``strategy`` picks how far a round reaches:

    * ``"hashmin"`` (default, the oracle-simplest spelling): min labels
      move ONE hop per round, so ``rounds`` must cover the component
      diameter — linear, fine for the short-diameter graphs dedup
      clustering produces.
    * ``"stars"`` — alternating large-star/small-star edge rewriting
      (Kiveris et al. 2014, "Connected Components in MapReduce and
      Beyond"): each round REWRITES the edge list twice — large-star
      connects every node's LARGER neighbours to its neighbourhood
      min, small-star its smaller-or-equal ones — so edges contract
      toward component minima exponentially: measured on
      descending-id paths (the adversarial layout), convergence is
      ``rounds = log2(n)`` exactly (16 nodes -> 4, 64 -> 6, 65536 ->
      16) and 4-5 rounds on random graphs, where hash-min needs
      ``diameter`` rounds.  This is the production path for web-crawl
      graphs whose diameters run past any fixed hop budget.  NOTE
      label-only accelerations (pointer-jumping ``comp(comp(v))``
      without edge rewriting, or min-hook contraction that follows
      only one hook per round) measurably degrade to LINEAR on
      descending-id paths — the hook map forms unit-step chains —
      which is why this strategy pays for the rewrite.  Each phase is
      one partial-agg min + one equi-join + a set-semantics DISTINCT,
      so the fixed-horizon result still replays round-for-round in
      ANSI SQL; the final labels are ``min(v, min current
      neighbour)`` over the original node set.

    Scale shape: hash-min is per round ONE equi-join (labels onto the
    doubled edge list) + one partial-agg min — hot nodes combine
    map-side; the label frame is exactly the node set, pinned per
    round.  ``"stars"`` costs two partial-agg mins + two equi-joins +
    two distincts per round, but the edge frame never exceeds the
    input edge count (the papers' invariant) and SHRINKS toward one
    star edge per non-min node, so later rounds get cheaper while
    hash-min rounds stay edge-sized; star centres are hot join/agg
    keys by design — partial-agg mins combine them map-side and the
    joins are the AQE-skew-splittable one-build-row shape.

    ``check_convergence=True`` (stars only; ``rounds`` becomes the
    MAX) breaks as soon as the contracted edge list is a star forest
    — no ``lo`` still appears as a ``hi``, at which point every
    surviving edge is (member, component-min): the Kiveris
    termination condition, one existence probe per round — and
    RAISES if the budget runs out before convergence (the
    :func:`~cascading_flink_spark.extensions.dedup.dedup_clusters`
    contract: a partially-converged clustering would silently leave
    duplicates in a kept corpus).  The fixed-horizon default stays
    replayable round-for-round in ANSI SQL; the converging mode is
    for callers that need a GUARANTEE, not an oracle twin."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if strategy not in ("hashmin", "stars"):
        raise ValueError("strategy must be 'hashmin' or 'stars'")
    if check_convergence and strategy != "stars":
        raise ValueError("check_convergence requires strategy='stars' "
                         "(hash-min's horizon is the oracle contract)")
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    e = (e.unionByName(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
         .localCheckpoint(eager=False))
    # comp keeps the node column's OWN type (min works on strings too);
    # a long cast would NULL out non-numeric ids under non-ANSI casting
    lab = (e.select(F.col("src").alias("node"))
           .unionByName(e.select(F.col("dst").alias("node")))
           .distinct()
           .select("node", F.col("node").alias("comp"))
           .localCheckpoint(eager=False))
    if strategy == "stars":
        # invariant: ce rows are (hi, lo) with hi > lo after the first
        # small-star; self-loops and duplicates removed every phase
        ce = (e.filter(F.col("src") != F.col("dst"))
              .select(F.greatest("src", "dst").alias("hi"),
                      F.least("src", "dst").alias("lo"))
              .distinct()
              .localCheckpoint(eager=False))
        converged = not check_convergence
        for _ in range(int(rounds)):
            # large-star: for each node u, connect every LARGER
            # neighbour v to m = min(neighbourhood(u) + {u})
            und = ce.select(F.col("hi").alias("u"),
                            F.col("lo").alias("v")) \
                    .unionByName(ce.select(F.col("lo").alias("u"),
                                           F.col("hi").alias("v")))
            mins = (und.groupBy("u").agg(F.min("v").alias("__mn"))
                    .select("u", F.least(F.col("u"), F.col("__mn"))
                                  .alias("__m")))
            ce = (und.join(mins, "u")
                  .filter(F.col("v") > F.col("u"))
                  .select(F.col("v").alias("hi"),
                          F.col("__m").alias("lo"))
                  .filter(F.col("hi") != F.col("lo"))
                  .distinct()
                  .localCheckpoint(eager=False))
            # small-star: for each node u, connect its smaller
            # neighbours AND u itself to m = min of those neighbours
            smins = ce.groupBy("hi").agg(F.min("lo").alias("__m"))
            ce = (ce.join(smins, "hi")
                  .filter(F.col("lo") != F.col("__m"))
                  .select(F.col("lo").alias("hi"),
                          F.col("__m").alias("lo"))
                  .unionByName(smins.select("hi",
                                            F.col("__m").alias("lo")))
                  .distinct()
                  .localCheckpoint(eager=False))
            if check_convergence:
                # star forest <=> no lo is still some edge's hi: each
                # surviving component is then exactly one star whose
                # centre (the lo) is its minimum — the termination
                # condition, probed with one existence check over the
                # (shrinking) contracted edge list.
                chains = (ce.select(F.col("lo").alias("__x"))
                          .join(ce.select(F.col("hi").alias("__x")),
                                "__x"))
                if chains.isEmpty():
                    converged = True
                    break
        if not converged:
            raise RuntimeError(
                f"connected_components: stars not converged within "
                f"{rounds} rounds — raise rounds (log2(n) rounds "
                "suffice for any graph; this budget was too small)")
        # labels over the ORIGINAL node set: min(v, min neighbour) —
        # every non-isolated node keeps a star edge, isolated original
        # nodes keep themselves via the left join
        und = ce.select(F.col("hi").alias("node"),
                        F.col("lo").alias("__nb")) \
                .unionByName(ce.select(F.col("lo").alias("node"),
                                       F.col("hi").alias("__nb")))
        nbmin = und.groupBy("node").agg(F.min("__nb").alias("__mn"))
        return (lab.select("node").join(nbmin, "node", "left")
                .select("node",
                        F.least(F.col("node"),
                                F.coalesce(F.col("__mn"), F.col("node")))
                         .alias("comp")))
    for _ in range(int(rounds)):
        relax = (e.join(lab.withColumnRenamed("node", "src"), "src")
                 .select(F.col("dst").alias("node"), "comp"))
        lab = (lab.unionByName(relax)
               .groupBy("node")
               .agg(F.min("comp").alias("comp"))
               .localCheckpoint(eager=False))
    return lab


def link_candidates(edges: DataFrame, min_common: int = 1,
                    degree_cap: int = 64,
                    src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Common-neighbour link prediction over the undirected simple
    graph: ``(id_a, id_b, n_common, jaccard_x1e6)`` for every
    NON-adjacent pair sharing >= ``min_common`` neighbours, scored by
    neighbourhood Jaccard — the classic candidate generator for
    link prediction / entity blocking ("you may also know",
    co-citation candidates).

    ``jaccard_x1e6 = n_common * 1e6 DIV (deg_a + deg_b - n_common)``
    — neighbourhood-union Jaccard as one truncating integer division
    (simple-graph degrees, so the union identity is exact) — plus
    ``aa_x1e6``, the Adamic-Adar score ``sum over shared neighbours v
    of 1/ln(deg(v))``, integer-exact via the DSIR ln recipe: each
    center's ``ln(deg)*1e6`` is rounded ONCE to a long, the per-wedge
    weight is ``1e12 DIV`` that, and the pair score is an exact
    order-free sum of longs (centers have deg >= 2, so ln >= 0.693 —
    no zero divisor).  Existing edges are anti-joined away (they are
    facts, not predictions).

    Scale shape: wedge generation through each CENTER node costs
    C(deg, 2) pairs, so hub nodes explode quadratically — ``degree_cap``
    drops nodes with more than that many neighbours from the CENTER
    role only (they still appear as endpoints), the standard
    hub-suppression bound (a 10^7-degree celebrity contributes no
    information about whether two of its followers know each other
    anyway).  Capped wedge volume is O(m * degree_cap); everything
    else is exact equi-joins + one partial-agg count."""
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    if degree_cap < 2:
        raise ValueError("degree_cap must be >= 2")
    e = (edges.select(F.least(src_col, dst_col).alias("a"),
                      F.greatest(src_col, dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .localCheckpoint(eager=False))
    und = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = (und.groupBy(F.col("a").alias("node"))
           .agg(F.count(F.lit(1)).cast("long").alias("deg"))
           .localCheckpoint(eager=False))
    # deg-1 centers cannot form a wedge pair AND would put ln(1)=0 in
    # the divisor — excluded before the weight is ever evaluated (ANSI
    # mode computes the column even on rows the pair join later drops)
    centers = (und.join(deg.filter((F.col("deg") >= 2)
                                   & (F.col("deg") <= int(degree_cap)))
                        .withColumnRenamed("node", "a"), "a")
               .withColumn("__w", F.expr(
                   "1000000000000 DIV CAST(round(ln(deg) * 1000000, 0) "
                   "AS BIGINT)").cast("long")))
    w1 = centers.select(F.col("a").alias("c"), F.col("b").alias("id_a"),
                        "__w")
    w2 = centers.select(F.col("a").alias("c"), F.col("b").alias("id_b"))
    common = (w1.join(w2, "c")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
                   F.sum("__w").cast("long").alias("aa_x1e6"))
              .filter(F.col("n_common") >= int(min_common)))
    fresh = common.join(
        e.select(F.col("a").alias("id_a"), F.col("b").alias("id_b")),
        ["id_a", "id_b"], "left_anti")
    da = deg.toDF("id_a", "__da")
    db = deg.toDF("id_b", "__db")
    return (fresh.join(da, "id_a").join(db, "id_b")
            .select("id_a", "id_b", "n_common",
                    F.expr("n_common * 1000000 DIV (__da + __db - n_common)")
                     .cast("long").alias("jaccard_x1e6"),
                    "aa_x1e6"))


def clustering_coefficient(edges: DataFrame, src_col: str = "src",
                           dst_col: str = "dst") -> DataFrame:
    """Exact local clustering coefficient per node over the simple
    undirected view: ``(node, deg, n_triangles, cc_x1e6)`` with
    ``cc_x1e6 = (2 * n_triangles * 1e6) DIV (deg * (deg - 1))`` — the
    triangle density NORMALIZED by each node's wedge count, the
    spam-ring-vs-genuine-hub discriminator :func:`triangle_count`'s
    raw counts feed (a celebrity hub has many triangles but a near-0
    coefficient; a link ring saturates toward 1e6).

    Composes :func:`triangle_count` (degree-oriented compact-forward,
    O(m^1.5) wedges) with one degree partial agg; the division is one
    truncating integer DIV, and ``deg < 2`` nodes have no wedges — 0
    by convention, guarded in the expression (never divided).  Same
    simple-graph semantics as the triangle counter.

    Overflow: a dense hub with millions of triangles would wrap the
    int64 ``2 * n_triangles * 1e6`` numerator SILENTLY under Spark's
    non-ANSI arithmetic (past ~4.6e12 triangles), so numerator and
    wedge denominator run through DECIMAL(38,0) (oracle twin:
    HUGEINT) — only the final ratio is cast back to long."""
    tri = triangle_count(edges, src_col=src_col, dst_col=dst_col)
    e = (edges.select(F.least(src_col, dst_col).alias("a"),
                      F.greatest(src_col, dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct())
    deg = (e.select(F.col("a").alias("node"))
           .unionByName(e.select(F.col("b").alias("node")))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    return (tri.join(deg, "node")
            .select("node", "deg", "n_triangles",
                    F.expr("CASE WHEN deg >= 2 THEN "
                           "(2 * CAST(n_triangles AS DECIMAL(38,0)) "
                           "* 1000000) "
                           "DIV (CAST(deg AS DECIMAL(38,0)) * (deg - 1)) "
                           "ELSE 0 END")
                     .cast("long").alias("cc_x1e6")))


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Exact per-node triangle counts over an undirected view of the
    edge list: ``(node, n_triangles)`` for EVERY node (0 when none) —
    the local clustering signal (spam farms and link rings are
    triangle-dense; genuine topic hubs are star-shaped).

    Algorithm: the degree-oriented compact-forward enumeration
    (Latapy 2008; cf. Suri & Vassilvitskii's MapReduce formulation) —
    canonicalize each undirected edge, orient every edge from the
    endpoint with the smaller ``(degree, node)`` to the larger, then
    one self-join builds wedges and one semi-join closes them.  The
    orientation bounds each node's out-degree by O(sqrt(m)) on any
    graph, so wedge generation is O(m^1.5) worst-case instead of
    sum(deg^2) — the difference between hours and minutes when one
    celebrity node has 10^7 neighbours.  Every step is an exact
    integer equi-join, deterministic and replayable in ANSI SQL.

    Self-loops are dropped; parallel edges collapse (simple-graph
    semantics, unlike :func:`pagerank`'s multigraph contributions)."""
    e = (edges.select(F.least(src_col, dst_col).alias("a"),
                      F.greatest(src_col, dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .localCheckpoint(eager=False))
    deg = (e.select(F.col("a").alias("node"))
           .unionByName(e.select(F.col("b").alias("node")))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    da = deg.toDF("a", "__da")
    db = deg.toDF("b", "__db")
    keyed = e.join(da, "a").join(db, "b")
    lo_first = (F.struct(F.col("__da"), F.col("a"))
                < F.struct(F.col("__db"), F.col("b")))
    o = (keyed.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"))
         .localCheckpoint(eager=False))
    # wedges at u: two oriented out-edges; close with the oriented (v1,v2)
    o1 = o.toDF("u", "v1")
    o2 = o.toDF("u", "v2")
    wedges = o1.join(o2, "u").filter(F.col("v1") < F.col("v2"))
    closer = o.toDF("v1", "v2").unionByName(
        o.select(F.col("v").alias("v1"), F.col("u").alias("v2")))
    tris = wedges.join(closer, ["v1", "v2"], "left_semi")
    per_node = (tris.select(F.explode(F.array("u", "v1", "v2"))
                            .alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (deg.select("node").join(per_node, "node", "left")
            .select("node", F.coalesce("n", F.lit(0)).cast("long")
                    .alias("n_triangles")))


def _seed_probe_dists(edges: DataFrame, seeds: list, max_hops: int,
                      src_col: str, dst_col: str, directed: bool,
                      op_name: str):
    """Fused multi-seed BFS shared by :func:`eccentricity_sample` and
    :func:`harmonic_centrality_sample`: ``(seed_frame, dist)`` where
    ``dist`` holds ``(seed, node, dist)`` for every node within
    ``max_hops`` of each seed — the SAME layered integer-min
    relaxation as :func:`bfs_distances`, but carried per-seed in one
    frame, so ``max_hops`` rounds run ONCE for the whole probe set
    instead of ``len(seeds)`` independent BFS chains (round 14: the
    3-seed/6-hop bench probes paid 18 checkpoint materializations +
    3x the edge pin; fused they pay 6 + 1 — identical distances,
    seeds never interact through the per-(seed, node) min).

    ``seed_frame`` is the ``len(seeds)``-row literal frame the caller
    left-joins its per-seed aggregates onto: a seed ABSENT from the
    graph produces no dist rows at all (the in-plan seed guard below
    never evaluates when every probe row vanishes), so the caller's
    n_reached guard must run over the literal seed list, not over the
    groups that survived."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    e = e.localCheckpoint(eager=False)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    is_seed = F.col("node").isin(*seeds)
    ns = len(seeds)
    seed_chk = F.broadcast(nodes.agg(
        F.when(F.sum(F.when(is_seed, 1).otherwise(0)) == ns, F.lit(0))
         .otherwise(F.raise_error(F.lit(
             f"{op_name}: every seed must appear in the graph "
             "(as a source or destination)")).cast("int"))
         .alias("__z")))
    dist = (nodes.filter(is_seed).crossJoin(seed_chk)
            .select(F.col("node").alias("seed"), "node",
                    F.col("__z").cast("long").alias("dist"))
            .localCheckpoint(eager=False))
    for _ in range(int(max_hops)):
        relax = (e.join(dist.withColumnRenamed("node", "src"), "src")
                 .select("seed", F.col("dst").alias("node"),
                         (F.col("dist") + 1).alias("dist")))
        dist = (dist.unionByName(relax)
                .groupBy("seed", "node")
                .agg(F.min("dist").cast("long").alias("dist"))
                .localCheckpoint(eager=False))
    # literal seed frame, type-preserving (F.lit(s), like the per-seed
    # spelling's F.lit(s).alias("seed") output column); the join onto
    # the long node-derived key coerces exactly as a join would
    seed_frame = (edges.sparkSession.range(1)
                  .select(F.explode(F.array(
                      *[F.lit(s) for s in seeds])).alias("seed")))
    return seed_frame, dist


def eccentricity_sample(edges: DataFrame, seeds: list,
                        max_hops: int = 6, src_col: str = "src",
                        dst_col: str = "dst",
                        directed: bool = False) -> DataFrame:
    """Per-seed eccentricity probe: ``(seed, n_reached, ecc)`` — the
    max hop distance and reached-set size of a BFS from each seed —
    the standard diameter LOWER BOUND sampler (max ecc over a handful
    of probes; iterated probing from the farthest node found is the
    classic double-sweep) and the "how deep is this crawl component"
    data card next to :func:`connected_components`' "how wide".

    Each probe is one :func:`bfs_distances` run, so every relaxation
    is exact integer min-arithmetic and the whole operator replays
    bit-for-bit.  CENSORING contract (documented, not hidden): ``ecc``
    is exact only if the BFS exhausted the seed's component within
    ``max_hops``; a frontier still growing at the horizon reports
    ``ecc = max_hops`` — a lower bound.  The caller distinguishes the
    two by re-running with a larger horizon (n_reached stops growing
    exactly when the BFS exhausted).  Seeds are a bounded literal
    list (each must appear in the graph; a present seed always
    reaches itself, so the per-probe ``n_reached > 0`` in-plan raise
    below catches an absent one even in the case bfs's own guard
    cannot see — a single missing seed empties the probe side before
    the guard broadcast is ever built); sample them with the
    md5-order house recipe when unbiased probes are wanted.

    Scale shape: ONE fused multi-seed BFS (per round: one equi-join
    + one partial-agg min over ``(seed, node)`` — seeds never
    interact through the min, so distances are bit-identical to
    ``len(seeds)`` independent runs, at 1/len(seeds) the round
    count; :func:`_seed_probe_dists`), reduced by one per-seed
    partial agg.  Bounded by the seeds parameter, never by data."""
    if not seeds:
        raise ValueError("eccentricity_sample: seeds must be a "
                         "non-empty list")
    if len(set(seeds)) != len(seeds):
        raise ValueError("eccentricity_sample: seeds must be "
                         "distinct")
    seed_frame, dist = _seed_probe_dists(
        edges, seeds, max_hops, src_col, dst_col, directed,
        "eccentricity_sample")
    per = (dist.groupBy("seed")
           .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                F.max("dist").cast("long").alias("ecc")))
    # the literal seed frame drives the guard: a seed ABSENT from the
    # graph yields no dist rows (and, when NO seed matches, even the
    # in-plan membership guard never evaluates), so the missing-seed
    # raise must hang off the left join, exactly like the per-seed
    # spelling's keyless agg used to
    return (seed_frame.join(per, "seed", "left")
            .select("seed",
                    F.when(F.col("__n") > 0, F.col("__n"))
                     .otherwise(F.raise_error(F.concat(
                         F.lit("eccentricity_sample: seed "),
                         F.col("seed").cast("string"),
                         F.lit(" does not appear in the graph")))
                         .cast("long"))
                     .alias("n_reached"),
                    "ecc"))


def degree_assortativity(edges: DataFrame, src_col: str = "src",
                         dst_col: str = "dst") -> DataFrame:
    """Newman degree assortativity of the simple undirected view,
    one summary row: ``(n_edges, rho)`` — the Pearson correlation of
    the endpoint degrees over every directed edge-end pair (each
    undirected edge contributes both orientations, the standard
    symmetric convention; Newman 2002).  Social graphs run positive
    (hubs befriend hubs), web/link-farm and citation graphs negative
    — the one-number structural fingerprint next to
    :func:`clustering_coefficient`'s per-node density.

    Composition, not re-derivation: degrees come from one partial-agg
    groupBy over the undirected edge list; two equi-joins attach
    ``deg(u)``/``deg(v)`` to each directed pair; the correlation is
    :func:`~cascading_flink_spark.extensions.analytics.signal_corr`'s
    exact DECIMAL(38,0)-moment Pearson on those integer signals
    (rounded 4dp at the output), so the determinism contract and
    headroom bounds are inherited verbatim.  A degree-regular graph
    (constant signal) has undefined rho and returns an EMPTY frame —
    the signal_corr exclusion, documented.  Self-loops drop (a node
    is not its own neighbour).

    Scale shape: one dedup partial agg + one degree partial agg;
    two shuffled equi-joins on the node key (degree frames are
    node-sized — broadcast only when the graph is); signal_corr's
    reduced frame is bounded by the DISTINCT-degree support squared,
    tiny on any power-law graph.  No driver pulls."""
    from .analytics import signal_corr
    e = (edges.select(F.least(src_col, dst_col).alias("a"),
                      F.greatest(src_col, dst_col).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .localCheckpoint(eager=False))
    und = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    deg = (und.groupBy(F.col("a").alias("node"))
           .agg(F.count(F.lit(1)).cast("long").alias("deg"))
           .localCheckpoint(eager=False))
    pairs = (und.join(deg.toDF("a", "__dx"), "a")
             .join(deg.toDF("b", "__dy"), "b")
             .select(F.col("__dx").alias("dx"),
                     F.col("__dy").alias("dy")))
    res = signal_corr(pairs, "dx", "dy", method="pearson")
    return res.select(F.expr("n DIV 2").cast("long").alias("n_edges"),
                      "rho")


def harmonic_centrality_sample(edges: DataFrame, seeds: list,
                               max_hops: int = 6,
                               src_col: str = "src",
                               dst_col: str = "dst",
                               directed: bool = False) -> DataFrame:
    """Harmonic centrality probe for an explicit seed sample:
    ``(seed, n_reached, harm_x1e6)`` with ``harm = sum over reached
    nodes v != seed of 1 / dist(seed, v)`` — the centrality that
    stays well-defined on DISCONNECTED graphs (an unreachable node
    contributes exactly 0, where closeness centrality degenerates;
    Boldi-Vigna 2014's axiomatic pick) — the "is this node actually
    central or just in a big component?" probe next to
    :func:`eccentricity_sample`'s diameter bound.

    Composes :func:`bfs_distances` per seed (the eccentricity_sample
    pattern — one exact integer-min BFS each, reduced to ONE row by
    a partial agg): ``harm_x1e6 = sum of 1e6 DIV dist`` over the
    dist >= 1 frontier rows — each term one truncating integer
    division, the sum exact and order-free.  Truncation at
    ``max_hops`` CENSORS the tail exactly like the eccentricity
    probe: nodes beyond the horizon contribute 0 (a LOWER bound —
    but each missed term is < 1e6/max_hops, the documented
    trade-off).  A seed absent from the graph raises in-plan (the
    eccentricity guard).

    Scale shape: ONE fused multi-seed BFS (the
    :func:`eccentricity_sample` fusion — per round one equi-join +
    one partial-agg min over ``(seed, node)``; distances
    bit-identical to independent runs), reduced by one per-seed
    partial agg; bounded by the seeds parameter, never by data."""
    if not seeds:
        raise ValueError("harmonic_centrality_sample: seeds must be "
                         "a non-empty list")
    if len(set(seeds)) != len(seeds):
        raise ValueError("harmonic_centrality_sample: seeds must be "
                         "distinct")
    seed_frame, dist = _seed_probe_dists(
        edges, seeds, max_hops, src_col, dst_col, directed,
        "harmonic_centrality_sample")
    per = (dist.groupBy("seed")
           .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                F.sum(F.when(F.col("dist") >= 1,
                             F.expr("1000000 DIV dist"))
                      .otherwise(0)).cast("long")
                 .alias("harm_x1e6")))
    # literal-seed left join carries the missing-seed guard (see
    # eccentricity_sample)
    return (seed_frame.join(per, "seed", "left")
            .select("seed",
                    F.when(F.col("__n") > 0, F.col("__n"))
                     .otherwise(F.raise_error(F.concat(
                         F.lit("harmonic_centrality_sample: seed "),
                         F.col("seed").cast("string"),
                         F.lit(" does not appear in the graph")))
                         .cast("long"))
                     .alias("n_reached"),
                    "harm_x1e6"))
