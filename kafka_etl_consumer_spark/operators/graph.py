"""Connected components over an edge list — the clustering step that turns
near-duplicate PAIRS (minhash / simhash / embedding-cosine, operators/dedup.py
and similarity.py) into dedup GROUPS, so a corpus-prep pipeline can keep one
canonical document per component.

Algorithm: iterative min-label propagation with POINTER JUMPING (path
halving). Each round does
  1. hop:  every vertex takes the min label over itself + its neighbors
           (one shuffle-join edges⋈labels + one map-side-combining groupBy)
  2. jump: every vertex replaces its label by its label's label
           (labels self-join — halves every label chain)
so the reached radius at least doubles per round: ``max_iter`` rounds cover
components of diameter ≥ 2^max_iter - 1. The default 8 rounds handle
diameter-255 components — far beyond real near-dup clusters (tight clusters
of copies, diameter a handful; the sf0.1 testdata's worst component has
diameter 24, converged by round 5).

Why not plain one-hop propagation: it needs diameter-many rounds — a chain
component at 100 TB would need hundreds of shuffles. Pointer jumping is the
log-round equivalent of the MapReduce hash-to-min family (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds", ICDE'13
— public literature, algorithm re-derived here in DataFrame ops).

100 TB shape: state is ONE (vertex, label) row per vertex — never the
quadratic reachability set. Each round is 3 equi-joins/aggs shuffling that
linear state on vertex/label keys; AQE coalesces the post-filter partitions.
The plan stays fully lazy (fixed round count, no driver-side convergence
poll); for truly unbounded diameters, wrap with an eager loop that stops
when ``labels_changed == 0`` and ``localCheckpoint()`` every few rounds to
truncate lineage — same per-round plan, documented divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 8,
    loop_partitions: int = 32,
) -> DataFrame:
    """(vertex ``id_col``, ``component_id``) — component id is the MIN vertex
    id in the component (deterministic, SQL-reproducible). ``vertices`` rows
    absent from ``edges`` come out as singleton components of themselves.

    Convergence bound (corrected in round 10 — the old docstring claimed
    diameter < 2^max_iter, which label-only propagation does NOT deliver):
    the hop step guarantees every vertex sees the min label within its
    distance-r ball after r rounds, so ``max_iter`` >= the min vertex's
    eccentricity (<= component diameter) ALWAYS converges. The jump step
    (path halving through the label table) accelerates chain-shaped label
    structures dramatically (a 1000-vertex path converges in 9 rounds),
    but blob graphs with many LOCAL minima gain little — each basin's
    label points at itself, so information still crosses basin boundaries
    by hops (measured on the sf0.1 embedding pair graph: eccentricity 19,
    converged at round 15, and extra jumps per round did not help). Size
    ``max_iter`` to the expected component diameter, not its log; for
    genuinely deep graphs use an edge-rewriting CC (large-star/
    small-star) whose round count is provably logarithmic.

    The loop IS the eager delta loop: at every lineage-checkpoint
    boundary (every 3 rounds) the label table materializes anyway, and
    one existence-probe join against the previous checkpoint detects
    the fixpoint and breaks early — so ``max_iter`` is a safety CAP,
    not the executed round count (sf0.001 stops at round 9 of 24, sf0.1
    at 18; the fixpoint is unique, so early exit cannot change the
    answer, and the recursive-CTE oracle hash-checks convergence at
    every SF regardless). The probe costs one |endpoints|-row join per
    3 rounds — noise next to the hop join it avoids re-running."""
    spark = edges.sparkSession
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # Materialize the edge list ONCE (lazily): the loop references it every
    # round, and without this the upstream edge-producing plan (e.g. the
    # BLAS cosine pair stage) would re-execute max_iter times.
    sym = sym.localCheckpoint(eager=False)
    # Only edge ENDPOINTS iterate — a 100 TB corpus is overwhelmingly
    # singleton vertices, and shuffling them max_iter times would dominate
    # the job for zero information. They rejoin as themselves at the end.
    labels = sym.select("u").distinct().withColumn("lbl", F.col("u"))

    # The loop's lineage checkpoints compile through ``toRdd`` (below),
    # which bypasses AQE — so the iterate-on-endpoints stages would run at
    # the session's full shuffle width no matter how small the label state
    # is. Size them explicitly to the state (endpoint set ≪ corpus) and
    # restore the session conf afterward; everything outside the loop still
    # plans under the caller's settings.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    # Constraint propagation must be off inside the loop: computing the
    # Union's constraints during the lineage checkpoint hits a Catalyst
    # rewrite bug ("key not found: u#...") when the upstream pair plan
    # carries filter constraints (observed with the minhash-LSH pair plan
    # on Spark 4.1). The loop gains nothing from constraints anyway — its
    # joins are pure equi-joins on generated labels.
    prev_cp = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    prev_checkpoint = None
    try:
        for i in range(max_iter):
            # hop: min over own label + neighbors' labels
            nbr = sym.alias("s").join(
                labels.alias("l"), F.col("s.v") == F.col("l.u")
            ).select(F.col("s.u").alias("u"), F.col("l.lbl").alias("lbl"))
            labels = (
                labels.unionByName(nbr).groupBy("u").agg(F.min("lbl").alias("lbl"))
            )
            # jump: lbl ← label(lbl)  (path halving; lbl exists as a vertex)
            labels = labels.alias("a").join(
                labels.alias("b"), F.col("a.lbl") == F.col("b.u")
            ).select(F.col("a.u").alias("u"), F.least("a.lbl", "b.lbl").alias("lbl"))
            # Truncate lineage every few rounds. Without this the
            # analyzed plan references the previous round ~3×, i.e.
            # 3^max_iter plan nodes — OOMs the driver long before the
            # data matters. Same pattern MLlib uses for its iterative
            # algorithms. Eager since round 10: the materialized table
            # doubles as the convergence probe's input, and one
            # unchanged checkpoint-to-checkpoint window means the
            # fixpoint was reached (labels only ever decrease).
            if i % 3 == 2 or i == max_iter - 1:
                labels = labels.localCheckpoint(eager=True)
                if prev_checkpoint is not None:
                    changed = (
                        labels.alias("n")
                        .join(
                            prev_checkpoint.alias("p"),
                            F.col("n.u") == F.col("p.u"),
                        )
                        .filter(F.col("n.lbl") != F.col("p.lbl"))
                        .limit(1)
                        .count()
                    )
                    if changed == 0:
                        break
                prev_checkpoint = labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.constraintPropagation.enabled", prev_cp)
    singletons = vertices.select(F.col(id_col).alias("u")).join(
        labels.select("u"), "u", "left_anti"
    ).withColumn("lbl", F.col("u"))
    return labels.unionByName(singletons).select(
        F.col("u").alias(id_col), F.col("lbl").alias("component_id")
    )


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, rank) after ``iterations`` rounds of damped power iteration:

        r_v = (1 - d)/N + d * sum_{(u,v) in E} r_u / outdeg(u)

    All plan-side — N comes from a broadcast one-row count, never a
    driver action, so the whole computation stays one lazy DAG a 100 TB
    scan can stream through. Per round: edges ⋈ ranks on src (the ONE
    fact-fact shuffle), then a dst-keyed partial+final sum, then a left
    join back to vertices for dangling/no-inlink nodes. Fixed round
    count; like connected_components, wrap with an eager delta loop +
    localCheckpoint for unbounded convergence runs.

    Vertices with no out-edges simply leak their mass (no dangling
    redistribution) — the standard simplification; document when using
    rank magnitudes, irrelevant for rank ORDER of well-linked graphs.
    """
    n_row = F.broadcast(vertices.agg(F.count("*").cast("double").alias("__n")))
    v = vertices.select(F.col(id_col).alias("vid")).crossJoin(n_row)

    deg = edges.groupBy(F.col(src).alias("u")).agg(
        F.count("*").cast("double").alias("outdeg")
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("vdst")).join(
        deg, "u"
    )

    ranks = v.select("vid", "__n", (F.lit(1.0) / F.col("__n")).alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.select("vid", "rank"), e.u == F.col("vid"))
            .select(F.col("vdst"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("vdst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            v.join(contrib, v.vid == contrib.vdst, "left")
            .select(
                "vid",
                "__n",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("vid").alias(id_col), "rank")


def hits(
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 3,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Kleinberg HITS: (id, hub, auth) after ``iterations`` mutual
    power-iteration rounds with L1 normalization —

        auth_v = sum_{(u,v) in E} hub_u   (then auth /= sum auth)
        hub_u  = sum_{(u,v) in E} auth_v  (then hub  /= sum hub)

    Same plan economics as :func:`pagerank`: per half-round one
    edge-keyed join + one grouped partial+final sum. Unlike pagerank,
    each half-round's per-node sums are consumed TWICE (the L1
    normalizer aggregate and the division), so a fully-lazy chain
    doubles per half-round — 2^(2*iterations) leaf evaluations
    (measured 28.7s vs ~2s at sf0.001) — and even a cache leaves
    Catalyst re-analyzing the exponentially nested plan. The house rule
    for iterative graph state applies (same as connected_components /
    label_propagation): ``localCheckpoint(eager=False)`` each
    half-round's |V|-row dense table, truncating lineage so every
    round plans and runs against flat state. Nodes with no in-links
    (no out-links) carry auth 0 (hub 0) by the coalesce, exactly like
    the textbook adjacency-matrix form on a non-negative graph."""
    v = vertices.select(F.col(id_col).alias("vid"))
    e = edges.select(F.col(src).alias("eu"), F.col(dst).alias("ew"))
    n_row = F.broadcast(vertices.agg(F.count("*").cast("double").alias("__n")))
    hub = v.crossJoin(n_row).select(
        "vid", (F.lit(1.0) / F.col("__n")).alias("score")
    )
    auth = hub

    def _step(frm: DataFrame, edge_key: str, group_key: str) -> DataFrame:
        raw = (
            e.join(frm.withColumnRenamed("vid", "__j"), F.col(edge_key) == F.col("__j"))
            .groupBy(F.col(group_key).alias("gid"))
            .agg(F.sum("score").alias("x"))
        )
        dense = v.join(raw, v.vid == raw.gid, "left").select(
            "vid", F.coalesce(F.col("x"), F.lit(0.0)).alias("x")
        )
        # consumed twice (normalizer aggregate + division): truncate
        # lineage so the join/agg chain runs once and stays flat
        dense = dense.localCheckpoint(eager=False)
        tot = F.broadcast(dense.agg(F.sum("x").alias("s")))
        return dense.crossJoin(tot).select(
            "vid", (F.col("x") / F.col("s")).alias("score")
        )

    for _ in range(iterations):
        auth = _step(hub, "eu", "ew")   # auth from hubs pointing IN
        hub = _step(auth, "ew", "eu")   # hub from auths pointed AT
    return (
        hub.withColumnRenamed("score", "hub")
        .join(auth.withColumnRenamed("score", "auth"), "vid")
        .select(F.col("vid").alias(id_col), "hub", "auth")
    )


def oriented_adjacency(
    e: DataFrame, deg: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Degree-oriented edge list and out-adjacency lists — the shared
    core of :func:`triangle_stats` and the local-clustering query
    (plans/queries_pipeline7.py graph_clustering_local), factored so the
    orientation tie-break and intersection semantics live in ONE place.

    Inputs: normalized distinct edges ``e(a, b)`` with ``a < b`` and
    degrees ``deg(v, d)``. Returns ``(o, adj)`` where ``o(s, t)`` points
    every edge from its lower-(degree, id) endpoint (compact-forward,
    Latapy 2008 — bounds out-degree at O(√m) so hub wedges enumerate
    from their LOW-degree neighbors) and ``adj(s, __nbrs)`` collects the
    out-neighbor lists. The adj joins downstream are left unhinted: AQE
    broadcasts the |V|-row list table when it fits."""
    keyed = e.join(
        deg.select(F.col("v").alias("a"), F.col("d").alias("__da")), "a"
    ).join(deg.select(F.col("v").alias("b"), F.col("d").alias("__db")), "b")
    lt = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    o = keyed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("t"),
    )
    adj = o.groupBy("s").agg(F.collect_list("t").alias("__nbrs"))
    return o, adj


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count + global clustering coefficient for an
    undirected simple graph given as normalized distinct edges
    (``src < dst``). Returns ONE row:
    (n_vertices, n_edges, n_wedges, n_triangles, global_clustering) with
    clustering = 3·triangles / wedges (rounded 6).

    Plan: the distinct edge list is CACHED (it is referenced four times —
    degrees, both wedge sides, the closing check; uncached, the upstream
    edge construction re-executes each time, measured 2.4x wall-clock on
    the parts-co-ordered graph at sf0.1). Degrees are one hash-agg over
    exploded endpoints; wedges = Σ deg·(deg-1)/2 folds to one row.

    Triangles use DEGREE ORIENTATION (compact-forward, Latapy 2008) plus
    adjacency-list intersection: each edge points from its
    lower-(degree, id) endpoint, out-neighbor lists are collected per
    vertex, and for each oriented edge (u,v) the count of common
    out-neighbors |N⁺(u) ∩ N⁺(v)| closes triangles — each triangle
    {x,y,z} counted exactly once, at its lowest-key edge. Two properties
    make this the 100 TB shape: (1) orientation bounds out-degree at
    O(√m), so a celebrity vertex's d² wedges enumerate from its
    LOW-degree neighbors instead; (2) no wedge-candidate row set is ever
    materialized — the id-ordered wedge-join form shuffles Σ lo(v)·hi(v)
    rows (72M on the sf0.1 parts graph, measured 1.4x slower), while the
    intersection happens inside codegen over array columns. The adj joins
    are left unhinted: AQE broadcasts the |V|-row list table when it fits
    and shuffle-joins when it doesn't.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .cache()
    )
    ends = e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b").alias("v")))
    deg = ends.groupBy("v").agg(F.count(F.lit(1)).alias("d")).cache()
    base = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        (F.sum(F.col("d")) / 2).cast("bigint").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    o, adj = oriented_adjacency(e, deg)
    empty = F.array().cast(adj.schema["__nbrs"].dataType)
    tri = (
        o.join(adj.select("s", F.col("__nbrs").alias("__ns")), "s")
        .join(
            adj.select(F.col("s").alias("t"), F.col("__nbrs").alias("__nt")),
            "t",
            "left",
        )
        .select(
            F.size(
                F.array_intersect("__ns", F.coalesce("__nt", empty))
            ).alias("__c")
        )
        .agg(F.sum("__c").cast("bigint").alias("n_triangles"))
    )
    out = base.crossJoin(F.broadcast(tri))
    return out.select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            3.0 * F.col("n_triangles") / F.col("n_wedges").cast("double"), 6
        ).alias("global_clustering"),
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(vertex, community) after ``iterations`` rounds of SYNCHRONOUS
    label propagation (Raghavan et al. 2007): every vertex simultaneously
    adopts the most frequent label among its neighbors, ties broken by
    the SMALLEST label — fully deterministic, unlike the randomized
    asynchronous original, so the result carries an exact SQL oracle.

    Where :func:`connected_components` answers "what is reachable",
    label propagation answers "what is densely knit" — it splits a
    connected graph into communities because a vertex's label follows its
    LOCAL majority, not any path.

    Scale shape per round: one edges⋈labels equi-join in which ONLY the
    small (vertex, label) side shuffles — the symmetrized edge list is
    hash-partitioned on the join key once up front and every round's
    join reuses that exchange — then one (vertex, label) hash-agg with
    map-side collapse and a deterministic argmax expressed as a second
    hash-agg (``min(struct(-count, label))``), which beats the
    sort-based window rank it replaces (measured 3.40s → 3.12s warm at
    sf0.1, and the window's per-round sort grows with degree at 100 TB
    while the hash-agg does not). State is ONE (vertex, label) row per
    endpoint; fixed rounds keep the DAG static (the same loop hygiene
    connected_components documents).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # partition the (big) edge side by the join key ONCE; each round's
    # join then reuses this exchange instead of re-shuffling the edges
    sym = sym.repartition("v").localCheckpoint(eager=False)
    labels = sym.select("u").distinct().withColumn("lbl", F.col("u"))
    for i in range(iterations):
        votes = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"))
            .groupBy(F.col("e.u").alias("u"), F.col("l.lbl").alias("lbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax (c desc, lbl asc) per vertex as a hash-agg: min over
        # struct(-c, lbl) picks the largest count, then smallest label
        labels = (
            votes.groupBy("u")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lbl"))
                ).alias("m")
            )
            .select("u", F.col("m.lbl").alias("lbl"))
        )
        labels = labels.localCheckpoint(eager=False)
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "lbl").select(
        F.col("u").alias("vertex"),
        F.col("lbl").alias("community"),
        "community_size",
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    loop_partitions: int = 32,
) -> DataFrame:
    """Vertices of the k-core — the maximal subgraph where every vertex
    has degree ≥ k — as (vertex ``u``, ``core_degree``), core_degree
    being the degree WITHIN the surviving subgraph. The dense-part
    extractor of graph curation: spam/bot rings and tightly-linked
    boilerplate survive high-k cores while organic long-tail structure
    peels away.

    Algorithm: iterative peeling (Batagelj-Zaveršnik semantics,
    distributed form) — each round drops vertices whose current degree
    is < k via two semi-joins, until an edge-count fixpoint. Unlike the
    fixed-round loops (components, pagerank) the peeling depth is
    data-dependent — a path of length d peels for d/…-ish rounds — so
    this is the EAGER stop-when-no-change variant the module docstring
    reserves for unbounded-depth loops: one count() action per round on
    the checkpointed (shrinking) edge state, never on upstream lineage.
    Per round: one degree hash-agg (partial-combines map-side) + two
    semi-joins against the ≤V-row keep set (broadcast-eligible as the
    core shrinks); state is the surviving edge list, which only ever
    shrinks. ``max_iter`` bounds pathological peel chains; 30 rounds
    peel any graph whose residual ever changes by ≥1 vertex per round
    into its fixpoint or within noise of it (raise for adversarial
    path-of-pearls inputs).
    """
    spark = edges.sparkSession
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.localCheckpoint(eager=True)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    try:
        n_edges = sym.count()
        for _ in range(max_iter):
            if n_edges == 0:
                break
            deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            keep = deg.filter(F.col("d") >= k).select("u")
            pruned = sym.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
            pruned = pruned.localCheckpoint(eager=True)
            n_pruned = pruned.count()
            if n_pruned == n_edges:
                break
            sym, n_edges = pruned, n_pruned
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))


def personalized_pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    seed_mass_col: str = "sm",
) -> DataFrame:
    """(id, ppr) after ``iterations`` rounds of power iteration with the
    teleport concentrated on a SEED distribution instead of uniform:

        r_v = (1 - d) * seed_mass(v) + d * sum_{(u,v) in E} r_u / outdeg(u)

    ``seeds`` is (id_col, seed_mass_col) summing to 1 — the personalization
    vector of Jeh & Widom's personalized PageRank / random walk with
    restart. r0 IS the seed vector, so after k rounds every vertex holds
    exactly the damped k-step restart-walk mass, the "relevance to the
    seed set" score used for seed-expansion retrieval and local community
    detection — the seeded complement to :func:`pagerank`'s global rank.

    Plan economics are identical to :func:`pagerank` (per round: one
    src-keyed edge⋈rank shuffle, one dst-keyed partial+final sum, one
    left join back to vertices); the seed vector is a broadcast left join
    applied once per round, so the whole thing stays one lazy DAG with
    |V|-linear state. Mass on vertices the walk never reaches stays
    exactly 0.0 — keep or filter downstream.
    """
    v = vertices.select(F.col(id_col).alias("vid"))
    sd = F.broadcast(
        seeds.select(F.col(id_col).alias("vid"), F.col(seed_mass_col).alias("__sm"))
    )
    v = v.join(sd, "vid", "left").select(
        "vid", F.coalesce("__sm", F.lit(0.0)).alias("__sm")
    )

    deg = edges.groupBy(F.col(src).alias("u")).agg(
        F.count("*").cast("double").alias("outdeg")
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("vdst")).join(
        deg, "u"
    )

    ranks = v.select("vid", "__sm", F.col("__sm").alias("ppr"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.select("vid", "ppr"), e.u == F.col("vid"))
            .select(F.col("vdst"), (F.col("ppr") / F.col("outdeg")).alias("c"))
            .groupBy("vdst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = v.join(contrib, v.vid == contrib.vdst, "left").select(
            "vid",
            "__sm",
            (
                (1.0 - damping) * F.col("__sm")
                + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("ppr"),
        )
    return ranks.select(F.col("vid").alias(id_col), "ppr")
