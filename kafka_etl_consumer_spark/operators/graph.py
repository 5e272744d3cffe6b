"""Connected components over an edge list — the clustering step that turns
near-duplicate PAIRS (minhash / simhash / embedding-cosine, operators/dedup.py
and similarity.py) into dedup GROUPS, so a corpus-prep pipeline can keep one
canonical document per component.

Algorithm (since optimization round 10): alternating LARGE-STAR /
SMALL-STAR edge contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — public literature, re-derived in
DataFrame ops). Each alternation rewires every edge toward the minimum of
a neighborhood, so star-shaped components form in O(log² n) rounds
regardless of diameter; the fixpoint is the set of disjoint stars centered
at each component's minimum vertex — exactly the min-label contract.

Why not min-label propagation (the previous implementation): a label
moves ONE edge per round through blob graphs with local minima, so the
round count is bound by the min vertex's eccentricity — measured 18
executed rounds on the sf0.1 embedding pair graph (eccentricity 19; the
pointer-jump step shaved a single round because every local-minimum basin
points at itself). Star contraction converges in 6 rounds on that graph.

100 TB shape: state is the current edge set — linear, never the quadratic
reachability set. Each half-round is one window-min shuffle over that
state plus a distinct; hub vertices are a streaming min inside one
partition (spillable), never a collected array. Lineage is truncated by
an eager localCheckpoint per round, which doubles as the input to the
exact edge-set fixpoint probe that makes ``max_iter`` a cap rather than
the executed round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 8,
    loop_partitions: int | None = None,
) -> DataFrame:
    """(vertex ``id_col``, ``component_id``) — component id is the MIN vertex
    id in the component (deterministic, SQL-reproducible). ``vertices`` rows
    absent from ``edges`` come out as singleton components of themselves.

    Optimization round 10 replaced hop+jump min-label propagation with
    alternating LARGE-STAR / SMALL-STAR edge contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — public
    literature, re-derived in DataFrame ops). Label-only propagation moves
    the min label ONE edge per round through blob graphs with local
    minima, so its round count is bound by the min vertex's eccentricity
    (measured 18 executed rounds on the sf0.1 embedding pair graph,
    eccentricity 19 — the jump step shaved a single round); star
    contraction REWIRES edges toward each neighborhood's minimum, provably
    converging in O(log² n) alternations and measured at 6 rounds on the
    same graph (2 at sf0.001, 3 at sf0.01 — each count includes the
    confirming no-change round). Each alternation is two window-min passes over the edge
    state (one shuffle each) plus a distinct (one more) — fewer total
    exchanges by ~4x than the 18 × 3 the label loop executed.

    ``max_iter`` is a safety CAP, not the executed count: every round ends
    with an exact fixpoint probe (edge set unchanged == disjoint stars
    centered at component minima — the paper's termination condition; the
    state is already materialized by the lineage checkpoint, so the probe
    is one anti-join + two metadata counts). The fixpoint is unique and
    the recursive-CTE oracles hash-check convergence at every SF.

    ``loop_partitions=None`` sizes the loop's shuffle width from the
    materialized edge count (~500k rows/task, guide §2 scale-adaptive
    partitioning) instead of any fixed local/cluster constant."""
    spark = edges.sparkSession
    # Canonical orientation child > parent: every operation below emits
    # (child, parent) with parent strictly smaller, so the state stays an
    # oriented forest-ish edge set and the star test is set equality.
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Constraint propagation must be off for the checkpoints and the loop:
    # computing a Union's constraints during a lineage checkpoint hits a
    # Catalyst rewrite bug ("key not found: u#...") when the upstream pair
    # plan carries filter constraints (observed with the minhash-LSH pair
    # plan on Spark 4.1). The loop gains nothing from constraints anyway.
    prev_cp = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        # Materialize the edge list ONCE, eagerly: the loop references it
        # repeatedly (the upstream edge-producing plan — e.g. the BLAS
        # cosine pair stage — must not re-execute per round), and the
        # materialized count sizes the loop's shuffle width below.
        e = e.localCheckpoint(eager=True)
        # The loop's lineage checkpoints compile through ``toRdd``, which
        # bypasses AQE — so the loop stages would run at the session's
        # full shuffle width no matter how small the edge state is. Size
        # them to the STATE instead (loop_shuffle_width — guide §2
        # scale-adaptive partitioning: one partition on the sf0.1 pair
        # graph's 3k edges where 32-wide micro-stages were pure scheduler
        # overhead, ~4k partitions on a 2-billion-edge graph). The
        # materialized-RDD count is a metadata-cheap job.
        n_prev = e.count()
        if loop_partitions is None:
            loop_partitions = loop_shuffle_width(spark, n_prev)
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
        # Vertices with at least one edge, fixed before contraction starts:
        # only these iterate — a 100 TB corpus is overwhelmingly singleton
        # vertices, and shuffling them per round would dominate the job for
        # zero information. They rejoin as themselves at the end.
        endpoints = (
            e.select("u").unionAll(e.select(F.col("v").alias("u"))).distinct()
        )
        w_u = Window.partitionBy("u")

        def large_star(d: DataFrame) -> DataFrame:
            # LARGE-STAR: every vertex u connects its strictly-larger
            # neighbors to min(N(u) ∪ {u}). One window-min over the
            # symmetric view (single shuffle; the giant-hub partition is a
            # linear min with spill, never a collected array), then the
            # emission is a narrow filter+project, then distinct bounds
            # the state at one row per emitted pair. The symmetric view is
            # ONE explode pass over the input — a self-union (d ∪ reverse)
            # references the unmaterialized input twice, and two chained
            # alternations then re-execute it 2^k times (measured 17 s vs
            # 2 s on the sf0.1 pair graph).
            symv = d.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                        F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
                    )
                ).alias("p")
            ).select(F.col("p.a").alias("u"), F.col("p.b").alias("v"))
            return (
                symv.withColumn("mn", F.min("v").over(w_u))
                .filter(F.col("v") > F.col("u"))
                .select(
                    F.col("v").alias("u"),
                    F.least(F.col("u"), F.col("mn")).alias("v"),
                )
                .distinct()
            )

        def small_star(d: DataFrame) -> DataFrame:
            # SMALL-STAR: edges already point child → parent (v < u), so
            # every vertex u re-attaches its smaller neighbors AND itself
            # to m = min of its parents. The row carrying the min parent
            # re-emits as (u, m); every other row as (v, m).
            return (
                d.withColumn("mn", F.min("v").over(w_u))
                .select(
                    F.when(F.col("v") == F.col("mn"), F.col("u"))
                    .otherwise(F.col("v"))
                    .alias("u"),
                    F.col("mn").alias("v"),
                )
                .distinct()
            )

        # TWO large-star/small-star alternations per materialization:
        # lineage stays shallow (4 window/distinct layers) while the
        # per-round fixed costs — the checkpoint job, the count, the
        # fixpoint probe — are paid half as often. Worst case does one
        # spare alternation on already-converged state, which at loop
        # width is noise next to a saved probe round (stage-count is the
        # dominant cost of this loop at every scale — each micro-stage
        # carries fixed scheduler latency, guide §2.2).
        converged = False
        for _ in range(max_iter):
            ss = small_star(large_star(small_star(large_star(e))))
            ss = ss.localCheckpoint(eager=True)
            # Exact fixpoint probe (the paper's termination condition):
            # same count and no row outside the previous set == identical
            # edge set == disjoint min-centered stars. Counts are metadata
            # on materialized RDDs; the anti-join runs on loop-width state.
            n_now = ss.count()
            if n_now == n_prev:
                changed = ss.join(e, ["u", "v"], "left_anti").limit(1).count()
                if changed == 0:
                    e = ss
                    converged = True
                    break
            e, n_prev = ss, n_now
        if not converged:
            # Cap exhausted before the exact fixpoint: the intermediate
            # state can hold MULTIPLE parents per child, and the label
            # join below would then emit duplicate (id, component_id)
            # rows — silently violating the one-row-per-vertex contract
            # (ADVICE r10). Collapse to the best label seen so far; a
            # no-op at fixpoint, well-formed (possibly stale, like the
            # old label-propagation degradation) otherwise. Kept off the
            # normal path so converged runs pay no extra exchange.
            e = e.groupBy("u").agg(F.min("v").alias("v"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.constraintPropagation.enabled", prev_cp)
    # At the fixpoint e is (child, parent=component min) stars; centers
    # carry their own id. Everything else in ``vertices`` is a singleton.
    labels = endpoints.join(e, "u", "left").select(
        "u", F.coalesce(F.col("v"), F.col("u")).alias("lbl")
    )
    singletons = vertices.select(F.col(id_col).alias("u")).join(
        endpoints, "u", "left_anti"
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

    Deliberately ONE fully-lazy DAG (optimization r10 re-measured the
    alternative): lineage-truncating the edge/vertex inputs with lazy
    localCheckpoints made the keyword-graph callers 3-7x SLOWER — each
    checkpoint compiles and executes its subplan separately (toRdd
    bypasses AQE, and separately-executed plans cannot share exchange
    reuse), so the shared token-graph upstream ran once per checkpoint
    at static shuffle width. The single lazy plan lets AQE coalesce
    every round and ReusedExchange dedupe the shared upstream.
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
    the textbook adjacency-matrix form on a non-negative graph.

    Optimization r11: the edge list is materialized EAGERLY once — each
    half-round's checkpoint compiled a plan that re-derived AND
    re-shuffled the edge subtree (checkpoint-compiled plans cannot
    share ReusedExchange, so the upstream edge construction ran once
    per half-round, 2·iterations times) — and its count sizes the
    loop's shuffle width (loop_shuffle_width: lazy checkpoints bypass
    AQE, so the micro-stages otherwise run at the session's full width
    on |V|-row state). The vertex side is checkpointed with it for the
    same reason."""
    spark = edges.sparkSession
    v = vertices.select(F.col(id_col).alias("vid")).localCheckpoint(eager=True)
    e = edges.select(F.col(src).alias("eu"), F.col(dst).alias("ew")).localCheckpoint(
        eager=True
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(loop_shuffle_width(spark, e.count()))
    )
    try:
        n_row = F.broadcast(v.agg(F.count("*").cast("double").alias("__n")))
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
        out = (
            hub.withColumnRenamed("score", "hub")
            .join(auth.withColumnRenamed("score", "auth"), "vid")
            .select(F.col("vid").alias(id_col), "hub", "auth")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return out


def loop_shuffle_width(spark, rows: int) -> int:
    """Shuffle width for checkpoint-compiled iterative loops, sized to the
    STATE (guide §2: scale-adaptive partitioning, never a constant tuned
    for one deployment). Checkpoint-compiled plans bypass AQE, so this is
    the only coalescing these micro-stages get. Two regimes:

    - small states: ~1k rows per task up to 2x the core count (the
      classic over-decomposition factor so waves stay balanced) —
      measured on the sf0.1 truss peel (61k edges, array-intersect
      rows): width 64 ran 2.2x faster than width 15 and 5x faster than
      width 1, while 32-wide stages on a 3k-row CC state were pure
      scheduler overhead (3 tasks suffice there).
    - large states: ~500k rows/task (tens of MB for edge-list rows, the
      guide §2.2 partition-size target), uncapped by core count so a
      2-billion-edge graph gets ~4k tasks.
    """
    cores = spark.sparkContext.defaultParallelism
    return max(
        1,
        min(-(-rows // 1024), 2 * cores),
        min(-(-rows // 500_000), 200_000),
    )


def edge_triangle_support(e: DataFrame) -> DataFrame:
    """(p1, p2, s) — per-edge triangle support |N(p1) ∩ N(p2)| within the
    CURRENT edge set ``e(p1, p2)`` (normalized, p1 < p2), via adjacency-
    list intersection instead of the wedge self-join (optimization r10).

    The wedge form (e ⋈ sym ⋈ sym, then count) materializes one shuffle
    row per WEDGE — Σ deg(u)·deg(v) over edges — before the aggregate;
    this form shuffles one |V|-row adjacency table plus two |E|-row join
    probes, and the intersection happens inside codegen over array
    columns (the triangle_stats lesson, measured 1.4x there; guide §2.3
    shuffle fewer bytes). Memory bound: one vertex's neighbor list must
    fit a task — the same bound the truss peel's callers already accept
    for the subgraphs they peel; orient or sub-block hubs upstream if a
    celebrity vertex appears."""
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("p1").alias("u"), F.col("p2").alias("v")),
                F.struct(F.col("p2").alias("u"), F.col("p1").alias("v")),
            )
        ).alias("__s")
    ).select(F.col("__s.u").alias("u"), F.col("__s.v").alias("v"))
    adj = sym.groupBy("u").agg(F.collect_list("v").alias("__nb"))
    return (
        e.join(adj.select(F.col("u").alias("p1"), F.col("__nb").alias("__n1")), "p1")
        .join(adj.select(F.col("u").alias("p2"), F.col("__nb").alias("__n2")), "p2")
        .select(
            "p1",
            "p2",
            F.size(F.array_intersect("__n1", "__n2")).cast("bigint").alias("s"),
        )
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
    connected_components documents). (Optimization r11 re-measured the
    eager-edge + loop-width treatment here and reverted it: sym was
    already checkpointed — materialized exactly once — and the sf0.1
    state already sizes to the session width, so the only effect was
    one extra count job; measured 2.57 s → 2.67 s.)
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
    loop_partitions: int | None = 32,
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
    n_edges = sym.count()
    if loop_partitions is None:
        # pass None to size the checkpoint-compiled loop stages (AQE is
        # bypassed there) from the materialized edge state; the r10 A/B
        # on the sf0.1 graph measured the fixed default no worse, so 32
        # stays the default and None is the big-graph escape hatch
        loop_partitions = loop_shuffle_width(spark, n_edges)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    try:
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
    |V|-linear state (deliberately so — see :func:`pagerank` on why
    lineage-truncating these inputs measured slower). Mass on vertices
    the walk never reaches stays exactly 0.0 — keep or filter downstream.
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
