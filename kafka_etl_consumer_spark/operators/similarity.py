"""Similarity search over embedding columns (array<float>).

Two paths, both JVM-side (higher-order functions, no Python in the hot
loop — functions/vectors.py):

- ``cosine_topk``: brute-force exact top-k. The query set is broadcast
  (it's small by definition); each executor scans its slice of the corpus
  once and the per-query heap is the rank-filter. Cost O(|corpus|·|queries|)
  — the right baseline, and at 100 TB still viable for small query batches
  because it's a single broadcast-join pass with no shuffle of the corpus.
- ``lsh_ann_topk``: random-hyperplane LSH. Deterministic hyperplanes
  (md5-derived weights — reproducible in the DuckDB oracle), P sign bits →
  bucket key; candidates = corpus rows sharing the query's bucket. Turns
  the scan into an equi-join on bucket: corpus shuffles once by bucket
  key (or is pre-bucketed at write time), each query touches ~|corpus|/2^P
  rows. Recall is tunable via P and multi-probe; this is the scale path.
- ``ivf_ann_topk``: inverted-file (IVF-Flat) index. A deterministic
  hash-ranked sample of the corpus is the codebook; every vector is
  assigned to its nearest centroid through a BROADCAST 1-row codebook
  array + higher-order argmax — a narrow projection, ZERO corpus shuffle.
  Queries probe their ``nprobe`` nearest cells, candidates come from one
  broadcast equi-join on the cell id (~nprobe/C of the corpus per query).
  Data-adaptive (cells follow density, unlike LSH's fixed hyperplanes).

Ranking is done on round(score, 6) with id tiebreak so ordering is
reproducible across engines (doubles differ only below 1e-12; rounding
removes the ulp noise from the ORDER BY).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.vectors import dot, l2_norm


def plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1) — the same
    md5-based formula functions/hashing.hash64 uses, computable in SQL."""
    h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
    return (h % 1000) / 500.0 - 1.0


def plane_weight_sql(p_expr: str, d_expr: str) -> str:
    h = f"CAST(('0x' || substr(md5({p_expr} || '_' || {d_expr}), 1, 15)) AS BIGINT)"
    return f"(({h}) % 1000) / 500.0 - 1.0"


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query row. ``queries`` needs columns
    (q_<id_col>, q_<vec_col>); self-matches are excluded by id.

    Norms are precomputed per side (one O(d) pass per row) so each of the
    |corpus|·|queries| pairs costs ONE dot product, not three — identical
    doubles (same operands, multiplication is commutative).

    The |corpus|·|queries| dot products run in the PROBE tasks of the
    broadcast join, so corpus-side parallelism is the stage's
    parallelism: a few-file corpus scans as one split and would put the
    whole pair workload on one core — widened here (no-op on wide
    scans, the 100 TB case)."""
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    c = ensure_min_parallelism(corpus).withColumn("__cn", l2_norm(vec_col))
    q = queries.withColumn("__qn", l2_norm(f"q_{vec_col}"))
    joined = c.join(F.broadcast(q), F.col(f"q_{id_col}") != F.col(id_col)).select(
        f"q_{id_col}",
        id_col,
        F.round(dot(f"q_{vec_col}", vec_col) / (F.col("__qn") * F.col("__cn")), 6).alias(
            "score"
        ),
    )
    w = Window.partitionBy(f"q_{id_col}").orderBy(F.col("score").desc(), F.col(id_col))
    return joined.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold within a
    blocking group (label / cluster / LSH bucket). Blocking is what keeps
    this off the O(N²) cliff at scale — the self-join shuffles on
    ``group_col`` and each group is quadratic only locally. Threshold is
    applied to the ROUNDED score so the SQL oracle filter is identical."""
    normed = df.select(group_col, id_col, vec_col).withColumn("__n", l2_norm(vec_col))
    a = normed.select(
        F.col(group_col),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = normed.select(
        F.col(group_col),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    return (
        a.join(b, [group_col])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def cosine_pairs_blas(
    df: DataFrame,
    threshold: float,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`cosine_pairs` semantics through a per-group BLAS matmul
    (applyInPandas): normalize the group's (n×d) matrix once, one ``n·nᵀ``
    produces every pairwise cosine — measured 5.5× the higher-order-function
    path at sf0.1 (matmul is the canonical case where a vectorized Python
    stage beats JVM expression evaluation; SURVEY.md §4.2's one sanctioned
    custom path).

    Scale bound: one GROUP must fit in one worker's memory
    ((n·d)·8 bytes + the n² score triangle) — at 1M×64 rows per block
    that's ~0.5 GB matrix + scores computed in chunks; beyond that, split
    blocks (finer LSH buckets / sub-salting) BEFORE this operator. Skewed
    block sizes are the same risk as any grouped-map (one hot bucket = one
    slow task)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        ids = pdf[id_col].to_numpy()
        n = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        s = n @ n.T
        iu, ju = np.triu_indices(len(ids), k=1)
        sc = np.round(s[iu, ju], 6)
        keep = sc >= threshold
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "score": sc[keep]})

    return (
        df.select(group_col, id_col, vec_col).groupBy(group_col).applyInPandas(pairs, schema)
    )


def cosine_components_blas(
    df: DataFrame,
    threshold: float,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, component_id) — connected components of the within-group
    cosine pair graph, FUSED into the same per-group BLAS pass that
    :func:`cosine_pairs_blas` runs (optimization r10, guide §8: use what
    the optimizer cannot know). Blocking means components can never span
    groups, and every group already fits one task BY CONSTRUCTION — the
    pair stage materializes the group's n² score triangle — so a
    union-find over the block's pairs inside the same task is strictly
    cheaper than emitting the pairs and running a distributed CC loop
    over them (measured: the loop was 18 label-propagation rounds ≈ 60
    micro-stages at sf0.1; this is zero extra stages). Scores are rounded
    to 6dp before thresholding with the identical numpy expression as
    cosine_pairs_blas, and the component id is the min member id — the
    same contract the recursive-CTE oracles hash-check. Every input row
    is emitted (vertices with no qualifying pair label themselves).

    For pair graphs that are NOT blocked (e.g. LSH band candidates),
    use operators/graph.connected_components — the distributed
    star-contraction loop."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("component_id", T.LongType()),
        ]
    )

    def comp(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        ids = pdf[id_col].to_numpy()
        n = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        s = n @ n.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = np.round(s[iu, ju], 6) >= threshold
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(iu[keep], ju[keep]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        roots = np.array([find(i) for i in range(len(ids))])
        comp_min: dict[int, int] = {}
        for i, r in enumerate(roots):
            cur = comp_min.get(r)
            if cur is None or ids[i] < cur:
                comp_min[r] = ids[i]
        return pd.DataFrame(
            {id_col: ids, "component_id": [comp_min[r] for r in roots]}
        )

    return (
        df.select(group_col, id_col, vec_col).groupBy(group_col).applyInPandas(comp, schema)
    )


def hyperplane_bucket(
    df: DataFrame, vec_col: str = "embedding", planes: int = 8, dims: int = 64
) -> DataFrame:
    """Append ``bucket``: the P-char sign string of the vector against P
    deterministic hyperplanes. Literal weight arrays keep everything in
    whole-stage codegen (no UDF, no join against a planes table)."""
    emb = F.col(vec_col).cast("array<double>")
    sign_bits = []
    for p in range(planes):
        w = F.array(*[F.lit(plane_weight(p, d)) for d in range(dims)])
        dot = F.aggregate(
            F.zip_with(emb, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        sign_bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*sign_bits))


def hash_ranked_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic pseudo-random codebook: the ``n_centroids`` corpus rows
    with the smallest ``hash64(id)`` → (centroid_id, __cvec). Selection is a
    distributed ``TakeOrderedAndProject`` (per-partition top-C, no global
    sort); the trailing row_number window runs on C rows only."""
    from kafka_etl_consumer_spark.functions.hashing import hash64

    ranked = (
        corpus.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__cvec"),
            hash64(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h", id_col)
        .limit(n_centroids)
    )
    wcb = Window.orderBy("__h", id_col)
    return ranked.withColumn("centroid_id", F.row_number().over(wcb)).select(
        "centroid_id", "__cvec"
    )


def _codebook_row(centroids: DataFrame) -> DataFrame:
    """(centroid_id, __cvec) → ONE row holding the whole codebook as an
    array of structs — rides a broadcast cross-join to every executor."""
    return centroids.select(
        "centroid_id", "__cvec", l2_norm("__cvec").alias("__cn")
    ).agg(F.collect_list(F.struct("centroid_id", "__cvec", "__cn")).alias("__cbook"))


def _cell_scores(vec: str, norm: str):
    """array<struct<s: rounded cosine, nc: -centroid_id>> against __cbook —
    array_max / descending sort over it = score desc, centroid_id asc."""
    return F.transform(
        F.col("__cbook"),
        lambda c: F.struct(
            F.round(dot(vec, c["__cvec"]) / (F.col(norm) * c["__cn"]), 6).alias("s"),
            (-c["centroid_id"]).alias("nc"),
        ),
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Append ``cluster`` = nearest centroid by rounded cosine (ties → the
    smaller centroid id). A narrow broadcast-codebook projection: the corpus
    is scanned once and NEVER shuffled, O(C·d) codegen flops per row."""
    return (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        .withColumn("__n", l2_norm(vec_col))
        .crossJoin(F.broadcast(_codebook_row(centroids)))
        .withColumn("cluster", -F.array_max(_cell_scores(vec_col, "__n"))["nc"])
        .drop("__cbook")
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ONE Lloyd iteration, distributed: assign every vector to its nearest
    centroid (narrow broadcast pass, zero corpus shuffle), then the new
    centroid is the element-wise mean of its members →
    (centroid_id, centroid array<double>, n_assigned).

    100 TB shape: ``posexplode`` fans each row to d (cluster, pos, val)
    rows INSIDE the partition and the partial aggregate collapses them to
    ≤ C·d rows per partition before the one tiny shuffle — the full vector
    set never moves. Iterating = calling this in a loop with
    ``localCheckpoint`` between rounds (same lineage rule as
    operators/graph.py); empty cells keep their old centroid."""
    assigned = assign_cells(corpus, centroids, vec_col, id_col)
    per_dim = (
        assigned.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg("val").alias("m"), F.count("*").alias("n"))
    )
    refined = per_dim.groupBy("cluster").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__pm"),
        F.first("n").alias("n_assigned"),
    ).select(
        F.col("cluster").alias("centroid_id"),
        F.transform("__pm", lambda x: x["m"]).alias("centroid"),
        "n_assigned",
    )
    # cells no vector chose keep their previous centroid (n_assigned = 0)
    empty = centroids.join(
        refined.select("centroid_id"), "centroid_id", "left_anti"
    ).select("centroid_id", F.col("__cvec").alias("centroid"), F.lit(0).cast("long").alias("n_assigned"))
    return refined.unionByName(empty)


def kmeans_train(
    corpus: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Full spherical k-means: hash-ranked seed + ``iters`` Lloyd rounds →
    (centroid_id, __cvec) in codebook shape, ready for :func:`assign_cells`
    / :func:`ivf_ann_topk` (a trained codebook cuts IVF probe imbalance vs
    the raw sample). Follows the iterative-loop rules (SCALE.md): the
    corpus is re-SCANNED per round (that's Lloyd — linear, no shuffle);
    per-round state (C centroids) is checkpointed so the plan stays O(1)."""
    cents = hash_ranked_centroids(corpus, n_centroids, vec_col, id_col)
    for _ in range(iters):
        cents = (
            kmeans_refine(corpus, cents, vec_col, id_col)
            .select("centroid_id", F.col("centroid").alias("__cvec"))
            .localCheckpoint(eager=False)
        )
    return cents


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-Flat ANN top-k. ``queries`` needs (q_<id_col>, q_<vec_col>).

    Codebook: the ``n_centroids`` corpus rows with the smallest
    ``hash64(id)`` — a deterministic pseudo-random sample, reproducible in
    the SQL oracle (a trained codebook would run a few Lloyd iterations
    over the same assignment plan; the index/probe machinery — the part
    Spark has to get right — is identical either way).

    100 TB shape: codebook selection is a ``TakeOrderedAndProject`` (per-
    partition top-C, no global sort); the C·(d+2) codebook collapses to ONE
    row (``collect_list``) and rides a broadcast cross-join to every
    executor; assignment is a per-row higher-order argmax — the corpus is
    scanned once, never shuffled, O(C·d) flops/row in whole-stage codegen.
    Candidate generation is a broadcast equi-join on ``cluster`` (queries
    side is small), so the only shuffle in the whole plan is the final
    per-query top-k window over ~nprobe/C of the corpus. Scores are
    ``round(·, 6)`` before every ORDER BY so cross-engine ulp noise can't
    flip ranks (same convention as the LSH path)."""
    centroids = hash_ranked_centroids(corpus, n_centroids, vec_col, id_col)
    c = assign_cells(corpus, centroids, vec_col, id_col)
    q = (
        queries.select(
            F.col(f"q_{id_col}"), F.col(f"q_{vec_col}").cast("array<double>").alias(f"q_{vec_col}")
        )
        .withColumn("__qn", l2_norm(f"q_{vec_col}"))
        .crossJoin(F.broadcast(_codebook_row(centroids)))
        .withColumn(
            "__probe",
            F.slice(
                F.reverse(F.array_sort(_cell_scores(f"q_{vec_col}", "__qn"))), 1, nprobe
            ),
        )
        .select(f"q_{id_col}", f"q_{vec_col}", "__qn", F.explode("__probe").alias("__p"))
        .withColumn("cluster", -F.col("__p")["nc"])
        .drop("__p")
    )
    joined = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col(f"q_{id_col}") != F.col(id_col))
        .select(
            f"q_{id_col}",
            id_col,
            F.round(dot(f"q_{vec_col}", vec_col) / (F.col("__qn") * F.col("__n")), 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(f"q_{id_col}").orderBy(F.col("score").desc(), F.col(id_col))
    return joined.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """ANN top-k: candidates share the query's hyperplane bucket, then
    exact cosine + rank within candidates. Approximate by construction —
    its oracle replicates the same bucketing, so results are deterministic."""
    c = hyperplane_bucket(corpus, vec_col, planes, dims).withColumn(
        "__cn", l2_norm(vec_col)
    )
    q = hyperplane_bucket(
        queries.select(
            F.col(f"q_{id_col}"), F.col(f"q_{vec_col}").alias(vec_col)
        ),
        vec_col,
        planes,
        dims,
    ).select(
        f"q_{id_col}",
        F.col(vec_col).alias(f"q_{vec_col}"),
        "bucket",
        l2_norm(vec_col).alias("__qn"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col(f"q_{id_col}") != F.col(id_col)
    ).select(
        f"q_{id_col}",
        id_col,
        F.round(dot(f"q_{vec_col}", vec_col) / (F.col("__qn") * F.col("__cn")), 6).alias(
            "score"
        ),
    )
    w = Window.partitionBy(f"q_{id_col}").orderBy(F.col("score").desc(), F.col(id_col))
    return joined.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int = 64,
    n_centroids: int = 16,
    nprobe: int = 4,
    subspaces: int = 8,
    codebook_size: int = 4,
    shortlist: int = 60,
) -> DataFrame:
    """IVF-PQ ANN top-k — the production vector-store stack: an IVF
    inverted index prunes the corpus to ~nprobe/n_centroids, PQ codes +
    an asymmetric-distance (ADC) table rank those candidates WITHOUT
    touching full vectors, and only the ``shortlist`` survivors get an
    exact cosine re-rank. Completes the repo's ANN ladder: brute force
    (`cosine_topk`) -> LSH (`lsh_ann_topk`) -> IVF-Flat (`ivf_ann_topk`)
    -> IVF-PQ.

    Codebooks are the same deterministic seeds the components use alone
    (IVF: `hash_ranked_centroids`; PQ: subvectors of the first
    ``codebook_size`` corpus rows, `operators/embeddings.py pq_assign`),
    so the whole pipeline has an exact SQL oracle; production swaps in
    Lloyd-refined codebooks with zero plan change.

    PQ code assignment here is the NARROW form of ``pq_assign`` — a
    higher-order argmin against the broadcast codebook (round(dist, 9)
    then ties to the smaller code, the identical rule) — so the corpus
    picks up cluster + codes in ONE scan with no shuffle, where
    pq_assign's window formulation shuffles per (row, subspace).

    100 TB shape: both codebooks collapse to single broadcast rows; the
    corpus scan emits (id, cluster, codes[subspaces]) — at 8 subspaces
    that is 8 code bytes per vector, the PQ compression claim, and the
    full-vector column is only re-read for the shortlist join. Each
    query precomputes its subspaces*codebook_size ADC table ONCE; per
    candidate the approx distance is ``subspaces`` array lookups in
    whole-stage codegen — no per-candidate O(dims) math until the
    exact re-rank of ``shortlist`` rows. The only shuffles are the
    final two bounded per-query top-N windows.
    """
    sub = dims // subspaces
    if sub * subspaces != dims:
        raise ValueError(f"dims {dims} not divisible by {subspaces} subspaces")
    spark = corpus.sparkSession

    centroids = hash_ranked_centroids(corpus, n_centroids, vec_col, id_col)
    corp = assign_cells(corpus, centroids, vec_col, id_col)

    # PQ codebook -> ONE broadcast row: array<struct<s, code, cent>>
    subs = spark.range(subspaces).select(F.col("id").cast("int").alias("s"))
    pqb = (
        corpus.filter(F.col(id_col) < codebook_size)
        .select(
            F.col(id_col).cast("int").alias("code"),
            F.col(vec_col).cast("array<double>").alias("__e"),
        )
        .crossJoin(subs)
        .select("s", "code", F.slice("__e", F.col("s") * sub + 1, sub).alias("cent"))
    )
    pqrow = pqb.agg(
        F.array_sort(F.collect_list(F.struct("s", "code", "cent"))).alias("__pqbook")
    )

    def sqdist(vec_slice, cent):
        return F.round(
            F.aggregate(
                F.zip_with(vec_slice, cent, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        )

    # per-subspace argmin code, computed as a pure expression (no shuffle):
    # min over struct(dist, code) replicates pq_assign's (dist, code) order
    def code_for(vec, s):
        cands = F.filter(F.col("__pqbook"), lambda c: c["s"] == s)
        scored = F.transform(
            cands,
            lambda c: F.struct(
                sqdist(F.slice(vec, s * sub + 1, sub), c["cent"]).alias("d"),
                c["code"].alias("code"),
            ),
        )
        return F.array_min(scored)["code"]

    codes = F.array(*[code_for(F.col(vec_col), s) for s in range(subspaces)])
    corp2 = (
        corp.crossJoin(F.broadcast(pqrow))
        .withColumn("__codes", codes)
        .drop("__pqbook")
        # the ADC path never reads the full vector again; keep it for the
        # exact re-rank join-back (at scale this column stays columnar-
        # pruned out of the ADC stages)
    )

    # queries: probe top-nprobe IVF cells, then precompute the ADC table
    qv = f"q_{vec_col}"
    qi = f"q_{id_col}"
    q = (
        queries.select(
            F.col(qi), F.col(qv).cast("array<double>").alias(qv)
        )
        .withColumn("__qn", l2_norm(qv))
        .crossJoin(F.broadcast(_codebook_row(centroids)))
        .withColumn(
            "__probe",
            F.slice(
                F.reverse(F.array_sort(_cell_scores(qv, "__qn"))), 1, nprobe
            ),
        )
        .drop("__cbook")
        .crossJoin(F.broadcast(pqrow))
        # __pqbook is array_sort'ed -> (s, code) lexicographic order, so
        # entry (s, code) sits at index s*codebook_size + code (0-based)
        .withColumn(
            "__dtab",
            F.transform(
                F.col("__pqbook"),
                lambda c: sqdist(
                    F.slice(F.col(qv), c["s"] * sub + 1, sub), c["cent"]
                ),
            ),
        )
        .drop("__pqbook")
        .select(
            qi, qv, "__qn", "__dtab", F.explode("__probe").alias("__p")
        )
        .withColumn("cluster", -F.col("__p")["nc"])
        .drop("__p")
    )

    seq = F.sequence(F.lit(0), F.lit(subspaces - 1))
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("__codes"),
                seq,
                lambda code, s: F.element_at(
                    F.col("__dtab"), s * codebook_size + code + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    cand = (
        corp2.join(F.broadcast(q), "cluster")
        .filter(F.col(qi) != F.col(id_col))
        .select(
            qi, qv, "__qn", id_col, vec_col, "__n", adc.alias("approx_d")
        )
    )
    ws = Window.partitionBy(qi).orderBy(F.col("approx_d"), F.col(id_col))
    short = (
        cand.withColumn("__srn", F.row_number().over(ws))
        .filter(F.col("__srn") <= shortlist)
        .drop("__srn")
    )
    score = F.round(dot(qv, vec_col) / (F.col("__qn") * F.col("__n")), 6)
    wk = Window.partitionBy(qi).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        short.select(qi, id_col, score.alias("score"))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
