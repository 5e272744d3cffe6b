"""Connected components: pointer-jumping convergence vs brute-force BFS
ground truth, singleton handling, and determinism of the component id."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.graph import connected_components

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def graph(spark):
    from kafka_etl_consumer_spark.operators.similarity import cosine_pairs_blas

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = cosine_pairs_blas(emb, threshold=0.3)
    return emb.select("vec_id"), pairs


def _bfs_components(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    comp = {}
    for s in adj:
        if s in comp:
            continue
        members, frontier = {s}, [s]
        while frontier:
            frontier = [
                v for u in frontier for v in adj[u] if v not in members and not members.add(v)
            ]
        lbl = min(members)
        for m in members:
            comp[m] = lbl
    return comp


def test_matches_bfs_ground_truth(spark, graph):
    vertices, pairs = graph
    edge_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    truth = _bfs_components(edge_rows)
    got = {
        r.vec_id: r.component_id
        for r in connected_components(
            pairs, vertices, id_col="vec_id", src="id_a", dst="id_b", max_iter=6
        ).collect()
    }
    for v, lbl in truth.items():
        assert got[v] == lbl, f"vertex {v}: {got[v]} != {lbl}"
    # vertices without edges are their own singleton component
    singles = set(got) - set(truth)
    assert singles and all(got[v] == v for v in singles)
    assert len(got) == vertices.count()


def test_extra_rounds_change_nothing(spark, graph):
    # 6 rounds is already the fixpoint (diameter coverage 2^6-1); more
    # rounds must be a no-op — this is the convergence guarantee
    vertices, pairs = graph
    a = connected_components(pairs, vertices, id_col="vec_id", src="id_a", dst="id_b", max_iter=6)
    b = connected_components(pairs, vertices, id_col="vec_id", src="id_a", dst="id_b", max_iter=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_shuffle_conf_restored(spark, graph):
    vertices, pairs = graph
    before = spark.conf.get("spark.sql.shuffle.partitions")
    connected_components(pairs, vertices, id_col="vec_id", src="id_a", dst="id_b", max_iter=2)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_kmeans_refine_matches_numpy(spark):
    # one Lloyd iteration vs a straight numpy re-implementation
    import numpy as np

    from kafka_etl_consumer_spark.operators.similarity import (
        hash_ranked_centroids,
        kmeans_refine,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    cents = hash_ranked_centroids(emb, n_centroids=8)
    got = {
        r.centroid_id: (np.array(r.centroid), r.n_assigned)
        for r in kmeans_refine(emb, cents).collect()
    }

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    crows = sorted(cents.collect(), key=lambda r: r.centroid_id)
    cm = np.stack([np.array(r["__cvec"]) for r in crows])
    cos = (m / np.linalg.norm(m, axis=1, keepdims=True)) @ (
        cm / np.linalg.norm(cm, axis=1, keepdims=True)
    ).T
    # same tie-break as the operator: rounded score desc, centroid id asc
    best = np.lexsort((np.arange(1, 9)[None, :].repeat(len(ids), 0),
                       -np.round(cos, 6)), axis=1)[:, 0]
    for cid in range(1, 9):
        members = m[best == cid - 1]
        assert got[cid][1] == len(members)
        if len(members):
            np.testing.assert_allclose(got[cid][0], members.mean(axis=0), rtol=1e-9)


def test_stratified_sample_fractions_and_determinism(spark):
    from kafka_etl_consumer_spark.operators.sampling import stratified_sample
    from pyspark.sql import functions as F

    from kafka_etl_consumer_spark.plans.registry import _t

    ev = _t(spark, SF_DIR, "events")
    mix = {"view": 0.1, "click": 0.25, "signup": 0.5, "purchase": 1.0}
    s = stratified_sample(ev, "event_type", mix, key=F.col("event_id").cast("string"))
    got = {r.event_type: r.n for r in s.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    base = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert "error" not in got  # default_fraction=0 drops unlisted strata
    assert got["purchase"] == base["purchase"]  # fraction 1.0 keeps all
    for t, frac in (("view", 0.1), ("click", 0.25), ("signup", 0.5)):
        assert abs(got[t] / base[t] - frac) < 0.05, (t, got[t], base[t])
    # deterministic: same rows on a second evaluation
    ids1 = sorted(r.event_id for r in s.select("event_id").collect())
    ids2 = sorted(r.event_id for r in s.select("event_id").collect())
    assert ids1 == ids2


def test_kmeans_train_reduces_inertia(spark):
    # spherical k-means: mean updates must not worsen the clustering —
    # inertia (sum of 1 - cosine to the assigned centroid) decreases
    import numpy as np

    from kafka_etl_consumer_spark.operators.similarity import (
        assign_cells,
        hash_ranked_centroids,
        kmeans_train,
    )
    from pyspark.sql import functions as F
    from kafka_etl_consumer_spark.functions.vectors import cosine_similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")

    def inertia(cents):
        a = assign_cells(emb, cents)
        c = cents.withColumnRenamed("centroid_id", "cluster")
        return (
            a.join(c, "cluster")
            .select(F.sum(1 - cosine_similarity("embedding", "__cvec")).alias("s"))
            .collect()[0].s
        )

    seed = hash_ranked_centroids(emb, n_centroids=8)
    i0 = inertia(seed)
    i2 = inertia(kmeans_train(emb, n_centroids=8, iters=2))
    i4 = inertia(kmeans_train(emb, n_centroids=8, iters=4))
    assert i2 < i0
    assert i4 <= i2 + 1e-6
    assert not np.isnan(i4)


def test_pagerank_mass_conserved_and_deterministic(spark):
    """Every vertex has outdeg >= 1 in a ring graph, so total rank mass
    stays 1 under power iteration; two runs agree exactly."""
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.graph import pagerank

    n = 50
    verts = spark.createDataFrame([Row(id=i) for i in range(n)])
    # ring + one chord per node: id -> id+1, id -> (2*id+1)%n
    edges = spark.createDataFrame(
        [Row(src=i, dst=(i + 1) % n) for i in range(n)]
        + [Row(src=i, dst=(2 * i + 1) % n) for i in range(n)]
    ).distinct()
    r1 = {r.id: r["rank"] for r in pagerank(edges, verts, iterations=4).collect()}
    r2 = {r.id: r["rank"] for r in pagerank(edges, verts, iterations=4).collect()}
    assert abs(sum(r1.values()) - 1.0) < 1e-9
    # partial-agg combine order may drift the last ulp between runs; the
    # query surface rounds at 9 decimals, which absorbs this entirely
    assert r1.keys() == r2.keys()
    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-12, k
    assert min(r1.values()) > 0


def test_triangle_stats_known_graph(spark):
    """Hand-built graph: K4 plus a pendant. K4 has 4 triangles; wedges =
    sum C(deg,2) = 3*C(3,2)+C(4,2) = 9+6 = 15... computed exactly below."""
    from kafka_etl_consumer_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (4 triangles) + pendant 5 attached to 1
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    row = triangle_stats(df).collect()[0]
    assert row.n_vertices == 5 and row.n_edges == 7
    # degrees: 1->4, 2..4 ->3, 5->1; wedges = C(4,2)+3*C(3,2)+0 = 6+9 = 15
    assert row.n_wedges == 15
    assert row.n_triangles == 4
    assert row.global_clustering == round(3 * 4 / 15, 6)


def test_personalized_pagerank_seed_locality(spark):
    """PPR on a path graph 0-1-2-3-4 (directed both ways) with seed 0:
    mass must decay with distance from the seed, unreached = 0 exactly,
    and the engine must match a hand-rolled power iteration."""
    from kafka_etl_consumer_spark.operators.graph import personalized_pagerank
    from pyspark.sql import functions as F

    edges = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
    e = spark.createDataFrame(edges, "src int, dst int")
    verts = spark.createDataFrame([(i,) for i in range(6)], "id int")  # 5 isolated
    seeds = spark.createDataFrame([(0, 1.0)], "id int, sm double")

    got = {
        r.id: r.ppr
        for r in personalized_pagerank(e, verts, seeds, iterations=5).collect()
    }
    # reference power iteration
    import collections

    out = collections.defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    r = {i: 0.0 for i in range(6)}
    r[0] = 1.0
    for _ in range(5):
        nxt = {i: 0.15 * (1.0 if i == 0 else 0.0) for i in range(6)}
        for s, ds in out.items():
            for d in ds:
                nxt[d] += 0.85 * r[s] / len(ds)
        r = nxt
    for i in range(6):
        assert abs(got[i] - r[i]) < 1e-12, i
    # locality: the seed's neighborhood holds most of the mass (note:
    # r(1) > r(0) is CORRECT on a path — 0's entire out-flow lands on 1
    # while 0 keeps only teleport + half of 1's out-flow), every reached
    # vertex is positive, the isolated vertex is exactly 0, and total
    # mass never exceeds 1 (out-edges exist everywhere on the path, so
    # nothing leaks here)
    assert got[0] + got[1] > got[3] + got[4]
    assert all(got[i] > 0 for i in range(5))
    assert got[5] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_gbdt_boost_mse_monotone(spark, sf_dir):
    """Squared-loss boosting with a stump per round can never increase
    train MSE (each round's leaf values are the residual means, the
    exact minimizers given the split), and every gain is positive by
    construction (the best split beats the no-split variance)."""
    from kafka_etl_consumer_spark.plans import QUERIES

    rows = QUERIES["ml_gbdt_stump_boost"](spark, sf_dir).collect()
    assert [r.boost_round for r in rows] == [1, 2, 3]
    mses = [r.train_mse for r in rows]
    assert mses[0] >= mses[1] >= mses[2]
    assert all(r.gain >= 0 for r in rows)
