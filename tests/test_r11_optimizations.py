"""Focused tests for the round-11 optimization internals.

Each optimization that changed an operator's internals gets a parity or
contract test here (the optimization-round rule): the Gram-path PCA must
equal the matvec path bit-for-bit, connected_components must keep its
one-row-per-vertex contract even when the round cap exhausts (ADVICE
r10), and the shared-shingle LSH plan must emit the same pairs as the
recompute plan.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.dedup import minhash_lsh_pairs
from kafka_etl_consumer_spark.operators.embeddings import pca_top_component
from kafka_etl_consumer_spark.operators.graph import connected_components


def test_pca_gram_path_matches_matvec_path(spark):
    dims = 8
    rows = [
        Row(vec_id=i, embedding=[((i * 7 + d * 3) % 11) / 10.0 for d in range(dims)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    gram = pca_top_component(df, dims=dims, iters=3, use_gram=True).collect()[0]
    matv = pca_top_component(df, dims=dims, iters=3, use_gram=False).collect()[0]
    # identical algebra + the 9dp re-round per iteration: the two paths
    # must land on the SAME doubles (the determinism contract callers
    # hash against)
    assert gram["component"] == matv["component"]
    assert gram["explained_ratio"] == matv["explained_ratio"]


def test_connected_components_cap_exhaust_one_row_per_vertex(spark):
    # a long path graph cannot converge in one star-contraction round:
    # the intermediate state holds multiple parents per child (ADVICE
    # r10) — the cap-exhaust path must still emit exactly one
    # (id, component_id) row per vertex
    n = 64
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(n - 1)]
    )
    vertices = spark.createDataFrame([Row(id=i) for i in range(n)])
    out = connected_components(edges, vertices, max_iter=1).collect()
    assert len(out) == n
    assert len({r["id"] for r in out}) == n
    # labels may be stale (not yet the global min) but must be members
    # of the path, i.e. well-formed vertex ids <= the vertex itself
    assert all(0 <= r["component_id"] <= r["id"] for r in out)


def test_connected_components_cap_exhaust_converged_unaffected(spark):
    # when the fixpoint is reached inside the cap, the cap-exhaust
    # collapse must not fire / not change anything: exact labels
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=10, dst=11)]
    )
    vertices = spark.createDataFrame([Row(id=i) for i in (1, 2, 3, 10, 11, 99)])
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(edges, vertices, max_iter=8).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_minhash_share_shingles_same_pairs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
            Row(doc_id=3, text="completely different words appear in here now"),
            Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),
        ]
    )

    def pairs(share):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 6))
            for r in minhash_lsh_pairs(docs, share_shingles=share)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
            .collect()
        )

    shared, recomputed = pairs(True), pairs(False)
    assert shared == recomputed
    assert (1, 4, 1.0) in shared  # the exact duplicate must surface
