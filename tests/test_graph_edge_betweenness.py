"""graph_edge_betweenness: the engine's per-edge Brandes sweep vs an
INDEPENDENT queue-based Brandes replay (plain BFS + reversed-order
dependency accumulation, no shared code with the plan or the oracle) —
the page_trend lesson: oracle parity proves the two SQL engines agree,
not that the recurrence is right, so the recurrence is pinned here."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans import QUERIES
from kafka_etl_consumer_spark.plans.queries_pipeline50 import (
    _EBC_HOPS,
    _EBC_SRCS,
    _EBC_TOPK,
)

SF_DIR = "/root/testdata/sf0.001"


def _brandes_edge_betweenness(edges, n_srcs, hops):
    """Textbook Brandes (2001) with per-edge accumulation, bounded to
    `hops` levels from the n_srcs smallest vertices."""
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    eb = collections.defaultdict(float)
    for s in sorted(adj)[:n_srcs]:
        dist = {s: 0}
        sigma = collections.defaultdict(float)
        sigma[s] = 1.0
        order = [s]
        q = collections.deque([s])
        while q:
            v = q.popleft()
            if dist[v] == hops:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1 + delta[w])
                    delta[v] += c
                    eb[(min(v, w), max(v, w))] += c
    return eb


def test_engine_matches_independent_brandes_replay(spark):
    got = {
        (r["pu"], r["pv"]): (r["edge_betweenness"], r["n_source_terms"])
        for r in QUERIES["graph_edge_betweenness"](spark, SF_DIR).collect()
    }
    edges = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
        .alias("a")
        .join(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .filter(F.col("l_orderkey") % 20 == 0)
            .select("l_orderkey", "l_partkey")
            .alias("b"),
            "l_orderkey",
        )
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey"), F.col("b.l_partkey"))
        .distinct()
        .collect()
    )
    eb = _brandes_edge_betweenness(
        [(r[0], r[1]) for r in edges], _EBC_SRCS, _EBC_HOPS
    )
    want_sorted = sorted(
        ((u, v, round(val, 6)) for (u, v), val in eb.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:_EBC_TOPK]
    assert len(got) == len(want_sorted) > 0
    for u, v, val in want_sorted:
        assert (u, v) in got, (u, v)
        assert abs(got[(u, v)][0] - val) < 1e-6, (u, v, got[(u, v)], val)
    # every reported edge must aggregate at least one (source, direction)
    # term, and n_source_terms is bounded by 2 * sources (each source
    # traverses an undirected edge in at most one direction per sweep,
    # and an edge can appear in several sources' DAGs)
    assert all(1 <= t <= 2 * _EBC_SRCS for _, t in got.values())
