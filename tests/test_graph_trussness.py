"""graph_trussness vs an independent set-based nested peel (no shared
code with the plan or the oracle), including the fixpoint claim behind
the pinned per-level round counts."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans import QUERIES
from kafka_etl_consumer_spark.plans.queries_pipeline57 import _TN_LEVELS

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
    )
    rows = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey"), F.col("b.l_partkey"))
        .distinct()
        .collect()
    )
    return {(r[0], r[1]) for r in rows}


def _support(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in edges}


def test_trussness_matches_independent_nested_peel(spark):
    got = {
        r["trussness"]: r["n_edges"]
        for r in QUERIES["graph_trussness"](spark, SF_DIR).collect()
    }
    edges = _edges(spark)
    truss = {e: 2 for e in edges}
    cur = set(edges)
    for k, rounds in _TN_LEVELS:
        prev = None
        for _ in range(rounds):
            prev = set(cur)
            cur = {e for e, s in _support(cur).items() if s >= k - 2}
        # the pinned round count INCLUDES the confirming no-change
        # round: the peel must have converged at this level
        assert cur == prev, (k, len(cur), len(prev))
        for e in cur:
            truss[e] = k
    want = collections.Counter(truss.values())
    assert got == dict(want), (got, dict(want))
    # every edge is a 2-truss member; levels must sum to |E|
    assert sum(got.values()) == len(edges)
