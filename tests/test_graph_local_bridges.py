"""graph_local_bridges: the engine's wedge-join support counts vs an
independent adjacency-set intersection (no shared code with the plan
or the oracle), plus the Granovetter property that defines the flag."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_support_matches_set_intersection(spark):
    rows = QUERIES["graph_local_bridges"](spark, SF_DIR).collect()
    assert len(rows) > 0
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
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    saw_bridge = False
    for r in rows:
        common = adj[r["pu"]] & adj[r["pv"]]
        assert r["support"] == len(common), (r, sorted(common))
        assert r["deg_u"] == len(adj[r["pu"]])
        assert r["deg_v"] == len(adj[r["pv"]])
        assert r["is_local_bridge"] == int(len(common) == 0)
        saw_bridge |= r["is_local_bridge"] == 1
    # the top-40 cut (support ascending) must actually exercise the flag
    assert saw_bridge
