"""graph_ktruss and ts_binseg_changepoints vs independent replays (no
shared code with the plans or the oracles): a plain-Python set-based
truss peel, and a brute-force O(n^2) binary segmentation."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans import QUERIES
from kafka_etl_consumer_spark.plans.queries_pipeline53 import (
    _BS_MIN_SEG,
    _KT_K,
    _KT_ROUNDS,
)

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


def test_ktruss_matches_independent_peel(spark):
    got = {
        (r["pu"], r["pv"]): (r["support"], r["n_surviving"])
        for r in QUERIES["graph_ktruss"](spark, SF_DIR).collect()
    }
    edges = _edges(spark)
    prev = None
    for _ in range(_KT_ROUNDS):
        prev = set(edges)
        edges = {e for e, s in _support(edges).items() if s >= _KT_K - 2}
    # the docstring's stationarity claim: the peel has converged by the
    # bounded round count at this graph's density
    assert edges == prev, (len(edges), len(prev))
    supp = _support(edges)
    want = sorted(
        ((u, v, s) for (u, v), s in supp.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[: len(got)]
    assert len(got) > 0
    for u, v, s in want:
        assert (u, v) in got, (u, v)
        assert got[(u, v)] == (s, len(edges)), (u, v, got[(u, v)], s)


def _binseg_gains(xs):
    n = len(xs)
    total = sum(xs)
    best = None
    sp = 0.0
    for t in range(1, n):
        sp += xs[t - 1]
        gain = round(
            math.sqrt(t * (n - t) / n) * abs(sp / t - (total - sp) / (n - t)), 9
        )
        if best is None or gain > best[1]:
            best = (t, gain)
    return best


def test_binseg_matches_bruteforce(spark):
    rows = QUERIES["ts_binseg_changepoints"](spark, SF_DIR).collect()
    from kafka_etl_consumer_spark.plans.registry import _t

    daily = (
        _t(spark, SF_DIR, "events")  # loader only; the replay below is independent
        .select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
        .orderBy("event_type", "d")
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["m"]))
    got = {
        (r["event_type"], r["level"], r["seg_start"], r["seg_end"]): (
            r["change_day"],
            r["gain"],
        )
        for r in rows
    }
    for key, pts in series.items():
        xs = [m for _, m in pts]
        n = len(xs)
        t1, gain1 = _binseg_gains(xs)
        assert got[(key, 1, 1, n)] == (pts[t1 - 1][0].isoformat(), gain1), key
        for a, b in ((1, t1), (t1 + 1, n)):
            seg = xs[a - 1 : b]
            if len(seg) < _BS_MIN_SEG:
                assert (key, 2, a, b) not in got
                continue
            t2, gain2 = _binseg_gains(seg)
            assert got[(key, 2, a, b)] == (
                pts[a - 1 + t2 - 1][0].isoformat(),
                gain2,
            ), (key, a, b)
    # every reported row was checked
    assert len(got) == sum(
        1 + sum(
            1
            for a, b in ((1, _binseg_gains([m for _, m in pts])[0]),
                         (_binseg_gains([m for _, m in pts])[0] + 1, len(pts)))
            if b - a + 1 >= _BS_MIN_SEG
        )
        for pts in series.values()
    )
