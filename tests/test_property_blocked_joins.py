"""Property tests for the two blocked joins whose correctness rests on a
COMPLETENESS argument (the pruning must provably miss nothing):

- ``set_similarity_join_prefix``: prefix filtering vs brute-force Jaccard
  over randomized corpora drawn from a small vocabulary (small vocab →
  dense overlap structure → the prefix bound is exercised at every size).
- ``radius_join``: 3×3 grid-cell blocking vs brute-force haversine over
  randomized points, including cell-boundary coordinates.

Each compares against an independent Python implementation, not the
operator's own formula rearranged.
"""

from __future__ import annotations

import math
from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from kafka_etl_consumer_spark.operators.dedup import set_similarity_join_prefix
from kafka_etl_consumer_spark.operators.geo import radius_join

VOCAB = [f"w{i}" for i in range(12)]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8),
    min_size=2,
    max_size=10,
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


# (1, 3) and (2, 3) are NOT representable on the 6-decimal rounding grid —
# they catch any float/rounded comparison creeping into the exact-rational
# threshold contract (a pair with Jaccard exactly 1/3 must be kept).
@given(
    docs=docs_strategy,
    num_den=st.sampled_from([(1, 2), (3, 5), (7, 10), (1, 3), (2, 3)]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_ssjoin_prefix_complete_and_sound(sess, docs, num_den):
    num, den = num_den
    df = sess.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)]
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in set_similarity_join_prefix(df, num, den).collect()
    }
    sets = {i: set(ws) for i, ws in enumerate(docs)}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        o = len(sets[a] & sets[b])
        # exact-integer threshold, same rational contract as the operator:
        # o/(na+nb-o) >= num/den  <=>  o*(num+den) >= num*(na+nb)
        if o * (num + den) >= num * (len(sets[a]) + len(sets[b])):
            want[(a, b)] = round(o / (len(sets[a]) + len(sets[b]) - o), 6)
    assert got == want


def test_ssjoin_keeps_exact_one_third_boundary_pair(sess):
    # {w0} vs {w0, w1, w2}: overlap 1, union 3 — Jaccard exactly 1/3.
    # round(1/3, 6) = 0.333333 < 1/3, so a rounded-float comparison drops
    # this pair; the exact-rational contract keeps it.
    df = sess.createDataFrame(
        [Row(doc_id=0, text="w0"), Row(doc_id=1, text="w0 w1 w2")]
    )
    got = {(r.id_a, r.id_b) for r in set_similarity_join_prefix(df, 1, 3).collect()}
    assert got == {(0, 1)}


coords = st.tuples(
    st.floats(min_value=-5.0, max_value=5.0, allow_nan=False, width=32),
    st.floats(min_value=-5.0, max_value=5.0, allow_nan=False, width=32),
)
# integers land exactly on cell boundaries — the adversarial case for
# floor-based cell assignment
boundary = st.tuples(
    st.integers(-5, 5).map(float), st.integers(-5, 5).map(float)
)


@given(
    pts=st.lists(st.one_of(coords, boundary), min_size=2, max_size=14),
    radius=st.sampled_from([10.0, 45.0, 75.0]),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_radius_join_complete_and_sound(sess, pts, radius):
    rows = [Row(pid=i, lat=la, lon=lo) for i, (la, lo) in enumerate(pts)]
    df = sess.createDataFrame(rows)
    left = df.select(
        df.pid.alias("a"), df.lat.alias("l_lat"), df.lon.alias("l_lon")
    )
    right = df.select(
        df.pid.alias("b"), df.lat.alias("r_lat"), df.lon.alias("r_lon")
    )
    got = {
        (r.a, r.b)
        for r in radius_join(left, right, radius).select("a", "b").collect()
    }

    def hav(p, q):
        rad = math.radians
        dlat, dlon = rad(q[0] - p[0]), rad(q[1] - p[1])
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(rad(p[0])) * math.cos(rad(q[0])) * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(min(1.0, a)))

    want = {
        (i, j)
        for i, p in enumerate(pts)
        for j, q in enumerate(pts)
        if round(hav(p, q), 3) <= radius
    }
    assert got == want


intervals = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(1, 30)),
    min_size=1,
    max_size=20,
)


@given(iv=intervals)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_interval_union_matches_brute_force(sess, iv):
    """The running-max gaps-and-islands reduction must equal a brute-force
    interval merge — including nested intervals, the classic lag-based
    bug's failure case."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [Row(user_id=u, s=s, e=s + d) for (u, s, d) in iv]
    df = sess.createDataFrame(rows)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "ni", F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0)
    )
    merged = (
        flagged.withColumn("island", F.sum("ni").over(w_run))
        .groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("span"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_islands"), F.sum("span").alias("covered"))
    )
    got = {r.user_id: (r.n_islands, r.covered) for r in merged.collect()}

    want = {}
    by_user: dict = {}
    for u, s, d in iv:
        by_user.setdefault(u, []).append((s, s + d))
    for u, ivs in by_user.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[u] = (len(islands), sum(e - s for s, e in islands))
    assert got == want


weights = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(1, 5)),
    min_size=1,
    max_size=30,
)


@given(wv=weights)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_weighted_median_matches_brute_force(sess, wv):
    """Cumulative-weight lower weighted median == the brute-force scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [Row(g=g, v=float(v), w=w, i=i) for i, (g, v, w) in enumerate(wv)]
    df = sess.createDataFrame(rows)
    w_run = (
        Window.partitionBy("g").orderBy("v", "i").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    w_all = Window.partitionBy("g")
    cum = df.select(
        "g", "v", F.sum("w").over(w_run).alias("cw"), F.sum("w").over(w_all).alias("tw")
    )
    got = {
        r.g: r.wm
        for r in cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("v").alias("wm"))
        .collect()
    }

    want = {}
    by_g: dict = {}
    for i, (g, v, w) in enumerate(wv):
        by_g.setdefault(g, []).append((float(v), i, w))
    for g, vals in by_g.items():
        vals.sort()
        total = sum(w for _, _, w in vals)
        acc = 0
        for v, _, w in vals:
            acc += w
            if acc * 2 >= total:
                want[g] = v
                break
    assert got == want
