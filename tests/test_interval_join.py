"""interval_join: bucketed overlap join — every overlapping same-key pair
exactly once (emit-once bucket trick, no distinct), boundary-inclusive,
checked against a brute-force Python oracle across bucket widths.
"""

from __future__ import annotations

import itertools

from kafka_etl_consumer_spark.operators.joins import interval_join

# (key, id, start, end) — spans within a bucket, across many buckets,
# touching endpoints, identical intervals, and a key with no overlaps
ROWS = [
    ("a", 1, 0, 5),
    ("a", 2, 5, 9),      # touches id 1 at 5 (inclusive → overlap)
    ("a", 3, 10, 50),    # spans multiple 16-buckets
    ("a", 4, 49, 120),   # overlaps 3 at 49..50, spans many buckets
    ("a", 5, 200, 201),  # isolated
    ("b", 6, 0, 5),      # same numbers as key a — must not cross keys
    ("b", 7, 3, 3),      # point interval inside 6
    ("c", 8, 7, 8),      # alone on its key
]


def _expected():
    out = set()
    for (k1, i1, s1, e1), (k2, i2, s2, e2) in itertools.combinations(ROWS, 2):
        if k1 == k2 and s1 <= e2 and s2 <= e1:
            out.add((i1, i2))
    return out


def test_interval_join_matches_bruteforce_all_widths(spark):
    left = spark.createDataFrame(
        [(k, i, s, e) for k, i, s, e in ROWS], "k string, xid int, xs int, xe int"
    )
    right = spark.createDataFrame(
        [(k, i, s, e) for k, i, s, e in ROWS], "k string, yid int, ys int, ye int"
    )
    for w in (1, 3, 16, 1000):
        got = interval_join(
            left, right, on=["k"],
            left_interval=("xs", "xe"), right_interval=("ys", "ye"),
            bucket_width=w,
        ).filter("xid < yid")
        pairs = {(r.xid, r.yid) for r in got.collect()}
        assert pairs == _expected(), f"width={w}"
        # emit-once: no duplicated pair rows even when spans share buckets
        assert got.count() == len(pairs), f"width={w} emitted duplicates"


def test_interval_join_plans_as_equi_join(spark):
    left = spark.createDataFrame([("a", 1, 0, 5)], "k string, xid int, xs int, xe int")
    right = spark.createDataFrame([("a", 2, 3, 9)], "k string, yid int, ys int, ye int")
    df = interval_join(
        left, right, ["k"], ("xs", "xe"), ("ys", "ye"), bucket_width=4
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- property test: random intervals vs brute force -------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ivl = st.tuples(
    st.integers(0, 2),        # key
    st.integers(0, 60),       # start
    st.integers(0, 25),       # span
)
_rows = st.lists(_ivl, min_size=1, max_size=20)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lrows=_rows, rrows=_rows, w=st.sampled_from([1, 5, 13, 64]))
def test_interval_join_property_bruteforce(spark, lrows, rrows, w):
    lt = [(k, i, s, s + d) for i, (k, s, d) in enumerate(lrows)]
    rt = [(k, i, s, s + d) for i, (k, s, d) in enumerate(rrows)]
    left = spark.createDataFrame(lt, "k int, xid int, xs int, xe int")
    right = spark.createDataFrame(rt, "k int, yid int, ys int, ye int")
    got = interval_join(
        left, right, ["k"], ("xs", "xe"), ("ys", "ye"), bucket_width=w
    ).collect()
    got_pairs = sorted((r.xid, r.yid) for r in got)
    want = sorted(
        (i1, i2)
        for (k1, i1, s1, e1) in lt
        for (k2, i2, s2, e2) in rt
        if k1 == k2 and s1 <= e2 and s2 <= e1
    )
    assert got_pairs == want              # exactly the overlap pairs
    assert len(got) == len(set(got_pairs))  # emitted once each
