"""Property tests for operators/shard.py — the sharded total-order
substrate must be BIT-IDENTICAL to the single-partition window forms it
replaced, for any data distribution. Hypothesis drives randomized key
distributions (heavy ties, skewed masses, negatives, constant keys) and
shard counts; results are compared against an independent Python
computation over the sorted rows, not Spark's own window (so a shared
Spark-side bug cannot self-confirm).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from kafka_etl_consumer_spark.operators.shard import (
    exact_ntile,
    sharded_lag,
    sharded_prefix_sums,
    with_global_row_number,
)

# keys drawn from a small domain => heavy tie structure; ids unique
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=40,
)

shards_strategy = st.sampled_from([1, 2, 3, 7, 16])


def _df(spark, data):
    # unique id per row; key from the drawn tuple; val deterministic
    return spark.createDataFrame(
        [
            Row(id=i, key=float(k), val=int(v))
            for i, (k, v) in enumerate(data)
        ]
    )


def _sorted_rows(data):
    return sorted(
        ((float(k), i, int(v)) for i, (k, v) in enumerate(data)),
        key=lambda t: (t[0], t[1]),
    )


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy, s=shards_strategy)
def test_global_row_number_property(sess, data, s):
    got = {
        r["id"]: r["rn"]
        for r in with_global_row_number(
            _df(sess, data), ["key", "id"], "rn", num_shards=s
        ).collect()
    }
    expected = {
        i: pos + 1 for pos, (_, i, _) in enumerate(_sorted_rows(data))
    }
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy, s=shards_strategy, k=st.sampled_from([1, 3, 10]))
def test_exact_ntile_property(sess, data, s, k):
    got = {
        r["id"]: r["b"]
        for r in exact_ntile(
            _df(sess, data), ["key", "id"], k, out_col="b", num_shards=s
        ).collect()
    }
    n = len(data)
    q, rem = divmod(n, k)
    expected = {}
    for pos, (_, i, _) in enumerate(_sorted_rows(data)):
        rn = pos + 1
        if rn <= rem * (q + 1):
            expected[i] = (rn - 1) // (q + 1) + 1
        else:
            expected[i] = rem + (rn - rem * (q + 1) - 1) // q + 1
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy, s=shards_strategy)
def test_prefix_sums_property(sess, data, s):
    got = {
        r["id"]: r["cum"]
        for r in sharded_prefix_sums(
            _df(sess, data), ["key", "id"], {"val": "cum"}, num_shards=s
        ).collect()
    }
    expected, running = {}, 0
    for _, i, v in _sorted_rows(data):
        running += v
        expected[i] = running
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy, s=shards_strategy)
def test_sharded_lag_property(sess, data, s):
    got = {
        r["id"]: (r["prev_id"], r["prev_val"])
        for r in sharded_lag(
            _df(sess, data), ["key", "id"], ["id", "val"], num_shards=s
        ).collect()
    }
    expected, prev = {}, None
    for _, i, v in _sorted_rows(data):
        expected[i] = (None, None) if prev is None else prev
        prev = (i, v)
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy, s=shards_strategy, inclusive=st.booleans())
def test_prefix_extrema_property(sess, data, s, inclusive):
    """Running min under randomized ties/skew/shard counts vs an
    independent Python fold (exclusive frame: None for the first row)."""
    from kafka_etl_consumer_spark.operators.shard import sharded_prefix_extrema

    got = {
        r["id"]: r["run"]
        for r in sharded_prefix_extrema(
            _df(sess, data), ["key", "id"], {"val": "run"},
            kind="min", inclusive=inclusive, num_shards=s,
        ).collect()
    }
    expected = {}
    cur = None
    for _, i, v in _sorted_rows(data):
        if inclusive:
            cur = v if cur is None else min(cur, v)
            expected[i] = cur
        else:
            expected[i] = cur
            cur = v if cur is None else min(cur, v)
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=30,
    ),
    s=shards_strategy,
)
def test_row_number_null_keys_property(sess, data, s):
    """NULL keys anywhere in the distribution must rank NULLS FIRST
    (Python: None sorts before every int here), per the r7 contract."""
    df = sess.createDataFrame(
        [
            Row(id=i, key=None if k is None else float(k), val=int(v))
            for i, (k, v) in enumerate(data)
        ],
        "id bigint, key double, val bigint",
    )
    got = {
        r["id"]: r["rn"]
        for r in with_global_row_number(
            df, ["key", "id"], "rn", num_shards=s
        ).collect()
    }
    ordered = sorted(
        ((k is not None, k if k is not None else 0.0, i) for i, (k, _) in enumerate(data)),
    )
    expected = {i: pos + 1 for pos, (_, _, i) in enumerate(ordered)}
    assert got == expected
