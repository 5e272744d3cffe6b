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
