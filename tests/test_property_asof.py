"""Property test: the engine's asof_join must agree with pandas
merge_asof (an independent implementation) on randomized inputs.
Right-side timestamps are made unique per key so tie-break rules (which
differ between implementations) never decide the answer."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_etl_consumer_spark.operators.joins import asof_join

keys = st.integers(min_value=0, max_value=3)
ts = st.integers(min_value=0, max_value=1000)

left_rows = st.lists(st.tuples(keys, ts), min_size=1, max_size=25)
right_rows = st.lists(st.tuples(keys, ts, st.integers(0, 10**6)), min_size=1, max_size=25)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(
    left=left_rows,
    right=right_rows,
    strategy=st.sampled_from(["merge", "rank"]),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(max_examples=24, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_matches_pandas(sess, left, right, strategy, direction):
    lpdf = pd.DataFrame(left, columns=["k", "ts"]).drop_duplicates()
    lpdf["lid"] = range(len(lpdf))
    rpdf = (
        pd.DataFrame(right, columns=["k", "rts", "val"])
        .drop_duplicates(subset=["k", "rts"])  # unique right ts per key: no ties
    )

    ldf = sess.createDataFrame(lpdf)
    rdf = sess.createDataFrame(rpdf)
    got = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts",
        direction=direction, how="left", strategy=strategy,
    ).toPandas()

    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("rts", kind="stable"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
    )

    g = got.sort_values("lid")[["lid", "rts", "val"]].reset_index(drop=True)
    w = want.sort_values("lid")[["lid", "rts", "val"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@given(left=left_rows, right=right_rows)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_inner_strategies_agree(sess, left, right):
    """merge and rank strategies must return identical rows for how='inner'
    (distinct left rows), including tiebreaker picks on shared timestamps."""
    lpdf = pd.DataFrame(left, columns=["k", "ts"]).drop_duplicates()
    rpdf = pd.DataFrame(right, columns=["k", "rts", "val"])  # ties kept

    ldf = sess.createDataFrame(lpdf)
    rdf = sess.createDataFrame(rpdf)
    kw = dict(on="k", left_ts="ts", right_ts="rts", tiebreakers=["val"],
              direction="backward", how="inner")
    a = asof_join(ldf, rdf, strategy="merge", **kw).toPandas()
    b = asof_join(ldf, rdf, strategy="rank", **kw).toPandas()
    cols = ["k", "ts", "rts", "val"]
    a = a[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    b = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
