"""SCD2 merge: every row-fate branch, including the ones the registered
query's data can't hit (brand-new keys, NULL attribute transitions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_etl_consumer_spark.operators.scd import scd2_merge

CUR_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ]
)
UPD_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T1 = dt.datetime(2023, 1, 1)
T2 = dt.datetime(2023, 6, 1)
T3 = dt.datetime(2024, 1, 1)


def test_scd2_merge_all_branches(spark):
    cur = spark.createDataFrame(
        [
            Row(k=1, attr="a", valid_from=T1, valid_to=T2),   # closed history
            Row(k=1, attr="b", valid_from=T2, valid_to=None), # open, will change
            Row(k=2, attr="x", valid_from=T1, valid_to=None), # open, no-op update
            Row(k=3, attr="y", valid_from=T1, valid_to=None), # open, no update
            Row(k=5, attr=None, valid_from=T1, valid_to=None),# open NULL attr → value
        ],
        CUR_SCHEMA,
    )
    upd = spark.createDataFrame(
        [
            Row(k=1, attr="c", ts=T3),     # change
            Row(k=2, attr="x", ts=T3),     # no-op (same attr)
            Row(k=4, attr="new", ts=T3),   # brand-new key
            Row(k=5, attr="filled", ts=T3),# NULL → value must version
        ],
        UPD_SCHEMA,
    )
    out = scd2_merge(cur, upd, "k", ["attr"], ts_col="ts")
    rows = {(r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "a", T1, T2),        # history untouched
        (1, "b", T2, T3),        # closed at update ts
        (1, "c", T3, None),      # new open version
        (2, "x", T1, None),      # no-op: NOT re-versioned
        (3, "y", T1, None),      # untouched
        (4, "new", T3, None),    # insert for unseen key
        (5, None, T1, T3),       # NULL attr closed
        (5, "filled", T3, None), # NULL → value new version
    }
    assert out.count() == 8


def test_merge_type1_all_branches(spark):
    """Update, delete, insert, and untouched rows in one merge."""
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.scd import merge_type1

    cur = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, v="B", is_delete=False),   # update
            Row(k=3, v="c", is_delete=True),    # delete
            Row(k=4, v="d", is_delete=False),   # insert
        ]
    )
    got = {r.k: r.v for r in merge_type1(cur, changes, ["k"], "is_delete").collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_merge_type1_without_delete_col(spark):
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.scd import merge_type1

    cur = spark.createDataFrame([Row(k=1, v="a")])
    changes = spark.createDataFrame([Row(k=1, v="A")])
    got = merge_type1(cur, changes, ["k"]).collect()
    assert len(got) == 1 and got[0].v == "A"
