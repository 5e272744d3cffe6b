"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the shuffle at read time — THE layout lever for repeated
big-table joins at 100 TB (SURVEY.md §4.2 posture). Asserts the physical
plan: a bucketed orders⋈lineitem has NO Exchange above either scan, while
the unbucketed twin shuffles both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        (
            df.write.mode("overwrite")
            .option("path", f"{warehouse}/{name}_bkt")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"{name}_bkt")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_bkt")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    o = spark.table("orders_bkt")
    li = spark.table("lineitem_bkt")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    # force SMJ so the test is about Exchange elimination, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # bucket-aligned scan: no shuffle feeds the join
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning" not in join_part, plan

        # unbucketed twin: both sides must shuffle
        o2 = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j2 = li2.join(o2, li2.l_orderkey == o2.o_orderkey).groupBy("o_orderstatus").count()
        assert "Exchange hashpartitioning" in _plan(j2).split("SortMergeJoin")[1]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match(spark, sf_dir, bucketed):
    o = spark.table("orders_bkt")
    li = spark.table("lineitem_bkt")
    got = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    o2 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
