"""Salted aggregation / join must be semantically identical to the direct
forms, and the salted agg's first shuffle must be on (keys, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.skew import salted_agg, salted_join
from kafka_etl_consumer_spark.sources.tables import load_table


def test_salted_agg_matches_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = salted_agg(
        ev,
        keys=["event_type"],
        specs=[
            ("count", "*", "n"),
            ("sum", "value", "sum_v"),
            ("min", "value", "min_v"),
            ("max", "value", "max_v"),
            ("avg", "value", "avg_v"),
        ],
        salt_src="event_id",
        buckets=16,
    )
    want = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.avg("value").alias("avg_v"),
    )
    a = {r.event_type: r for r in got.collect()}
    b = {r.event_type: r for r in want.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k].n == b[k].n
        assert abs(a[k].sum_v - b[k].sum_v) < 1e-6
        assert a[k].min_v == b[k].min_v and a[k].max_v == b[k].max_v
        assert abs(a[k].avg_v - b[k].avg_v) < 1e-9


def test_salted_agg_shuffles_on_salt_first(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"], [("count", "*", "n")], salt_src="event_id", buckets=16
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two shuffles; the inner (first-executed) one partitions on
    # (event_type, salt) — Spark renames the salt to _groupingexpression
    assert plan.count("Exchange hashpartitioning") == 2
    inner = plan[plan.rindex("Exchange hashpartitioning") :].splitlines()[0]
    assert "_groupingexpression" in inner or "__salt" in inner
    assert "xxhash64" in plan  # deterministic salt, not rand()


def test_salted_join_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    got = salted_join(li, p, on="l_partkey", salt_src="l_orderkey", buckets=4)
    want = li.join(p, "l_partkey")
    assert got.count() == want.count()
    g = got.groupBy("p_brand").agg(F.sum("l_quantity").alias("q")).collect()
    w = want.groupBy("p_brand").agg(F.sum("l_quantity").alias("q")).collect()
    assert sorted((r.p_brand, round(r.q, 4)) for r in g) == sorted(
        (r.p_brand, round(r.q, 4)) for r in w
    )


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    # dim missing most part keys → left join must keep unmatched fact rows
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_partkey") < 20)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    got = salted_join(li, p, on="l_partkey", salt_src="l_orderkey", buckets=4, how="left")
    want = li.join(p, "l_partkey", "left")
    assert got.count() == want.count()
    assert (
        got.filter(F.col("p_brand").isNull()).count()
        == want.filter(F.col("p_brand").isNull()).count()
    )


def test_salted_join_rejects_outer(spark):
    """ADVICE r1: dim side is replicated x buckets, so right/full outer
    would emit unmatched dim rows once per salt replica."""
    import pytest
    from kafka_etl_consumer_spark.operators.skew import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(df, df, on="k", salt_src="k", how=how)


def test_weighted_reservoir_exact_k_and_weight_bias(spark):
    """A-ES: exactly k rows, deterministic repeat, and heavier rows
    overrepresented vs uniform."""
    from kafka_etl_consumer_spark.operators.sampling import weighted_reservoir_k

    rows = [(str(i), 1000.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, w double")
    got = weighted_reservoir_k(df, 50, "w", "k")
    ids = [r.k for r in got.collect()]
    assert len(ids) == 50
    assert ids == [r.k for r in weighted_reservoir_k(df, 50, "w", "k").collect()]
    heavy = sum(1 for i in ids if int(i) < 50)
    # 50 heavy rows (w=1000) vs 450 light (w=1): heavy should dominate
    assert heavy >= 40
    # zero/negative weights never sampled
    df2 = spark.createDataFrame([("a", 0.0), ("b", -1.0), ("c", 2.0)], "k string, w double")
    assert [r.k for r in weighted_reservoir_k(df2, 3, "w", "k").collect()] == ["c"]
