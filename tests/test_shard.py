"""operators/shard.py — range-sharded total-order substrate.

Every helper is checked against the single-partition window it replaces
(bit-identical results), including adversarial shapes: skewed shard
keys, heavy ties on the shard key (resolved by the tiebreaker), string
orders, descending orders, empty and single-row inputs, and shard
counts that exceed the row count (empty shards in the middle)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.shard import (
    exact_ntile,
    sharded_lag,
    sharded_prefix_sums,
    with_global_row_number,
)


def _mismatches(df, a, b):
    return df.filter(~F.col(a).eqNullSafe(F.col(b))).count()


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of the mass on key 5 (one hot equi-width bucket), ids unique
    rows = [Row(id=i, key=5.0 if i % 10 else float(i % 97), val=i % 7) for i in range(500)]
    return spark.createDataFrame(rows)


def test_row_number_matches_global_window(spark, skewed):
    got = with_global_row_number(skewed, ["key", "id"], "rn", n_col="n")
    exp = skewed.select(
        "id", F.row_number().over(Window.orderBy("key", "id")).alias("rn_e")
    )
    j = got.join(exp, "id")
    assert _mismatches(j, "rn", "rn_e") == 0
    assert j.filter(F.col("n") != 500).count() == 0


def test_row_number_desc_order(spark, skewed):
    got = with_global_row_number(
        skewed,
        [F.col("key").desc(), F.col("id").asc()],
        "rn",
        shard_key=-F.col("key"),
    )
    exp = skewed.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.col("key").desc(), F.col("id").asc()))
        .alias("rn_e"),
    )
    assert _mismatches(got.join(exp, "id"), "rn", "rn_e") == 0


def test_row_number_more_shards_than_rows(spark):
    df = spark.createDataFrame([Row(id=i, key=float(i)) for i in range(5)])
    got = with_global_row_number(df, ["key", "id"], "rn", num_shards=64)
    exp = df.select("id", F.row_number().over(Window.orderBy("key", "id")).alias("rn_e"))
    assert _mismatches(got.join(exp, "id"), "rn", "rn_e") == 0


def test_row_number_constant_key_single_bucket(spark):
    df = spark.createDataFrame([Row(id=i, key=1.0) for i in range(20)])
    got = with_global_row_number(df, ["key", "id"], "rn")
    exp = df.select("id", F.row_number().over(Window.orderBy("key", "id")).alias("rn_e"))
    assert _mismatches(got.join(exp, "id"), "rn", "rn_e") == 0


def test_row_number_empty_input(spark):
    df = spark.createDataFrame([], "id long, key double")
    assert with_global_row_number(df, ["key", "id"], "rn").count() == 0


def test_prefix_sums_match_global_window(spark, skewed):
    got = sharded_prefix_sums(skewed, ["key", "id"], {"val": "cum"})
    w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, 0)
    exp = skewed.select("id", F.sum("val").over(w).alias("cum_e"))
    assert _mismatches(got.join(exp, "id"), "cum", "cum_e") == 0


def test_prefix_sums_two_columns(spark, skewed):
    two = skewed.withColumn("val2", F.col("val") * 3 + 1)
    got = sharded_prefix_sums(two, ["key", "id"], {"val": "c1", "val2": "c2"})
    w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, 0)
    exp = two.select(
        "id",
        F.sum("val").over(w).alias("c1_e"),
        F.sum("val2").over(w).alias("c2_e"),
    )
    j = got.join(exp, "id")
    assert _mismatches(j, "c1", "c1_e") == 0 and _mismatches(j, "c2", "c2_e") == 0


def test_sharded_lag_matches_global_window(spark, skewed):
    got = sharded_lag(skewed, ["key", "id"], ["id", "val"])
    w = Window.orderBy("key", "id")
    exp = skewed.select(
        "id",
        F.lag("id").over(w).alias("pi_e"),
        F.lag("val").over(w).alias("pv_e"),
    )
    j = got.join(exp, "id")
    assert _mismatches(j, "prev_id", "pi_e") == 0
    assert _mismatches(j, "prev_val", "pv_e") == 0
    # exactly one row (the global first) has NULL lags
    assert got.filter(F.col("prev_id").isNull()).count() == 1


def test_sharded_lag_string_order(spark):
    rows = [Row(id=i, s=f"{'abcxyz'[i % 6]}-{i:03d}") for i in range(200)]
    df = spark.createDataFrame(rows)
    key = F.conv(
        F.rpad(F.hex(F.encode(F.substring("s", 1, 4), "UTF-8")), 8, "0"), 16, 10
    ).cast("double")
    got = sharded_lag(df, ["s", "id"], ["s"], shard_key=key)
    exp = df.select("id", F.lag("s").over(Window.orderBy("s", "id")).alias("ps_e"))
    assert _mismatches(got.join(exp, "id"), "prev_s", "ps_e") == 0


def test_exact_ntile_matches_window_ntile(spark, skewed):
    for k in (3, 7, 10):
        got = exact_ntile(skewed, ["key", "id"], k, out_col="b")
        exp = skewed.select(
            "id", F.ntile(k).over(Window.orderBy("key", "id")).alias("b_e")
        )
        assert _mismatches(got.join(exp, "id"), "b", "b_e") == 0, k


def test_exact_ntile_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame([Row(id=i, key=float(i)) for i in range(4)])
    got = exact_ntile(df, ["key", "id"], 10, out_col="b")
    exp = df.select("id", F.ntile(10).over(Window.orderBy("key", "id")).alias("b_e"))
    assert _mismatches(got.join(exp, "id"), "b", "b_e") == 0


def test_no_unpartitioned_window_over_data(spark, skewed):
    """The substrate's own plan: every unpartitioned window sits above
    the |shards|-row aggregate, never above row-grain data."""
    got = with_global_row_number(skewed, ["key", "id"], "rn")
    plan = got._jdf.queryExecution().optimizedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    for node in walk(plan):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().size() == 0
        ):
            # must have an Aggregate beneath (the per-shard count table)
            sub = [c.getClass().getSimpleName() for c in walk(node)]
            assert "Aggregate" in sub


def test_upstream_exchange_reused_across_branches(spark):
    """The pruning-barrier zero term (shard._zero) must keep the substrate's
    auxiliary branches canonically equal to the main branch, so the
    upstream aggregate's shuffle materializes ONCE (ReusedExchange in the
    executed adaptive plan) instead of once per branch."""
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.shard import exact_ntile

    ev = spark.createDataFrame(
        [Row(user_id=i % 37, v=float(i % 11)) for i in range(2000)]
    )
    u = ev.groupBy("user_id").agg(F.sum("v").alias("score"))
    got = exact_ntile(u, ["score", "user_id"], 5, out_col="b", shard_key="score")
    got.collect()
    executed = got._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_substrate_keeps_column_pruning_at_the_scan(spark, sf_dir):
    """The pruning barrier must not widen the SCAN: it references all
    columns of the (already projected) input frame, so the parquet
    reader still reads only the query's columns — asserted on
    sample_systematic_nth (4 of events' 6 columns) for every branch."""
    from kafka_etl_consumer_spark.plans import QUERIES

    df = QUERIES["sample_systematic_nth"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas, "no scans found"
    for line in schemas:
        assert "props" not in line and "user_id" not in line, line


def test_substrate_tolerates_map_columns(spark):
    """hash() rejects MapType; the barrier must skip map columns (it may
    cost exchange reuse, never correctness) instead of failing analysis
    — events-like frames carry a props map."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(id=i, key=float(i % 9), props={"a": str(i)}) for i in range(60)]
    )
    agg = df.groupBy("key", "id").agg(F.first("props").alias("props"))
    got = with_global_row_number(agg, ["key", "id"], "rn")
    exp = agg.select(
        "id", F.row_number().over(Window.orderBy("key", "id")).alias("rn_e")
    )
    assert _mismatches(got.join(exp, "id"), "rn", "rn_e") == 0


def test_null_shard_keys_rank_nulls_first(spark):
    """NULL order keys must rank exactly where the ascending NULLS-FIRST
    window puts them — FIRST — not mid-sequence in the top shard (the
    least(s-1, floor(NULL)) gotcha, VERDICT r6 item 1). Checked across
    all four helpers with several NULL rows and a unique tiebreaker."""
    rows = [
        Row(id=i, key=None if i % 7 == 0 else float(i % 23), val=i % 5)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, key double, val bigint"
    )
    w = Window.orderBy("key", "id")

    rn = with_global_row_number(df, ["key", "id"], "rn", num_shards=8)
    rn_e = df.select("id", F.row_number().over(w).alias("rn_e"))
    assert _mismatches(rn.join(rn_e, "id"), "rn", "rn_e") == 0

    ps = sharded_prefix_sums(df, ["key", "id"], {"val": "run"}, num_shards=8)
    ps_e = df.select(
        "id",
        F.sum("val").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run_e"),
    )
    assert _mismatches(ps.join(ps_e, "id"), "run", "run_e") == 0

    lg = sharded_lag(df, ["key", "id"], ["val"], num_shards=8)
    lg_e = df.select("id", F.lag("val").over(w).alias("prev_val_e"))
    assert _mismatches(lg.join(lg_e, "id"), "prev_val", "prev_val_e") == 0

    nt = exact_ntile(df, ["key", "id"], 4, "bucket", num_shards=8)
    nt_e = df.select("id", F.ntile(4).over(w).alias("bucket_e"))
    assert _mismatches(nt.join(nt_e, "id"), "bucket", "bucket_e") == 0


def test_all_null_shard_keys(spark):
    """Degenerate case: EVERY key NULL — min/max are NULL so hi==lo is
    NULL; the isNull branch must still route every row to one shard and
    the tiebreaker alone defines the order."""
    df = spark.createDataFrame(
        [Row(id=i, key=None) for i in range(50)], "id bigint, key double"
    )
    got = with_global_row_number(df, ["key", "id"], "rn", num_shards=4)
    exp = df.select(
        "id", F.row_number().over(Window.orderBy("key", "id")).alias("rn_e")
    )
    assert _mismatches(got.join(exp, "id"), "rn", "rn_e") == 0


def test_prefix_extrema_matches_global_window(spark, skewed):
    """Running min/max, inclusive and exclusive frames, vs the plain
    unpartitioned window — including NULL results for the global first
    row(s) under the exclusive frame."""
    from kafka_etl_consumer_spark.operators.shard import sharded_prefix_extrema

    w = Window.orderBy("key", "id")
    for kind, fn in (("min", F.min), ("max", F.max)):
        for inclusive, frame_end in ((True, 0), (False, -1)):
            got = sharded_prefix_extrema(
                skewed, ["key", "id"], {"val": "run"},
                kind=kind, inclusive=inclusive, num_shards=8,
            )
            exp = skewed.select(
                "id",
                fn("val")
                .over(w.rowsBetween(Window.unboundedPreceding, frame_end))
                .alias("run_e"),
            )
            assert _mismatches(got.join(exp, "id"), "run", "run_e") == 0, (
                kind, inclusive,
            )
