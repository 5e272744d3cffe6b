"""Tour of the analytics operators over the synthetic tables.

    python examples/analytics_example.py [sf_dir]     # default sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators import (
    asof_join,
    cosine_pairs_blas,
    exact_dedup,
    minhash_lsh_pairs,
    salted_agg,
    theta_distinct,
)
from kafka_etl_consumer_spark.session import get_spark
from kafka_etl_consumer_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="analytics-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    print("== exact dedup groups (top copies) ==")
    exact_dedup(docs).orderBy(F.desc("n_copies")).show(3)

    print("== MinHash+LSH near-duplicate pairs (jaccard >= 0.5) ==")
    minhash_lsh_pairs(docs).orderBy(F.desc("jaccard")).show(5)

    print("== embedding near-dup pairs within label blocks ==")
    cosine_pairs_blas(emb, threshold=0.4).orderBy(F.desc("score")).show(5)

    print("== as-of join: each event's most recent order ==")
    asof_join(
        ev.select("event_id", "user_id", "ts").limit(1000),
        orders.select(F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
    ).show(5)

    print("== sharded total-order ops: global rank / ntile without a single-partition window ==")
    from kafka_etl_consumer_spark.operators import exact_ntile, sharded_prefix_sums

    cust = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    exact_ntile(
        cust, [F.col("rev").desc(), "o_custkey"], 10,
        out_col="rev_decile", shard_key=-F.col("rev"),
    ).groupBy("rev_decile").count().orderBy("rev_decile").show(10)
    sharded_prefix_sums(
        cust, [F.col("rev").desc(), "o_custkey"], {"rev": "running_rev"},
        shard_key=-F.col("rev"),
    ).orderBy(F.col("rev").desc()).show(3)

    print("== skew-safe aggregation + theta-sketch distinct users ==")
    salted_agg(
        ev, ["event_type"], [("count", "*", "n"), ("avg", "value", "avg_v")],
        salt_src="event_id",
    ).show()
    theta_distinct(ev, "user_id", group_cols=["event_type"], scale=4).show()

    print("== round-10 additions: ADWIN batch twin / YAKE / Tukey HSD ==")
    from kafka_etl_consumer_spark.plans import QUERIES

    QUERIES["ts_adwin_values"](spark, sf_dir).show()
    QUERIES["text_yake_keywords"](spark, sf_dir).show(8)
    QUERIES["stats_tukey_hsd"](spark, sf_dir).filter(
        F.col("significant") == 0
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
