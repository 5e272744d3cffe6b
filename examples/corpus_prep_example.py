"""Tour of the training-data corpus-prep operators, end to end:

    profile -> quality/lang -> chunk -> decontaminate -> token budget ->
    train/val/test split -> pack

    python examples/corpus_prep_example.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.chunking import (
    chunk_documents,
    ngram_contamination,
)
from kafka_etl_consumer_spark.operators.profiling import profile
from kafka_etl_consumer_spark.operators.text import quality_score
from kafka_etl_consumer_spark.plans import QUERIES
from kafka_etl_consumer_spark.session import get_spark
from kafka_etl_consumer_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-prep-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    print("== table profile (one scan) ==")
    profile(docs).show(truncate=40)

    print("== quality scores ==")
    quality_score(docs, keep_cols=("lang",)).orderBy(F.desc("quality")).show(5)

    print("== overlapping token-window chunks ==")
    chunks = chunk_documents(docs, size=64, stride=48)
    chunks.agg(
        F.count("*").alias("n_chunks"), F.avg("n_tokens").alias("avg_chunk_tokens")
    ).show()

    print("== benchmark decontamination (doc_id % 20 == 0 plays the eval set) ==")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    contam = ngram_contamination(train, bench, k=3, threshold=8)
    contam.groupBy("contaminated").count().show()

    print("== per-language token budget fill ==")
    QUERIES["corpus_token_budget"](spark, sf_dir).groupBy("lang").agg(
        F.count("*").alias("docs_kept"), F.max("cum_tokens").alias("tokens_filled")
    ).show()

    print("== deterministic 90/5/5 split ==")
    QUERIES["split_train_val_test"](spark, sf_dir).orderBy("lang", "split").show()

    print("== greedy sequence packing ==")
    QUERIES["pack_sequences"](spark, sf_dir).show(5)

    print("== near-dedup verdicts: minhash pairs -> components -> keeper ==")
    verdicts = QUERIES["dedup_canonical_pick"](spark, sf_dir)
    verdicts.groupBy("is_canonical").count().show()
    # verdicts.filter("is_canonical") is the corpus to train on

    print("== fixed-size per-class reservoir (20 events per type) ==")
    QUERIES["sample_reservoir_group"](spark, sf_dir).groupBy("event_type").count().show()

    spark.stop()


if __name__ == "__main__":
    main()
