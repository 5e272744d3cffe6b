"""End-to-end example of the round-2 retrieval + ML-prep surface:

1. hybrid search: BM25 and cosine candidates fused with RRF
2. k-NN label transfer over the embedding table
3. leakage-free group-aware split of the event log
4. PSI drift check between the month's halves
5. PQ compression codes for the embedding store

Run: python examples/retrieval_mlprep_example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="retrieval-mlprep-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== hybrid retrieval (RRF of BM25 + cosine) ==")
    QUERIES["search_hybrid_rrf"](spark, sf_dir).show(10, truncate=False)

    print("== 5-NN label transfer ==")
    knn = QUERIES["knn_label_predict"](spark, sf_dir)
    knn.show(20)
    acc = knn.selectExpr("avg(CAST(correct AS INT)) AS accuracy").collect()[0]
    print(f"k-NN accuracy over 20 held-out vectors: {acc.accuracy:.2f}")

    print("== leakage-free split ==")
    QUERIES["split_group_aware"](spark, sf_dir).show()

    print("== PSI drift between month halves ==")
    QUERIES["drift_psi_value"](spark, sf_dir).show()

    print("== PQ code occupancy ==")
    QUERIES["embedding_pq_codes"](spark, sf_dir).orderBy("subspace", "code").show(32)

    print("== retrieval quality: MRR@10 / MAP@10 of the tf ranking (r7) ==")
    QUERIES["eval_mrr_map_at10"](spark, sf_dir).show()

    print("== Gopher quality-rule battery over the corpus (r7) ==")
    QUERIES["text_gopher_rules"](spark, sf_dir).show(truncate=False)

    print("== DSIR importance-weight histogram (target: lang=en) (r7) ==")
    QUERIES["corpus_dsir_weights"](spark, sf_dir).orderBy("bin").show()

    spark.stop()


if __name__ == "__main__":
    main()
