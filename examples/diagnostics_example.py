"""End-to-end example of the round-3 diagnostics + feature surface:

1. metric-stream diagnostics: ACF, CUSUM change point, seasonal strength
2. feature screens: correlation matrix, mutual information
3. fingerprinting: winnowing summary, n-gram novelty
4. graph insight: Jaccard link prediction, BFS hop distances
5. cheap representations: JL random projection, bitmap presence

Run: python examples/diagnostics_example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="diagnostics-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== hourly autocorrelation (is the metric persistent?) ==")
    QUERIES["ts_acf_lags"](spark, sf_dir).orderBy("event_type", "lag").show(10)

    print("== CUSUM change point per event type ==")
    QUERIES["ts_cusum_changepoint"](spark, sf_dir).orderBy("event_type").show()

    print("== hour-of-day seasonal strength ==")
    QUERIES["ts_seasonal_strength"](spark, sf_dir).orderBy("event_type").show()

    print("== amount-column correlation matrix ==")
    QUERIES["corr_matrix_lineitem"](spark, sf_dir).show()

    print("== mutual information: event_type vs value bucket ==")
    QUERIES["mutual_info_buckets"](spark, sf_dir).orderBy("event_type").show()

    print("== winnowing fingerprint summary (first 5 docs) ==")
    QUERIES["text_winnowing_fingerprints"](spark, sf_dir).orderBy("doc_id").show(5)

    print("== most novel documents ==")
    (
        QUERIES["corpus_ngram_novelty"](spark, sf_dir)
        .orderBy("novel_frac", ascending=False)
        .show(5)
    )

    print("== link prediction: co-order neighborhoods ==")
    QUERIES["graph_jaccard_linkpred"](spark, sf_dir).show(10)

    print("== BFS hop histogram from the smallest part ==")
    from pyspark.sql import functions as F

    QUERIES["graph_bfs_hops"](spark, sf_dir).groupBy("hops").agg(
        F.count(F.lit(1)).alias("n_vertices")
    ).orderBy("hops").show()

    print("== JL projection of the first 5 embeddings ==")
    QUERIES["embedding_random_projection"](spark, sf_dir).orderBy("vec_id").show(5)

    print("== hour-presence bitmaps per cohort ==")
    QUERIES["agg_bitmap_presence"](spark, sf_dir).orderBy(
        "event_type", "cohort"
    ).show(10)

    print("== Page-Hinkley drift alarm on the daily mean value (r7) ==")
    QUERIES["ts_page_hinkley"](spark, sf_dir).show()

    print("== Pettitt rank changepoint per event type (r7) ==")
    QUERIES["ts_pettitt_changepoint"](spark, sf_dir).orderBy("event_type").show()

    print("== harmonic closeness of the 5 smallest co-order parts (r7) ==")
    QUERIES["graph_closeness_harmonic"](spark, sf_dir).orderBy("source").show()

    spark.stop()


if __name__ == "__main__":
    main()
