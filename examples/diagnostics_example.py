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

    print("== Pettitt changepoint on the daily MEAN VALUE (r8) ==")
    QUERIES["ts_pettitt_values"](spark, sf_dir).orderBy("event_type").show()

    print("== sequential decision-interval CUSUM vs a fixed target (r8) ==")
    QUERIES["ts_cusum_oneside"](spark, sf_dir).show()

    print("== harmonic closeness of the 5 smallest co-order parts (r7) ==")
    QUERIES["graph_closeness_harmonic"](spark, sf_dir).orderBy("source").show()

    print("== long-memory: rescaled-range Hurst exponent per type (r9) ==")
    QUERIES["ts_hurst_rs"](spark, sf_dir).orderBy("event_type").show()

    print("== ...and the Lo-MacKinlay variance-ratio TEST of the same  ==")
    print("== question: VR<1 = mean reversion, VR>1 = trending (r9)    ==")
    QUERIES["ts_variance_ratio"](spark, sf_dir).orderBy("event_type", "q").show(8)

    print("== bounded Brandes betweenness: which parts BRIDGE the      ==")
    print("== co-order graph (r9)                                      ==")
    QUERIES["graph_betweenness_bounded"](spark, sf_dir).show(8)

    print("== rich-club: do hub parts co-order with other hubs? (r9)   ==")
    QUERIES["graph_rich_club"](spark, sf_dir).orderBy("k").show()

    print("== batch Misra-Gries: daily modal-item heavy hitters with   ==")
    print("== the n/(k+1) error bound (streaming twin in drift demo)   ==")
    QUERIES["heavy_hitters_mg"](spark, sf_dir).orderBy("key", "item").show(10)

    print("== LIVE drift monitor: the same Page-Hinkley recurrence as a ==")
    print("== stateful stream (state survives across micro-batches)     ==")
    import shutil
    import tempfile

    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from kafka_etl_consumer_spark.streaming.drift import page_hinkley_monitor

    schema = T.StructType(
        [
            T.StructField("series", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("m", T.DoubleType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)
    flat = [50.0 + (i % 3) * 0.2 for i in range(10)]  # stationary regime
    shifted = [58.0 + (i % 3) * 0.2 for i in range(5)]  # level shift
    work = tempfile.mkdtemp(prefix="drift_demo_")
    src = os.path.join(work, "src")
    try:

        def arrive(vals, offset):
            rows = [
                Row(series="daily_metric", ts=base + dt.timedelta(days=offset + i), m=v)
                for i, v in enumerate(vals)
            ]
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)

        arrive(flat, 0)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            page_hinkley_monitor(stream, key_col="series", ts_col="ts", value_col="m")
            .writeStream.format("memory")
            .queryName("drift_demo")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            arrive(shifted, len(flat))  # the drift arrives in batch 2
            q.processAllAvailable()
            spark.sql(
                "SELECT * FROM drift_demo ORDER BY n_obs"
            ).show(truncate=False)
        finally:
            q.stop()

        print("== LIVE CUSUM monitor on the same stream (r8): fixed    ==")
        print("== target 51, alarm when the one-sided sum clears h=3   ==")
        from kafka_etl_consumer_spark.streaming.drift import cusum_monitor

        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q2 = (
            cusum_monitor(
                stream2, key_col="series", ts_col="ts", value_col="m",
                target=51.0, slack=0.25, h=3.0,
            )
            .writeStream.format("memory")
            .queryName("cusum_demo")
            .outputMode("update")
            .start()
        )
        try:
            q2.processAllAvailable()
            spark.sql(
                "SELECT * FROM cusum_demo ORDER BY n_obs"
            ).show(truncate=False)
        finally:
            q2.stop()

        print("== LIVE ADWIN monitor on the same stream (r9): no tuned  ==")
        print("== threshold — the window statistically picks its length ==")
        print("== (width << n_obs after the shift = history discarded)  ==")
        from kafka_etl_consumer_spark.streaming.drift import adwin_monitor

        # ADWIN trades tuning for evidence: the Hoeffding bound needs more
        # post-shift observations than PH/CUSUM's tuned thresholds (its
        # false-positive rate is GUARANTEED, theirs depends on the tuned
        # lam/h), so let the shifted regime run longer before it can cut
        arrive([58.0 + (i % 3) * 0.2 for i in range(60)], len(flat) + len(shifted))
        stream3 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q3 = (
            adwin_monitor(
                stream3, key_col="series", ts_col="ts", value_col="m",
                value_range=8.4,  # the Hoeffding R: this metric spans 50.0-58.4
            )
            .writeStream.format("memory")
            .queryName("adwin_demo")
            .outputMode("update")
            .start()
        )
        try:
            q3.processAllAvailable()
            spark.sql(
                "SELECT * FROM adwin_demo ORDER BY n_obs"
            ).show(truncate=False)
        finally:
            q3.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
