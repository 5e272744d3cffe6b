"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...}

Execution is measured with the noop sink (full query execution, no
driver-side collect transfer). One JVM-warmup pass of the flagship query
runs untimed first.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402

# Headline set: the scan/agg/join/window/dedup/similarity workloads that
# dominate at scale (every family from SURVEY.md §2.2 is represented).
HEADLINE = [
    "flagship_event_rollup",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_ship_delay",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_disjunctive",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "grouping_sets_agg",
    "pivot_agg",
    "stats_agg",
    "quantile_histogram",
    "sketch_cms_tokens",
    "sketch_bloom_membership",
    "win_ntile_dist",
    "filter_project",
    "agg_distinct",
    "join_asof",
    "join_range",
    "join_interval_overlap",
    "win_rank_topk",
    "win_analytic",
    "win_session",
    "explode_tokens",
    "json_funcs",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "search_bm25_topk",
    "search_inverted_index",
    "graph_components",
    "graph_pagerank",
    "graph_triangles",
    "cluster_kmeans_refine",
    "dedup_embedding_lsh",
    "dedup_canonical_pick",
    "dedup_incremental_minhash",
    "dedup_span_removal",
    "text_script_detect",
    "corpus_shuffle_shards",
    "sample_reservoir_group",
    "sample_weighted_reservoir",
    "url_funcs",
    "text_html_strip",
    "text_unicode_clean",
    "text_quality",
    "text_pii_redact",
    "text_repetition",
    "tfidf_top_terms",
    "text_bigram_lm_score",
    "text_vocab_oov",
    "pmi_collocations",
    "pack_sequences",
    "embedding_quantize_int8",
    "funnel_steps",
    "retention_cohorts",
    "sessionize_gap",
    "anomaly_zscore",
    "ts_motif_topk",
    "event_transition_matrix",
    "text_chunk_overlap",
    "decontaminate_ngrams",
    "multimodal_meta",
    "multimodal_pixels",
    "multimodal_audio",
    "pipeline_prepare_corpus",
    "corpus_token_budget",
    "corpus_curriculum_stage",
    "corpus_mix_temperature",
    "profile_table",
    "validate_orders",
    "merge_upsert_customers",
    "recursive_ancestors",
    "table_checksum_orders",
    "table_diff_customers",
    "agg_salted_hot_key",
    "join_salted_skew",
    "split_train_val_test",
    "geo_radius_join",
    "search_hybrid_rrf",
    "sketch_hll_distinct",
    "ts_resample_ohlc",
    "ewma_user_value",
    "encode_target_mean",
    "anomaly_mad_outliers",
    "knn_label_predict",
    "fuzzy_match_names",
    "interval_union_coverage",
    "weighted_median_value",
    "ssjoin_prefix_tokens",
    "skipgram_pairs_topk",
    "rolling_median_value",
    "split_group_aware",
    "stats_chi2_independence",
    "embedding_pca_power",
    "drift_psi_value",
    "graph_label_propagation",
    "seq_event_trigrams",
    "embedding_pq_codes",
    "assoc_rules_parts",
    "audit_benford_digits",
    "corpus_jsd_sources",
    "join_point_in_time",
    "multimodal_augment",
    "winsorize_value",
    "impute_missing_values",
    "division_all_months",
    "attribution_last_touch",
    "growth_month_over_month",
    "streak_longest_monthly",
    "ts_acf_lags",
    "ts_cusum_changepoint",
    "corr_matrix_lineitem",
    "feature_hash_64",
    "text_winnowing_fingerprints",
    "graph_jaccard_linkpred",
    "graph_bfs_hops",
    "agg_mode_disc",
    "bin_quantile_deciles",
    "ts_seasonal_strength",
    "mutual_info_buckets",
    "corpus_ngram_novelty",
    "text_readability",
    "join_asof_nearest",
    "win_cume_pct",
    "agg_bitmap_presence",
    "embedding_random_projection",
    "pareto_revenue_8020",
    "gaps_missing_ranges",
    "stats_ttest_welch",
    "orders_interarrival_stats",
    "ts_holt_linear",
    "agg_bool_battery",
    "corpus_dup_rate_by_source",
    "context_length_histogram",
    "embedding_norm_outliers",
    "corpus_source_overlap_minhash",
    "ingest_framed_decode",
    "graph_clustering_local",
    "win_nth_value",
    "sample_systematic_nth",
    "split_kfold_counts",
    "dedup_token_set",
    "time_weighted_avg_value",
    "events_consecutive_dedup",
    "rfm_segments",
    "text_char_entropy",
    "embedding_label_centroids",
    "ts_theilsen_trend",
    "gini_source_concentration",
    "audit_k_anonymity",
    "user_growth_accounting",
    "graph_kcore",
    "stickiness_dau_wau",
    "skew_key_report",
    "join_asof_tolerance",
    "eval_knn_confusion",
    "eval_auc_rank",
    "eval_retrieval_pr",
    "eval_ndcg_rank",
    "eval_calibration_bins",
    "eval_brier_decomposition",
    "graph_degree_powerlaw",
    "ts_decompose_additive",
    "rolling_distinct_users_7d",
    "graph_degree_assortativity",
    "audit_l_diversity",
    "funnel_latency_quantiles",
    "compaction_bin_plan",
    "stats_anova_value",
    "embedding_dim_stats",
    "event_transition_entropy",
    "sim_ann_ivfpq",
    "corpus_bpe_merges",
    "stats_bootstrap_ci",
    "text_zipf_fit",
    "search_phrase_match",
    "ts_snaive_backtest",
    "graph_modularity",
    "sample_coreset_kcenter",
    "embedding_matryoshka_eval",
    "stats_permutation_test",
    "text_lcp_neardup",
    "win_pattern_vshape",
    "stats_ks_test",
    "multimodal_phash_dedup",
    "stats_survival_km",
    "orders_cohort_ltv",
    "audit_fk_orphans",
    "stats_prop_ztest",
    "stats_cuped_adjust",
    "attribution_u_shaped",
    "cluster_silhouette",
    "text_heaps_law",
    "ts_xcorr_lags",
    "recsys_item_cosine",
    "orders_open_backlog",
    "audit_hour_completeness",
    "ts_holtwinters_additive",
    "stats_mannwhitney_u",
    "stats_wilson_ci",
    "eval_lift_deciles",
    "eval_f1_best_threshold",
    "stats_spearman_corr",
    "dedup_class_histogram",
    "sample_balanced_classes",
    "eval_regression_metrics",
    "orders_abc_xyz_class",
    "mine_hard_negatives",
    "stats_power_mde_grid",
    "stats_fdr_bh",
    "funnel_conversion_window",
    "session_path_topk",
    "dedup_minhash_est_error",
    "eval_pr_auc",
    "text_code_detect",
    "orders_duplicate_invoices",
    "multimodal_shot_bounds",
    "sketch_theta_set_ops",
    "stats_srm_check",
    "stats_ratio_delta_ci",
    "stats_kruskal_wallis",
    "stats_levene_test",
    "stats_jarque_bera",
    "stats_effect_sizes",
    "stats_neyman_allocation",
    "profile_column_entropy",
    "markov_stationary_dist",
    "dedup_exact_normalized",
    "embedding_hubness",
    "ts_burstiness_fano",
    "user_decay_engagement",
    "ts_daily_anomaly_iqr",
    "supplier_lead_time",
    "orders_aging_buckets",
    "customer_value_trend_topk",
    "events_audience_overlap",
    "revenue_multi_grain",
    "brand_return_rate_ci",
    "events_hour_profile",
    "skyline_parts_2d",
    "text_langid_accuracy",
    # round-5: binned scale variants of the rank/sort family
    "stats_mannwhitney_u_binned",
    "bin_quantile_deciles_hist",
    "eval_auc_rank_binned",
    "eval_lift_deciles_binned",
    # round-7: regression-as-aggregation, survey sampling, sequential
    # testing on the shard substrate, corpus/embedding accounting
    "ml_ols_normal_eq",
    "ts_fourier_seasonal_fit",
    "embedding_isotropy",
    "corpus_domain_reweight",
    "text_token_fertility",
    "stats_bayes_ab_beta",
    "sample_horvitz_thompson",
    "eval_pinball_quantiles",
    "stats_sprt_boundary",
    "stats_cohens_kappa",
    "ts_ljung_box",
    "ml_decision_stump",
    "ml_naive_bayes_langid",
    "stats_cmh_test",
    "stats_noninferiority_tost",
    "graph_hits_hubs_auth",
    "stats_mcnemar_test",
    "stats_hill_tail_index",
    "eval_mrr_map_at10",
    "text_gopher_rules",
    "corpus_dsir_weights",
    "stats_kendall_tau_b",
    "eval_qini_uplift",
    "ts_page_hinkley",
    "ts_pettitt_changepoint",
    "graph_closeness_harmonic",
    # round-8: HEADLINE completeness — every registered query is benched
    # (tests/test_driver_contract.py asserts set equality with the
    # registry), closing the 57-query gap the r7 verdict flagged. These
    # are the function batteries / set ops / samplers that were skipped
    # as "cheap"; cheap queries cost seconds and completeness is worth
    # more than the runtime.
    "agg_approx_distinct",
    "agg_listagg",
    "agg_minmax_by",
    "array_funcs",
    "bit_ops",
    "cube_agg",
    "date_arith_funcs",
    "date_funcs",
    "dedup_apply_exact",
    "dedup_lsh_recall",
    "dedup_ngram_jaccard",
    "distinct_rows",
    "ingest_roundtrip_decode",
    "join_anti",
    "join_null_safe",
    "join_outer_full",
    "join_semi",
    "join_theta",
    "json_struct_parse",
    "lateral_topk_per_order",
    "map_funcs",
    "math_funcs",
    "multimodal_frames",
    "null_semantics",
    "pos_explode_tokens",
    "regr_agg",
    "rollup_agg",
    "sample_hash_10pct",
    "sample_stratified",
    "sample_weighted_quality",
    "scalar_subquery",
    "scd2_customer_segment",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "sketch_distinct_theta",
    "sort_topk",
    "string_funcs",
    "str_levenshtein_pairs",
    "str_pad_trim",
    "text_bpe_tokens",
    "text_fingerprint",
    "text_lang_id",
    "text_token_stats",
    "ts_gapfill_ffill",
    "udf_grouped_centroid",
    "udf_pandas_cosine",
    "udf_udtf_sentences",
    "union_all_counts",
    "unpivot_measures",
    "variant_extract",
    "width_bucket_hist",
    "win_range_frame",
    "win_sliding",
    "win_tumbling",
    # round-8 batch (queries_pipeline42)
    "stats_breslow_day",
    "stats_dunn_posthoc",
    "ml_gbdt_stump_boost",
    "graph_random_walk_ppr",
    "text_rake_keywords",
    "eval_uplift_at_k_curve",
    "stats_anderson_darling",
    "ts_pettitt_values",
    "ts_cusum_oneside",
    "text_textrank_keywords",
    "stats_friedman_test",
    "stats_page_trend",
    "ts_mann_kendall",
    "stats_cochran_q",
    "ts_runs_test",
    "decontaminate_embeddings",
    # round 9
    "ml_isotonic_pav",
    "graph_betweenness_bounded",
    "heavy_hitters_mg",
    "ml_logistic_irls_grid",
    "text_positionrank_keywords",
    "ts_hurst_rs",
    "stats_mood_median",
    "stats_kendall_w",
    "agg_approx_quantiles",
    "ts_variance_ratio",
    "stats_brunner_munzel",
    "ml_ridge_path",
    "graph_rich_club",
    "stats_rayleigh_uniformity",
    "stats_hodges_lehmann",
    "ts_fisher_g",
    "stats_fligner_killeen",
    "ts_seasonal_mann_kendall",
    # round 10
    "ts_adwin_values",
    "graph_edge_betweenness",
    "text_yake_keywords",
    "stats_tukey_hsd",
    "stats_jonckheere_trend",
    "ts_cox_stuart",
    "ts_bartels_rank",
    "ts_turning_points",
    "graph_local_bridges",
    "ml_poisson_irls_grid",
    "graph_ktruss",
    "ts_binseg_changepoints",
    "stats_cramer_von_mises",
    "ts_spectral_entropy",
    "seq_markov_stationary",
    "ts_pacf_durbin",
    "stats_durbin_watson",
    "stats_grubbs_max",
    "stats_ansari_bradley",
    "stats_games_howell",
    "ts_sample_entropy",
    "ts_dfa_alpha",
    "stats_shapiro_francia",
    "ts_permutation_entropy",
    "graph_trussness",
]


def archive_round(filename: str) -> tuple:
    """Sort key for bench_runs archives: the parsed round number
    (r10 > r9 numerically, unlike lexicographic filename order),
    falling back to the raw name for non-conforming files."""
    m = re.match(r"r(\d+)", filename)
    return (int(m.group(1)) if m else -1, filename)


def compute_noise(times: dict, sf: str) -> dict | None:
    """Self-adjudicating noise analysis (VERDICT r8 item 3): the
    per-query ratio-vs-previous-archive read that rounds 7 and 8 did
    by hand to separate host contention from real regressions. Two
    signals, emitted into the JSON so no one re-derives them:
    - the q1 control (single-stage, data-light — moves only with
      host load, never with a query change elsewhere), and
    - the ratio distribution vs the latest bench_runs archive at the
      same SF: UNIFORM inflation (median well above 1 with the p10
      also elevated) is machine noise — rerun or compare mins;
      LOCALIZED outliers over a ~1x median are candidate real
      regressions and are listed by name.
    Never fails the bench: any error degrades to noise=null."""
    try:
        runs_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_runs")
        # sort by parsed round number, not lexicographically —
        # "r10_local.json" < "r9_local.json" as strings, which would
        # pin the baseline to r9 forever (ADVICE r9)
        archives = sorted(
            (f for f in os.listdir(runs_dir) if f.endswith("_local.json")),
            key=archive_round,
        )
        baseline_path = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
        if baseline_path is None and archives:
            baseline_path = os.path.join(runs_dir, archives[-1])
        if baseline_path is None:
            return None
        with open(baseline_path) as f:
            prior = json.load(f)
        if str(prior.get("sf")) != str(float(sf)):
            return {"baseline_archive": os.path.basename(baseline_path),
                    "verdict": "sf-mismatch: no comparison"}
        prior_q = prior.get("queries", {})
        ratios = {
            n: round(times[n] / prior_q[n], 3)
            for n in times
            if n in prior_q and prior_q[n] > 0
        }
        if len(ratios) < 10:
            return {"baseline_archive": os.path.basename(baseline_path),
                    "verdict": "too-few-shared-queries"}
        rs = sorted(ratios.values())

        def pct(p: float) -> float:
            return round(rs[min(len(rs) - 1, int(p * len(rs)))], 3)

        med, p10, p90 = pct(0.5), pct(0.1), pct(0.9)
        outliers = dict(sorted(
            ((n, r) for n, r in ratios.items() if r > 1.5),
            key=lambda kv: -kv[1],
        )[:10])
        if med > 1.15 and p10 > 1.0:
            verdict = ("uniform-inflation: host contention — rerun on a "
                       "quiet box or compare per-query mins, do NOT "
                       "adjudicate regressions from this run")
        elif outliers:
            verdict = ("localized: median in-band but named outliers "
                       ">1.5x — candidate real regressions, re-time "
                       "each standalone (min-of-3) before adjudicating")
        else:
            verdict = "in-band"
        return {
            "baseline_archive": os.path.basename(baseline_path),
            "n_compared": len(ratios),
            "q1_control_sec": times.get("q1_pricing_summary"),
            "q1_control_ratio": ratios.get("q1_pricing_summary"),
            "ratio_median": med,
            "ratio_p10": p10,
            "ratio_p90": p90,
            "outliers_over_1.5x": outliers,
            "verdict": verdict,
        }
    except Exception as exc:  # noqa: BLE001 - diagnostics must not kill bench
        print(f"# noise block unavailable: {exc!r}", file=sys.stderr)
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="kafka-etl-consumer-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def run_steady(name: str) -> float:
        # each query benches against a clean cache: ~110 queries' worth of
        # accumulated .cache() blocks otherwise thrash the 8g storage
        # region and LRU-evict the CURRENT query's cache between its two
        # runs (observed: graph_triangles 9.8s in-suite vs 2.4s isolated)
        spark.catalog.clearCache()
        # ... and clearCache only drops SQL-cached relations: every
        # localCheckpoint(eager=False) in the iterative family (connected
        # components, PageRank loops, k-core) leaks a persistent RDD per
        # run (r8 measured 1-3 blocks per canonical-pick run), and a few
        # hundred queries of leakage puts the storage region into
        # eviction churn exactly when the graph queries bench. Unpersist
        # them too.
        # The py4j handle is a private API (JavaMap semantics vary across
        # pyspark versions) — guard so a future upgrade degrades to the
        # pre-r8 behavior (slower steady-state, never a crash).
        try:
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist(False)
        except Exception as exc:  # pragma: no cover - version drift only
            print(f"# persistent-RDD cleanup unavailable: {exc!r}", file=sys.stderr)
        # min of 2: the first run pays one-time whole-stage-codegen JIT
        # compile (measured 0.3-4s/query, constant regardless of data
        # volume); the min reflects the per-data throughput that scales.
        # Outlier drop: while the observed spread exceeds 1.5x (transient
        # machine load — observed 2-5x inflation when the host is busy),
        # take up to two tie-breaker runs; r03's four phantom regressions
        # were exactly this noise mode.
        samples = [run(name), run(name)]
        while max(samples) > 1.5 * min(samples) and len(samples) < 4:
            samples.append(run(name))
        return min(samples)

    def ingest_decode_bench(n: int = 40_000) -> float:
        """The reference's core path: binary-Avro → decoded rows (S3).
        n nested ItemViewEvents decode through the same Arrow mapInPandas
        stage streaming ingest uses; seconds for the full decode pass.

        The payload table is staged to a temp PARQUET first (untimed), so
        the timed region reads a columnar scan + decode — not a
        driver-local Python collection being re-pickled through the
        Python workers on every run (that plumbing inflated the r03
        number to 2.16s with no plan change)."""
        import shutil
        import tempfile

        from pyspark.sql import Row
        from pyspark.sql import types as T

        from kafka_etl_consumer_spark.avro_codec import encode_record, parse_schema
        from kafka_etl_consumer_spark.fixtures import (
            ITEM_VIEW_EVENT_AVSC,
            ITEM_VIEW_EVENT_TOPIC,
            item_view_events,
        )
        from kafka_etl_consumer_spark.streaming.ingest import decode_avro

        schema = parse_schema(ITEM_VIEW_EVENT_AVSC)
        base = [encode_record(schema, r) for r in item_view_events(200)]
        rows = [
            Row(topic=ITEM_VIEW_EVENT_TOPIC, value=bytearray(base[i % 200]))
            for i in range(n)
        ]
        env = T.StructType(
            [T.StructField("topic", T.StringType()), T.StructField("value", T.BinaryType())]
        )
        staging = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            spark.createDataFrame(rows, env).repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(staging)
            df = spark.read.parquet(staging)
            decoded = decode_avro(df, ITEM_VIEW_EVENT_AVSC, keep_cols=["topic"])

            def one() -> float:
                t0 = time.time()
                decoded.write.format("noop").mode("overwrite").save()
                return time.time() - t0

            return min(one(), one())
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    # Untimed warmup: one JVM/codegen query + one Arrow/mapInPandas query
    # (spawns the reusable Python worker pool) so timings reflect steady
    # state, not one-time process startup.
    run("flagship_event_rollup")
    run("multimodal_meta")

    times = {name: round(run_steady(name), 3) for name in HEADLINE}
    times["ingest_decode_40k"] = round(ingest_decode_bench(), 3)
    total = round(sum(times.values()), 3)

    def family(name: str) -> str:
        if name[0] == "q" and name[1].isdigit():
            return "tpch"
        head = name.split("_", 1)[0]
        return {
            "dedup": "dedup", "ssjoin": "dedup", "decontaminate": "dedup",
            "sim": "similarity", "knn": "similarity", "cluster": "similarity",
            "fuzzy": "similarity", "search": "search", "graph": "graph",
            "embedding": "embedding", "feature": "embedding",
            "text": "text", "tfidf": "text", "pmi": "text",
            "skipgram": "text", "explode": "text",
            "corpus": "corpus", "pack": "corpus", "pipeline": "corpus",
            "ts": "timeseries", "ewma": "timeseries", "anomaly": "timeseries",
            "streak": "timeseries", "growth": "timeseries",
            "seq": "timeseries", "sessionize": "timeseries",
            "win": "window", "agg": "agg", "stats": "stats",
            "grouping": "agg", "pivot": "agg", "quantile": "agg",
            "sketch": "sketch", "multimodal": "multimodal",
            "ingest": "ingest", "join": "join", "sample": "sampling",
            "split": "sampling", "filter": "scan", "sort": "scan",
        }.get(head, "misc")

    fams: dict = {}
    for name, t in times.items():
        fams[family(name)] = round(fams.get(family(name), 0.0) + t, 3)

    # Key order is deliberate, because the driver persists only the last
    # 2000 chars of stdout (BENCH_r02/r03 both lost the total that way):
    # the headline metric/value lead (total parseable from the first 500
    # chars), the big per-query map sits in the middle, and the family
    # subtotals + a duplicate total_sec trail so the stored TAIL retains
    # the headline numbers too.
    payload = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(times),
        "queries": times,
        "families": fams,
        "noise": compute_noise(times, sf),
        "total_sec": total,
    }
    print(json.dumps(payload))
    # Durability (VERDICT r10 item 5/9): the driver persists only a stdout
    # TAIL, and round 9's per-query map was lost to exactly that truncation
    # (BENCH_r09 parsed: null), erasing the round-over-round comparison.
    # Also write the full JSON to a file so the record can never depend on
    # a 2000-char tail again. Best-effort: a read-only checkout must not
    # fail the bench.
    try:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_runs", "last_run.json"
        )
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as exc:
        print(f"# last_run.json not written: {exc!r}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
