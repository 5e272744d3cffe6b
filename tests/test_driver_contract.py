"""Driver-contract invariants that protect the correctness rotation:

- every bench HEADLINE name is a registered query (a typo would make
  the driver's bench abort mid-run);
- the rotation puts never-checked queries ahead of green ones, and
  within the never-checked tie, registration order — so the 24 queries
  carried from round 6 drain BEFORE this round's additions (the
  round-7 drain plan depends on it);
- new-batch modules import last (their names come after the r6
  never-checked prefix in the registry's iteration order).

No Spark session needed: this is pure registry/rotation logic.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry
from kafka_etl_consumer_spark.plans import ORACLES, QUERIES

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

R7_NEW = [
    # queries_pipeline36/37/38 — registered after every round-6 entry
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
]

R8_NEW = [
    # queries_pipeline42 — registered after every round-7 entry
    "stats_breslow_day",
    "stats_dunn_posthoc",
    "ml_gbdt_stump_boost",
    "graph_random_walk_ppr",
    "text_rake_keywords",
    "eval_uplift_at_k_curve",
    "stats_anderson_darling",
    "ts_pettitt_values",
    "ts_cusum_oneside",
    # queries_pipeline43 — round-8 second wave
    "text_textrank_keywords",
    "stats_friedman_test",
    "stats_page_trend",
    "ts_mann_kendall",
    "stats_cochran_q",
    "ts_runs_test",
    "decontaminate_embeddings",
]

R9_NEW = [
    # queries_pipeline44 — registered after every round-8 entry
    "ml_isotonic_pav",
    "graph_betweenness_bounded",
    "heavy_hitters_mg",
    # queries_pipeline45 — round-9 second wave
    "ml_logistic_irls_grid",
    "text_positionrank_keywords",
    "ts_hurst_rs",
    "stats_mood_median",
    "stats_kendall_w",
    "agg_approx_quantiles",
    # queries_pipeline46 — round-9 third wave
    "ts_variance_ratio",
    "stats_brunner_munzel",
    "ml_ridge_path",
    "graph_rich_club",
    # queries_pipeline47 — round-9 fourth wave
    "stats_rayleigh_uniformity",
    "stats_hodges_lehmann",
    # queries_pipeline48 — round-9 fifth wave
    "ts_fisher_g",
    "stats_fligner_killeen",
    # queries_pipeline49 — round-9 sixth wave
    "ts_seasonal_mann_kendall",
]

R10_NEW = [
    # queries_pipeline50 — round-10 first wave
    "ts_adwin_values",
    "graph_edge_betweenness",
    "text_yake_keywords",
    "stats_tukey_hsd",
    # queries_pipeline51 — round-10 second wave
    "stats_jonckheere_trend",
    "ts_cox_stuart",
    "ts_bartels_rank",
    # queries_pipeline52 — round-10 third wave
    "ts_turning_points",
    "graph_local_bridges",
    "ml_poisson_irls_grid",
    # queries_pipeline53 — round-10 fourth wave
    "graph_ktruss",
    "ts_binseg_changepoints",
    "stats_cramer_von_mises",
    # queries_pipeline54 — round-10 fifth wave
    "ts_spectral_entropy",
    "seq_markov_stationary",
    "ts_pacf_durbin",
    # queries_pipeline55 — round-10 sixth wave
    "stats_durbin_watson",
    "stats_grubbs_max",
    "stats_ansari_bradley",
    # queries_pipeline56 — round-10 seventh wave
    "stats_games_howell",
    "ts_sample_entropy",
    "ts_dfa_alpha",
    # queries_pipeline57 — round-10 eighth wave
    "stats_shapiro_francia",
    "ts_permutation_entropy",
    "graph_trussness",
]


def _checked_names() -> set[str]:
    import glob

    names: set[str] = set()
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                names |= set(json.load(f))
        except (OSError, ValueError):
            continue
    return names


def test_bench_headline_names_are_registered():
    import bench

    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not unknown, f"bench.HEADLINE names not in the registry: {unknown}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate HEADLINE"


def test_bench_headline_is_complete():
    """Every registered query must be benched (r7 verdict item 2): a new
    batch can't land without its bench rows. All registry entries are
    batch-queryable by construction (they take (spark, sf_dir)), so there
    is no exclusion set; streaming-only operators live outside the
    registry."""
    import bench

    missing = sorted(set(QUERIES) - set(bench.HEADLINE))
    assert not missing, f"registered queries absent from bench.HEADLINE: {missing}"


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_rotation_never_checked_lead_and_new_batches_trail():
    order = list(entry.queries())
    checked = _checked_names()
    never = [n for n in order if n not in checked]
    # every never-checked name must come before every checked-green name
    if never:
        last_never = max(order.index(n) for n in never)
        first_checked = min(
            (order.index(n) for n in order if n in checked), default=None
        )
        # greens rotate to the back: no checked-green query may sit in
        # front of a never-checked one (reds score -1 and legitimately
        # lead; exclude them)
        reds = {
            n
            for n in checked
            if entry._check_counts().get(n, 0) < 0
        }
        greens_before = [
            n
            for n in order[:last_never]
            if n in checked and n not in reds
        ]
        assert not greens_before, (
            "checked-green queries ahead of never-checked ones: "
            f"{greens_before[:5]}"
        )
    # registration order breaks never-checked ties: the newest batch
    # (registered last) must trail every OTHER never-checked query
    newest = set(R10_NEW)
    older_never = [n for n in never if n not in newest]
    if older_never and newest & set(never):
        last_old = max(order.index(n) for n in older_never)
        first_new = min(order.index(n) for n in R10_NEW if n in never)
        assert last_old < first_new, (
            "a round-10 query would drain before an older never-checked one"
        )


def test_r7_new_queries_all_registered_with_oracles():
    missing = [n for n in R7_NEW if n not in QUERIES]
    no_oracle = [n for n in R7_NEW if n not in ORACLES]
    assert not missing and not no_oracle, (missing, no_oracle)


def test_r8_new_queries_all_registered_with_oracles():
    missing = [n for n in R8_NEW if n not in QUERIES]
    no_oracle = [n for n in R8_NEW if n not in ORACLES]
    assert not missing and not no_oracle, (missing, no_oracle)


def test_r9_new_queries_all_registered_with_oracles():
    missing = [n for n in R9_NEW if n not in QUERIES]
    no_oracle = [n for n in R9_NEW if n not in ORACLES]
    assert not missing and not no_oracle, (missing, no_oracle)


def test_r10_new_queries_all_registered_with_oracles():
    missing = [n for n in R10_NEW if n not in QUERIES]
    no_oracle = [n for n in R10_NEW if n not in ORACLES]
    assert not missing and not no_oracle, (missing, no_oracle)


def test_bench_archive_sort_is_numeric():
    """r10_local.json must sort AFTER r9_local.json (ADVICE r9: raw
    lexicographic order pins the noise baseline to r9 forever)."""
    import bench

    names = ["r10_local.json", "r5_local.json", "r9_local.json"]
    assert sorted(names, key=bench.archive_round) == [
        "r5_local.json", "r9_local.json", "r10_local.json"]


def test_bench_noise_block_classifies_runs():
    """compute_noise must reproduce the hand analysis from
    bench_runs/README.md r8: uniform inflation (host contention) vs
    localized outliers (candidate regressions) vs in-band — and never
    crash the bench (sf mismatch degrades to a no-comparison verdict)."""
    import bench

    # compare against whatever archive compute_noise itself will pick
    # (the latest bench_runs/*_local.json) — the test must not pin a
    # round-specific file or it breaks the round the next archive lands
    runs_dir = os.path.join(HERE, "bench_runs")
    latest = sorted(
        (f for f in os.listdir(runs_dir) if f.endswith("_local.json")),
        key=bench.archive_round,
    )[-1]
    with open(os.path.join(runs_dir, latest)) as f:
        prior = json.load(f)
    base = prior["queries"]

    uniform = bench.compute_noise({n: v * 1.3 for n, v in base.items()}, "0.1")
    assert uniform["verdict"].startswith("uniform-inflation")
    assert uniform["ratio_median"] == 1.3

    inband = bench.compute_noise(dict(base), "0.1")
    assert inband["verdict"] == "in-band"
    assert inband["q1_control_ratio"] == 1.0

    local = dict(base)
    local["graph_triangles"] *= 3
    localized = bench.compute_noise(local, "0.1")
    assert localized["verdict"].startswith("localized")
    assert "graph_triangles" in localized["outliers_over_1.5x"]

    assert bench.compute_noise(dict(base), "0.01")["verdict"].startswith(
        "sf-mismatch"
    )
