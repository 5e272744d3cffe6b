"""End-to-end example of the experimentation / evaluation surface
added in round 4 — the full A/B lifecycle over the landed event table:

1. plan:    power/MDE grid (how many users per arm do we need?)
2. test:    Welch t, Mann-Whitney U, two-proportion z, KS distribution
3. adjust:  CUPED variance reduction with a pre-period covariate
4. correct: Benjamini-Hochberg FDR across the per-type tests
5. report:  Wilson intervals, decile lift/gains, best-F1 cut, AP

Run: python examples/experimentation_example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="experimentation-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. plan: users per arm for each minimum detectable effect ==")
    QUERIES["stats_power_mde_grid"](spark, sf_dir).orderBy("mde").show()

    print("== 2a. Welch t per event type (mean difference) ==")
    QUERIES["stats_ttest_welch"](spark, sf_dir).orderBy("event_type").show()

    print("== 2b. Mann-Whitney U (rank difference, no normality) ==")
    QUERIES["stats_mannwhitney_u"](spark, sf_dir).orderBy("event_type").show()

    print("== 2b'. same test on 64-bucket binned ranks (the 100 TB form) ==")
    QUERIES["stats_mannwhitney_u_binned"](spark, sf_dir).orderBy("event_type").show()

    print("== 2c. two-proportion z on the conversion flag ==")
    QUERIES["stats_prop_ztest"](spark, sf_dir).show()

    print("== 2d. KS: did the whole value distribution move? ==")
    QUERIES["stats_ks_test"](spark, sf_dir).show()

    print("== 3. CUPED: variance-reduced adjusted means ==")
    QUERIES["stats_cuped_adjust"](spark, sf_dir).orderBy("variant").show()

    print("== 4. BH-FDR across the per-type Mann-Whitney p-values ==")
    QUERIES["stats_fdr_bh"](spark, sf_dir).orderBy("p_rank").show()

    print("== 5a. Wilson intervals for the fulfilled-order rate ==")
    QUERIES["stats_wilson_ci"](spark, sf_dir).orderBy("priority").show()

    print("== 5b. decile lift / cumulative gains of the targeting score ==")
    QUERIES["eval_lift_deciles"](spark, sf_dir).orderBy("decile").show()

    print("== 5c. best-F1 operating point of the score ==")
    QUERIES["eval_f1_best_threshold"](spark, sf_dir).show()

    print("== 5d. average precision (PR area) and its prevalence floor ==")
    QUERIES["eval_pr_auc"](spark, sf_dir).show()

    print("== 6a. Bayesian read-out: P(B beats A) per event type (r7) ==")
    QUERIES["stats_bayes_ab_beta"](spark, sf_dir).orderBy("event_type").show()

    print("== 6b. sequential alternative: Wald SPRT crossing point (r7) ==")
    QUERIES["stats_sprt_boundary"](spark, sf_dir).show()

    print("== 6c. label quality: Cohen's kappa between two labelers (r7) ==")
    QUERIES["stats_cohens_kappa"](spark, sf_dir).show()

    print("== 7a. uplift: Qini gains of the targeting score vs control (r7) ==")
    QUERIES["eval_qini_uplift"](spark, sf_dir).orderBy("decile").show()

    print("== 7b. rank association: Kendall tau-b views vs purchases (r7) ==")
    QUERIES["stats_kendall_tau_b"](spark, sf_dir).show()

    print("== 8. the blocked-design battery (r8): day blocks, k event types ==")
    print("== 8a. Friedman — do the types differ AT ALL (ordinal ranks)?   ==")
    QUERIES["stats_friedman_test"](spark, sf_dir).show()

    print("== 8b. Page's L — do they INCREASE along the type order?        ==")
    QUERIES["stats_page_trend"](spark, sf_dir).show()

    print("== 8c. Cochran's Q — the 0/1 outcome version                    ==")
    QUERIES["stats_cochran_q"](spark, sf_dir).show()

    print("== 8d. OR homogeneity: may stats_cmh_test pool its strata?      ==")
    QUERIES["stats_breslow_day"](spark, sf_dir).show()

    print("== 8e. Dunn post-hoc: WHICH priority pairs differ after KW      ==")
    QUERIES["stats_dunn_posthoc"](spark, sf_dir).orderBy(
        "o_orderstatus", "g1", "g2"
    ).show(10)

    print("== 8f. uplift summary: AUUC + Qini coefficient (r8)             ==")
    QUERIES["eval_uplift_at_k_curve"](spark, sf_dir).show()

    print("== 9. the robust-comparison battery (r9)                        ==")
    print("== 9a. Kendall's W — HOW MUCH do the day blocks agree (effect   ==")
    print("==     size for 8a's Friedman verdict)?                         ==")
    QUERIES["stats_kendall_w"](spark, sf_dir).show()

    print("== 9b. Mood's median test — outlier-immune k-sample location    ==")
    QUERIES["stats_mood_median"](spark, sf_dir).show()

    print("== 9c. Brunner-Munzel — the Behrens-Fisher-safe two-sample test ==")
    QUERIES["stats_brunner_munzel"](spark, sf_dir).show()

    print("== 9d. Hodges-Lehmann pseudo-median — the robust center the     ==")
    print("==     signed-rank test inverts (vs the skew-dragged mean)      ==")
    QUERIES["stats_hodges_lehmann"](spark, sf_dir).show()

    print("== 9e. Rayleigh — do events cluster at a daily phase?           ==")
    QUERIES["stats_rayleigh_uniformity"](spark, sf_dir).orderBy("event_type").show()

    print("== 9f. logistic calibration curve, 3 Newton steps on the grid   ==")
    QUERIES["ml_logistic_irls_grid"](spark, sf_dir).show()

    print("== 9g. isotonic calibration of the same signal (PAV closed form)==")
    QUERIES["ml_isotonic_pav"](spark, sf_dir).orderBy("bin").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
