"""Query surface batch 24 (round 4): nonparametric testing, proportion
intervals, model-lift accounting.

- Mann-Whitney U (Wilcoxon rank-sum) with tie-corrected normal
  approximation — the nonparametric A/B test that doesn't assume the
  metric is Gaussian (complements stats_ttest_welch / stats_ks_test)
- Wilson score intervals per order priority — the proportion CI that
  behaves at small n and extreme p, where the Wald interval collapses
- decile lift & cumulative-gains table — the targeting-model report:
  if we contact the top k% of users by score, what share of converters
  do we capture?

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.ranks import tie_avg_ranks, tie_term
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_mannwhitney_u — U from tie-averaged ranks (avg rank = min rank +
# (peers-1)/2, exact halves in double), tie-corrected sigma, A&S erf
# p-value. All moment inputs are exact integers / half-integers, so both
# engines compute identical doubles.
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH base AS (
  SELECT event_type AS et, value AS x, user_id % 2 AS grp FROM events
),
rk AS (
  SELECT et, x, grp,
         rank() OVER (PARTITION BY et ORDER BY x)
           + (count(*) OVER (PARTITION BY et, x) - 1) / 2.0 AS ar
  FROM base
),
g1 AS (
  SELECT et,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         sum(CASE WHEN grp = 0 THEN ar ELSE 0 END) AS r1
  FROM rk GROUP BY et
),
tie AS (
  SELECT et, CAST(sum(t * t * t - t) AS BIGINT) AS ts3
  FROM (SELECT et, x, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY et, x)
  GROUP BY et
),
st AS (
  SELECT g1.et, n1, n2, n1 + n2 AS n,
         r1 - n1 * (n1 + 1) / 2.0 AS u1,
         n1 * n2 / 2.0 AS mu,
         sqrt((n1 * n2 / 12.0)
              * ((n1 + n2 + 1)
                 - ts3 / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1.0)))) AS sg
  FROM g1 JOIN tie ON tie.et = g1.et
),
z AS (SELECT et, n1, n2, u1, (u1 - mu) / sg AS z FROM st),
e AS (SELECT *, abs(z) / sqrt(2) AS az,
             1 / (1 + 0.3275911 * (abs(z) / sqrt(2))) AS t FROM z)
SELECT et AS event_type, n1 AS n_a, n2 AS n_b,
       round(u1, 2) AS u_stat, round(z, 6) AS z_stat,
       round(((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
               - 0.284496736) * t + 0.254829592) * t * exp(-az * az), 6)
         AS p_two_sided
FROM e
"""


@register("stats_mannwhitney_u", _MWU_ORACLE)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between even/odd user cohorts per event type,
    tie-corrected. Scale: ranks come from tie_avg_ranks' value-grouped
    count grid — one hash agg at full parallelism, then a window over
    the per-type DISTINCT-VALUE grid (never a per-row sort; rank sums
    are exact halves, bit-identical to the per-row formulation). At
    100 TB, stats_mannwhitney_u_binned coarsens the grid to 64 buckets
    with the same code path (tie_avg_ranks(num_bins=...))."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("et"),
        F.col("value").alias("x"),
        (F.col("user_id") % 2).alias("grp"),
    )
    rk = tie_avg_ranks(base, ["et"], "x", cohort_cols=["grp"])
    g1 = rk.groupBy("et").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n2"),
        F.sum(
            F.when(F.col("grp") == 0, F.col("cnt") * F.col("avg_rank")).otherwise(
                F.lit(0.0)
            )
        ).alias("r1"),
    )
    tie = tie_term(rk, ["et"], "x")
    st = g1.join(tie, "et").select(
        "et",
        "n1",
        "n2",
        (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0).alias("u1"),
        (F.col("n1") * F.col("n2") / 2.0).alias("mu"),
        F.sqrt(
            (F.col("n1") * F.col("n2") / 12.0)
            * (
                (F.col("n1") + F.col("n2") + 1)
                - F.col("ts3")
                / (
                    (F.col("n1") + F.col("n2")).cast("double")
                    * (F.col("n1") + F.col("n2") - 1.0)
                )
            )
        ).alias("sg"),
    )
    z = st.select(
        "et", "n1", "n2", "u1", ((F.col("u1") - F.col("mu")) / F.col("sg")).alias("z")
    )
    az = F.abs(F.col("z")) / F.sqrt(F.lit(2.0))
    e = z.withColumn("az", az).withColumn(
        "t", 1 / (1 + 0.3275911 * (F.abs(F.col("z")) / F.sqrt(F.lit(2.0))))
    )
    t = F.col("t")
    horner = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    return e.select(
        F.col("et").alias("event_type"),
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        F.round("u1", 2).alias("u_stat"),
        F.round("z", 6).alias("z_stat"),
        F.round(horner * F.exp(-F.col("az") * F.col("az")), 6).alias(
            "p_two_sided"
        ),
    )


# ---------------------------------------------------------------------------
# stats_wilson_ci — 95% Wilson score interval for P(status='F') per
# order priority. Closed-form arithmetic on exact integer counts.
# ---------------------------------------------------------------------------

_WILSON_ORACLE = """
WITH g AS (
  SELECT o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM orders GROUP BY 1
),
c AS (
  SELECT priority, n, s,
         s / CAST(n AS DOUBLE) AS ph,
         1.96 * 1.96 AS z2, CAST(n AS DOUBLE) AS nd
  FROM g
)
SELECT priority, n, s AS n_success, round(ph, 6) AS p_hat,
       round((ph + z2 / (2 * nd)) / (1 + z2 / nd)
             - 1.96 * sqrt(ph * (1 - ph) / nd + z2 / (4 * nd * nd))
               / (1 + z2 / nd), 6) AS ci_lo,
       round((ph + z2 / (2 * nd)) / (1 + z2 / nd)
             + 1.96 * sqrt(ph * (1 - ph) / nd + z2 / (4 * nd * nd))
               / (1 + z2 / nd), 6) AS ci_hi
FROM c
"""


@register("stats_wilson_ci", _WILSON_ORACLE)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval of the fulfilled-order rate per
    priority. ONE hash-agg; the interval is closed-form arithmetic on
    the 5-row count table — data volume never touches the statistic
    past the first agg."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("s"),
    )
    nd = F.col("n").cast("double")
    ph = F.col("s") / nd
    z2 = F.lit(1.96) * F.lit(1.96)
    center = (ph + z2 / (2 * nd)) / (1 + z2 / nd)
    half = (
        F.lit(1.96)
        * F.sqrt(ph * (1 - ph) / nd + z2 / (4 * nd * nd))
        / (1 + z2 / nd)
    )
    return g.select(
        "priority",
        "n",
        F.col("s").alias("n_success"),
        F.round(ph, 6).alias("p_hat"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# eval_lift_deciles — gains/lift table: users ranked by view-count
# score into 10 deciles; per decile the conversion lift vs base rate
# and the cumulative share of all converters captured.
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
d AS (
  SELECT ntile(10) OVER (ORDER BY score DESC, user_id) AS decile,
         conv
  FROM u
),
g AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv
  FROM d GROUP BY decile
),
t AS (
  SELECT decile, n_users, n_conv,
         CAST(sum(n_conv) OVER (ORDER BY decile
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv,
         CAST(sum(n_conv) OVER () AS BIGINT) AS tot_conv,
         CAST(sum(n_users) OVER () AS BIGINT) AS tot_users
  FROM g
)
SELECT CAST(decile AS BIGINT) AS decile, n_users, n_conv,
       round(cum_conv / CAST(tot_conv AS DOUBLE), 6) AS cum_gain,
       round((n_conv / CAST(n_users AS DOUBLE))
             / (tot_conv / CAST(tot_users AS DOUBLE)), 6) AS lift
FROM t
"""


@register("eval_lift_deciles", _LIFT_ORACLE)
def eval_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative gains of a view-count targeting score
    against the high-value-purchase conversion flag. Scale: ONE
    user-grain hash-agg; the ntile ranking is EXACT and SHARDED
    (operators/shard.exact_ntile — per-score-bucket local row_number +
    broadcast shard offsets, ntile's own bucket arithmetic on (rank, n);
    the r5 whitelist entry retired), and everything after lives on a
    10-row grid. Deterministic tiebreak (score DESC, user_id) keeps
    decile boundaries identical across engines and retries.
    eval_lift_deciles_binned (queries_pipeline35.py) remains the
    score-grain approximation when user grain itself is the bottleneck."""
    from kafka_etl_consumer_spark.operators.shard import exact_ntile

    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("conv"),
    )
    d = exact_ntile(
        u,
        [F.col("score").desc(), F.col("user_id").asc()],
        10,
        out_col="decile",
        shard_key=-F.col("score"),
    ).select("decile", "conv")
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    t = g.select(
        "decile",
        "n_users",
        "n_conv",
        F.sum("n_conv").over(wc).cast("bigint").alias("cum_conv"),
        F.sum("n_conv").over(wall).cast("bigint").alias("tot_conv"),
        F.sum("n_users").over(wall).cast("bigint").alias("tot_users"),
    )
    return t.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_users",
        "n_conv",
        F.round(F.col("cum_conv") / F.col("tot_conv").cast("double"), 6).alias(
            "cum_gain"
        ),
        F.round(
            (F.col("n_conv") / F.col("n_users").cast("double"))
            / (F.col("tot_conv") / F.col("tot_users").cast("double")),
            6,
        ).alias("lift"),
    )
