"""Query surface batch 27 (round 4): hard-negative mining, experiment
power planning, multiple-testing correction.

- hard-negative mining — for each query embedding, the most-similar
  vectors with a DIFFERENT label: the contrastive-training data op
  (the negatives that actually teach the model something)
- power / MDE grid — how many users per arm to detect a given effect
  at alpha=.05, power=.8, from the metric's observed variance
- Benjamini-Hochberg FDR over the per-event-type Mann-Whitney p-values
  — which of the m tests survive multiple-testing correction

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.vectors import dot, l2_norm
from kafka_etl_consumer_spark.plans.queries_pipeline19 import (
    _MWU_ORACLE,
    stats_mannwhitney_u,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# mine_hard_negatives — top-3 cross-label neighbors for 20 query
# vectors. Same broadcast-queries / one-corpus-scan shape as
# sim_cosine_topk, with the label-mismatch predicate in the join.
# ---------------------------------------------------------------------------

_HARDNEG_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS q_vec_id, label AS q_label, emb AS q_emb
      FROM e WHERE vec_id < 20),
s AS (SELECT q_vec_id, q_label, e.vec_id, e.label AS neg_label,
             round(list_dot_product(q_emb, e.emb)
                   / (sqrt(list_dot_product(q_emb, q_emb))
                      * sqrt(list_dot_product(e.emb, e.emb))), 6) AS score
      FROM q JOIN e ON e.label <> q.q_label),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY score DESC, vec_id) AS rn
      FROM s)
SELECT q_vec_id, q_label, vec_id, neg_label, score FROM r WHERE rn <= 3
"""


@register("mine_hard_negatives", _HARDNEG_ORACLE)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-similar OTHER-label vectors per query — contrastive
    hard negatives. Scale: queries broadcast, ONE corpus scan; norms
    precompute per side so each candidate costs one dot product; the
    label-mismatch predicate rides the broadcast join, and the per-query
    top-3 is a WindowGroupLimit, not a global sort. The blocked-LSH
    variant (sim_ann_lsh's bucket join + label filter) is the drop-in
    at 100 TB."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    c = e.withColumn("__cn", l2_norm("embedding"))
    q = (
        e.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_embedding"),
        )
        .withColumn("__qn", l2_norm("q_embedding"))
    )
    joined = c.join(
        F.broadcast(q), F.col("label") != F.col("q_label")
    ).select(
        "q_vec_id",
        "q_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        F.round(
            dot("q_embedding", "embedding") / (F.col("__qn") * F.col("__cn")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# stats_power_mde_grid — per-arm sample size n = ceil((z_a+z_b)^2 * 2 *
# var / d^2) for a grid of minimum detectable effects, with the metric
# variance from exact integer moments.
# ---------------------------------------------------------------------------

_POWER_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy
  FROM u
),
v AS (
  SELECT n, CAST(n * syy - sy * sy AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_y
  FROM mo
),
g AS (SELECT unnest([0.5, 1.0, 2.0]) AS mde)
SELECT g.mde, CAST(v.n AS BIGINT) AS n_observed, round(v.var_y, 6) AS var_y,
       CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416) * 2 * v.var_y
                 / (g.mde * g.mde)) AS BIGINT) AS n_per_arm
FROM g CROSS JOIN v
"""


@register("stats_power_mde_grid", _POWER_ORACLE)
def stats_power_mde_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required users per arm (alpha=.05 two-sided, power=.8) to detect
    each minimum effect on per-user purchase count. Scale: ONE
    user-grain agg, ONE exact-integer moment row; the grid is a 3-row
    literal — the planning math never touches data again."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y")
    )
    mo = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    v = mo.select(
        "n",
        (
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("var_y"),
    )
    g = spark.range(3).select(
        F.element_at(
            F.array(F.lit(0.5), F.lit(1.0), F.lit(2.0)), (F.col("id") + 1).cast("int")
        ).alias("mde")
    )
    zsum = (F.lit(1.96) + F.lit(0.8416)) * (F.lit(1.96) + F.lit(0.8416))
    return g.crossJoin(F.broadcast(v)).select(
        "mde",
        F.col("n").alias("n_observed"),
        F.round("var_y", 6).alias("var_y"),
        F.ceil(zsum * 2 * F.col("var_y") / (F.col("mde") * F.col("mde")))
        .cast("bigint")
        .alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# stats_fdr_bh — Benjamini-Hochberg at q=0.1 over the Mann-Whitney
# p-values: rank p ascending, k* = max rank with p <= q*rank/m, reject
# ranks <= k*. Composes the MWU query/oracle verbatim.
# ---------------------------------------------------------------------------

_FDR_ORACLE = f"""
WITH mwu AS ({_MWU_ORACLE}),
r AS (
  SELECT event_type, p_two_sided,
         row_number() OVER (ORDER BY p_two_sided, event_type) AS rk,
         count(*) OVER () AS m
  FROM mwu
),
k AS (
  SELECT r.*,
         max(CASE WHEN p_two_sided <= 0.1 * rk / m THEN rk ELSE 0 END)
           OVER () AS kstar
  FROM r
)
SELECT event_type, p_two_sided, CAST(rk AS BIGINT) AS p_rank,
       round(0.1 * rk / m, 6) AS bh_crit,
       rk <= kstar AS rejected
FROM k
"""


@register("stats_fdr_bh", _FDR_ORACLE)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH false-discovery-rate correction (q=0.1) over the per-type
    Mann-Whitney p-values. Scale: inherits the MWU shape (the only
    data-sized work); the correction itself is two windows over the m
    test rows. Composition is literal — the MWU plan/oracle are reused
    verbatim, so this stays hash-consistent with stats_mannwhitney_u."""
    p = stats_mannwhitney_u(spark, sf_dir).select("event_type", "p_two_sided")
    wr = Window.orderBy("p_two_sided", "event_type")
    wall = Window.partitionBy()
    r = p.select(
        "event_type",
        "p_two_sided",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    k = r.withColumn(
        "kstar",
        F.max(
            F.when(
                F.col("p_two_sided") <= 0.1 * F.col("rk") / F.col("m"),
                F.col("rk"),
            ).otherwise(0)
        ).over(wall),
    )
    return k.select(
        "event_type",
        "p_two_sided",
        F.col("rk").cast("bigint").alias("p_rank"),
        F.round(0.1 * F.col("rk") / F.col("m"), 6).alias("bh_crit"),
        (F.col("rk") <= F.col("kstar")).alias("rejected"),
    )
