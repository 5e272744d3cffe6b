"""Query surface batch 39 (round 5): the BINNED scale variants the
round-4 verdict asked for — the exact rank/sort family's 100 TB paths,
in code instead of docstrings.

- stats_mannwhitney_u_binned — MWU on 64 equi-width value buckets per
  group via tie_avg_ranks(num_bins=...): the window input is a bounded
  grid (<= 64 rows/group) at ANY data size, where the exact query's
  grid is |distinct values|
- bin_quantile_deciles_hist — decile edges from a 256-bin equi-width
  histogram + integer-exact cumulative cut assignment: replaces the
  global ntile sort with one hash agg and a 256-row window
- eval_auc_rank_binned — ROC AUC with scores quantized to 512 fixed
  buckets on [-1, 1]; the rank formula runs on per-bucket counts (the
  histogram-trapezoid AUC), no per-row sort
- eval_lift_deciles_binned — gains/lift with score-grain deciles (all
  users with equal score share a decile): cumulative counts over the
  distinct-score grid replace the per-user ntile sort

Each oracle REPLAYS the same binning formula textually (same IEEE
expression order), so bucket assignment and tie structure are
cross-engine identical and the hashes compare exactly. Only bucket
ORDER and counts enter the statistics, so a last-ulp midpoint
difference could not flip a result either.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.ranks import tie_avg_ranks, tie_term
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_mannwhitney_u_binned — same statistic pipeline as
# stats_mannwhitney_u, but ranks come from the 64-bucket grid. The
# p-value differs from the exact query only through the coarsened tie
# structure (documented approximation, deterministic).
# ---------------------------------------------------------------------------

_MWU_BINNED_ORACLE = """
WITH base0 AS (
  SELECT event_type AS et, value AS x, user_id % 2 AS grp FROM events
),
rng AS (SELECT et, min(x) AS lo, max(x) AS hi FROM base0 GROUP BY et),
base AS (
  SELECT base0.et, grp,
         CASE WHEN hi = lo THEN lo
              ELSE lo + (least(63, CAST(floor((x - lo) / (hi - lo) * 64)
                                        AS BIGINT)) + 0.5) * (hi - lo) / 64
         END AS x
  FROM base0 JOIN rng ON rng.et = base0.et
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
  SELECT g1.et, n1, n2,
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


@register("stats_mannwhitney_u_binned", _MWU_BINNED_ORACLE)
def stats_mannwhitney_u_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U on 64-bucket binned ranks — the 100 TB form of
    stats_mannwhitney_u. tie_avg_ranks(num_bins=64) quantizes values to
    an equi-width grid per event type (one broadcast min/max row per
    group), so the rank window's input is <= 64 rows per group no matter
    the data size; everything upstream is a full-parallelism hash agg.
    The statistic follows the identical tie-corrected formula — binning
    only coarsens tie structure."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("et"),
        F.col("value").alias("x"),
        (F.col("user_id") % 2).alias("grp"),
    )
    rk = tie_avg_ranks(base, ["et"], "x", cohort_cols=["grp"], num_bins=64)
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
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736) * t
        + 0.254829592
    ) * t
    return e.select(
        F.col("et").alias("event_type"),
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        F.round("u1", 2).alias("u_stat"),
        F.round("z", 6).alias("z_stat"),
        F.round(horner * F.exp(-F.col("az") * F.col("az")), 6).alias("p_two_sided"),
    )


# ---------------------------------------------------------------------------
# bin_quantile_deciles_hist — decile table from a bounded histogram. The
# cut assignment ceil(10 * cum / tot) is computed in INTEGER arithmetic
# ((10*cum + tot - 1) DIV tot) so both engines agree exactly at any
# count magnitude.
# ---------------------------------------------------------------------------

_DECILE_HIST_ORACLE = """
WITH rng AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
),
cells AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE least(255, CAST(floor((o_totalprice - lo) / (hi - lo) * 256)
                                   AS BIGINT)) END AS b,
         CAST(count(*) AS BIGINT) AS n,
         min(o_totalprice) AS mn, max(o_totalprice) AS mx
  FROM orders CROSS JOIN rng
  GROUP BY 1
),
cum AS (
  SELECT b, n, mn, mx,
         CAST(sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
         CAST(sum(n) OVER () AS BIGINT) AS tot
  FROM cells
),
d AS (SELECT CAST((10 * c + tot - 1) // tot AS INT) AS decile, n, mn, mx FROM cum)
SELECT decile, CAST(sum(n) AS BIGINT) AS n,
       round(min(mn), 4) AS lo, round(max(mx), 4) AS hi
FROM d GROUP BY decile
"""


@register("bin_quantile_deciles_hist", _DECILE_HIST_ORACLE)
def bin_quantile_deciles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bins of order totals at histogram resolution — the 100 TB
    form of bin_quantile_deciles. One hash agg to a 256-bin equi-width
    histogram (min/max from a broadcast one-row aggregate), decile cuts
    assigned by integer-exact cumulative counts over the 256-row grid —
    the global ntile total sort disappears. Edges are bin-resolution
    (the actual min/max inside each decile's bins), counts are exact up
    to bucket granularity (a boundary bucket belongs wholly to one
    decile)."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    rng = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    p, lo, hi = F.col("o_totalprice"), F.col("lo"), F.col("hi")
    b = F.when(hi == lo, F.lit(0).cast("bigint")).otherwise(
        F.least(F.lit(255), F.floor((p - lo) / (hi - lo) * 256))
    )
    cells = (
        o.crossJoin(F.broadcast(rng))
        .groupBy(b.alias("b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = cells.select(
        "n",
        "mn",
        "mx",
        F.sum("n").over(wc).cast("bigint").alias("c"),
        F.sum("n").over(wall).cast("bigint").alias("tot"),
    )
    d = cum.select(
        F.expr("CAST((10 * c + tot - 1) DIV tot AS INT)").alias("decile"),
        "n",
        "mn",
        "mx",
    )
    return d.groupBy("decile").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.round(F.min("mn"), 4).alias("lo"),
        F.round(F.max("mx"), 4).alias("hi"),
    )


# ---------------------------------------------------------------------------
# eval_auc_rank_binned — the same cosine-to-class-0-centroid scorer as
# eval_auc_rank, AUC from per-bucket counts on a FIXED 512-bucket grid
# over [-1, 1] (cosine range — no min/max pass needed). Rank-formula AUC
# on bucket counts == histogram trapezoid AUC.
# ---------------------------------------------------------------------------

_AUC_BINNED_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                  CAST(label = 0 AS INT) AS pos FROM embeddings),
el AS (SELECT vec_id, ord, emb[ord] AS x
       FROM e, (SELECT unnest(range(1, 65)) AS ord)),
cen AS (SELECT ord, round(avg(x), 6) AS c
        FROM el JOIN e USING (vec_id) WHERE e.pos = 1 GROUP BY ord),
cn AS (SELECT sqrt(sum(c * c)) AS nrm, array_agg(c ORDER BY ord) AS cvec FROM cen),
s AS (SELECT e.pos,
             least(511, CAST(floor((round(list_dot_product(e.emb, cn.cvec)
                   / (sqrt(list_dot_product(e.emb, e.emb)) * cn.nrm), 6) + 1)
                   / 2 * 512) AS BIGINT)) AS sb
      FROM e CROSS JOIN cn),
cells AS (
  SELECT sb, CAST(count(*) AS BIGINT) AS nc,
         CAST(sum(pos) AS BIGINT) AS np
  FROM s GROUP BY sb
),
rk AS (
  SELECT np, nc,
         CAST(sum(nc) OVER (ORDER BY sb ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM cells
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nc - np) AS BIGINT) AS n_neg,
       round((sum(np * (c - nc + (nc + 1) / 2.0))
              - sum(np) * (sum(np) + 1) / 2.0)
             / (sum(np) * CAST(sum(nc - np) AS DOUBLE)), 6) AS auc
FROM rk
"""


@register("eval_auc_rank_binned", _AUC_BINNED_ORACLE)
def eval_auc_rank_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the cosine-to-class-0-centroid scorer with scores
    quantized to 512 fixed buckets on [-1, 1] — the 100 TB form of
    eval_auc_rank. The centroid is a broadcast (dim)-row aggregate, the
    score a narrow in-row fold, and the AUC a rank-formula fold over the
    <= 512-row bucket-count grid: one hash agg replaces the global score
    sort. Bucket ranks are exact halves so both engines compute the same
    double."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        (F.col("label") == 0).cast("int").alias("pos"),
    )
    el = e.filter(F.col("pos") == 1).select(F.posexplode("emb")).withColumnsRenamed(
        {"pos": "ord", "col": "x"}
    )
    cen = el.groupBy("ord").agg(F.round(F.avg("x"), 6).alias("c"))
    cn = cen.agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ord", "c"))), lambda s: s["c"]
        ).alias("cvec"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("emb"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    self_norm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    score = F.round(dot / (self_norm * F.col("nrm")), 6)
    sb = F.least(F.lit(511), F.floor((score + 1) / 2 * 512))
    s = e.crossJoin(F.broadcast(cn)).select("pos", sb.alias("sb"))
    cells = s.groupBy("sb").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    wc = Window.orderBy("sb").rowsBetween(Window.unboundedPreceding, 0)
    rk = cells.select(
        "np", "nc", F.sum("nc").over(wc).cast("bigint").alias("c")
    )
    n_pos = F.sum("np")
    n_neg = F.sum(F.col("nc") - F.col("np"))
    ar = F.col("c") - F.col("nc") + (F.col("nc") + 1) / 2.0
    return rk.agg(
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        F.round(
            (F.sum(F.col("np") * ar) - n_pos * (n_pos + 1) / 2.0)
            / (n_pos * n_neg.cast("double")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# eval_lift_deciles_binned — gains/lift with SCORE-GRAIN deciles: every
# user with the same score lands in the same decile (no per-user
# tiebreak, so no per-user sort). Decile cut = integer-exact
# ceil(10 * cum_users / tot_users) over the distinct-score grid.
# ---------------------------------------------------------------------------

_LIFT_BINNED_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
sg AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv
  FROM u GROUP BY score
),
cum AS (
  SELECT n_users, n_conv,
         CAST(sum(n_users) OVER (ORDER BY score DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cu,
         CAST(sum(n_users) OVER () AS BIGINT) AS tot_users
  FROM sg
),
g AS (
  SELECT CAST((10 * cu + tot_users - 1) // tot_users AS BIGINT) AS decile,
         CAST(sum(n_users) AS BIGINT) AS n_users,
         CAST(sum(n_conv) AS BIGINT) AS n_conv
  FROM cum GROUP BY 1
),
t AS (
  SELECT decile, n_users, n_conv,
         CAST(sum(n_conv) OVER (ORDER BY decile
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv,
         CAST(sum(n_conv) OVER () AS BIGINT) AS tot_conv,
         CAST(sum(n_users) OVER () AS BIGINT) AS tot_users
  FROM g
)
SELECT decile, n_users, n_conv,
       round(cum_conv / CAST(tot_conv AS DOUBLE), 6) AS cum_gain,
       round((n_conv / CAST(n_users AS DOUBLE))
             / (tot_conv / CAST(tot_users AS DOUBLE)), 6) AS lift
FROM t
"""


@register("eval_lift_deciles_binned", _LIFT_BINNED_ORACLE)
def eval_lift_deciles_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative gains with score-grain deciles — the
    100 TB form of eval_lift_deciles. The view-count score is a small
    integer, so cumulative user counts over the DISTINCT-SCORE grid
    assign deciles (ties share a decile; integer-exact cut) and the
    per-user global ntile sort disappears: one user-grain hash agg, one
    score-grain hash agg, two bounded-grid windows."""
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
    sg = u.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    wu = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = sg.select(
        "n_users",
        "n_conv",
        F.sum("n_users").over(wu).cast("bigint").alias("cu"),
        F.sum("n_users").over(wall).cast("bigint").alias("tot_users"),
    )
    g = (
        cum.select(
            F.expr("CAST((10 * cu + tot_users - 1) DIV tot_users AS BIGINT)").alias(
                "decile"
            ),
            "n_users",
            "n_conv",
        )
        .groupBy("decile")
        .agg(
            F.sum("n_users").cast("bigint").alias("n_users"),
            F.sum("n_conv").cast("bigint").alias("n_conv"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    t = g.select(
        "decile",
        "n_users",
        "n_conv",
        F.sum("n_conv").over(wc).cast("bigint").alias("cum_conv"),
        F.sum("n_conv").over(wall).cast("bigint").alias("tot_conv"),
        F.sum("n_users").over(wall).cast("bigint").alias("tot_users"),
    )
    return t.select(
        "decile",
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
