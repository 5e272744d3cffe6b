"""Query surface batch 20 (round 4): data-audit + experimentation ops.

- referential-integrity audit over every FK edge of the star schema —
  the data-quality gate a warehouse runs before publishing a snapshot
- two-proportion z-test on a user-level conversion flag — the discrete
  counterpart of stats_ttest_welch (A/B on rates, not means)
- CUPED variance-reduced A/B means — the standard experimentation trick
  (Deng et al., WSDM'13): regress the metric on a pre-period covariate
  and compare adjusted means; theta comes from exact integer moments so
  both engines agree bit-for-bit
- U-shaped (position-based) multi-touch attribution — 40/40/20 credit
  split over the touch path before each user's first purchase

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# audit_fk_orphans — orphan-row / orphan-key counts for all 7 FK edges.
# Scale: each edge pre-aggregates the child to (key, row-count) — ONE
# partial-combining hash-agg per edge, so the join that checks parent
# membership shuffles |distinct keys| rows, not |child rows|; parents
# project to their key column only (column-pruned scan) and AQE
# broadcasts the small ones (nation/region). NULL FKs count as orphans
# in both engines (left join on NULL never matches).
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{c}.{ck}->{p}.{pk}' AS edge,
       CAST(count(*) AS BIGINT) AS child_rows,
       CAST(count(*) FILTER (WHERE pk.k IS NULL) AS BIGINT) AS orphan_rows,
       CAST(count(DISTINCT c.{ck}) FILTER (WHERE pk.k IS NULL) AS BIGINT)
         AS orphan_keys
FROM {c} c LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {p}) pk
  ON c.{ck} = pk.k
""".strip()
    for c, ck, p, pk in _FK_EDGES
)


@register("audit_fk_orphans", _FK_ORACLE)
def audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity report: for every FK edge, how many child
    rows (and distinct child keys) have no parent. The child collapses
    to its key grain before the membership join, so the per-edge
    shuffle is |distinct keys|; the 7 one-row aggregates union at the
    end."""
    out = None
    for c, ck, p, pk in _FK_EDGES:
        child = _t(spark, sf_dir, c)
        parent = _t(spark, sf_dir, p)
        ckeys = child.groupBy(F.col(ck).alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        pkeys = (
            parent.select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        j = ckeys.join(pkeys, "k", "left")
        row = j.agg(
            F.sum("cnt").cast("bigint").alias("child_rows"),
            F.coalesce(
                F.sum(F.when(F.col("hit").isNull(), F.col("cnt"))), F.lit(0)
            ).cast("bigint").alias("orphan_rows"),
            # count(non-null k) of unmatched groups == count(DISTINCT
            # orphan child key): the child is already at key grain
            F.count(F.when(F.col("hit").isNull(), F.col("k")))
            .cast("bigint")
            .alias("orphan_keys"),
        ).select(
            F.lit(f"{c}.{ck}->{p}.{pk}").alias("edge"),
            "child_rows",
            "orphan_rows",
            "orphan_keys",
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# stats_prop_ztest — pooled two-proportion z-test: did the odd-user
# variant convert (>= 1 purchase with value > 150) at a different rate
# than the even-user variant? The p-value uses the Abramowitz-Stegun
# 7.1.26 erf polynomial written as the SAME Horner chain in both
# engines, so doubles agree to rounding.
# ---------------------------------------------------------------------------

_PZ_ORACLE = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS DOUBLE) AS x0,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS DOUBLE) AS x1
  FROM u
),
z AS (
  SELECT n0, x0, n1, x1,
         (x1 / n1 - x0 / n0)
           / sqrt((x0 + x1) / (n0 + n1) * (1 - (x0 + x1) / (n0 + n1))
                  * (1 / n0 + 1 / n1)) AS z
  FROM g
),
e AS (
  SELECT *, abs(z) / sqrt(2) AS az, 1 / (1 + 0.3275911 * (abs(z) / sqrt(2))) AS t
  FROM z
)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(x0 AS BIGINT) AS conv_a,
       CAST(n1 AS BIGINT) AS n_b, CAST(x1 AS BIGINT) AS conv_b,
       round(x0 / n0, 6) AS rate_a, round(x1 / n1, 6) AS rate_b,
       round(z, 6) AS z_stat,
       round(((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
               - 0.284496736) * t + 0.254829592) * t * exp(-az * az), 6)
         AS p_two_sided
FROM e
"""


@register("stats_prop_ztest", _PZ_ORACLE)
def stats_prop_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test between even/odd user variants on a
    binary conversion flag. ONE user-grain hash-agg then ONE moment
    row; the statistic and the erf-polynomial p-value are arithmetic on
    that single row — nothing scales with data size past the first
    agg. p_two_sided = 2(1-Phi(|z|)) = erfc(|z|/sqrt(2)) via A&S
    7.1.26 (|err| < 1.5e-7, far inside the 6dp rounding)."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("conv")
    )
    even = F.col("user_id") % 2 == 0
    g = u.agg(
        F.sum(F.when(even, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(even, F.col("conv")).otherwise(0)).cast("double").alias("x0"),
        F.sum(F.when(~even, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(~even, F.col("conv")).otherwise(0)).cast("double").alias("x1"),
    )
    pp = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    z = (F.col("x1") / F.col("n1") - F.col("x0") / F.col("n0")) / F.sqrt(
        pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1"))
    )
    zz = g.withColumn("z", z)
    az = F.abs(F.col("z")) / F.sqrt(F.lit(2.0))
    e = zz.withColumn("az", az).withColumn(
        "t", 1 / (1 + 0.3275911 * (F.abs(F.col("z")) / F.sqrt(F.lit(2.0))))
    )
    t = F.col("t")
    horner = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    return e.select(
        F.col("n0").cast("bigint").alias("n_a"),
        F.col("x0").cast("bigint").alias("conv_a"),
        F.col("n1").cast("bigint").alias("n_b"),
        F.col("x1").cast("bigint").alias("conv_b"),
        F.round(F.col("x0") / F.col("n0"), 6).alias("rate_a"),
        F.round(F.col("x1") / F.col("n1"), 6).alias("rate_b"),
        F.round("z", 6).alias("z_stat"),
        F.round(horner * F.exp(-F.col("az") * F.col("az")), 6).alias(
            "p_two_sided"
        ),
    )


# ---------------------------------------------------------------------------
# stats_cuped_adjust — CUPED: y_adj = y - theta (x - mean x) with theta
# = cov(x,y)/var(x) from the pooled population. x and y are INTEGER
# purchase counts (pre / post period), so the moment sums (sx, sy,
# sxy, sxx) are exact BIGINTs in both engines and theta is identical
# double arithmetic — no streaming-variance algorithm divergence.
# ---------------------------------------------------------------------------

_CUPED_ORACLE = """
WITH per AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                   THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                   AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                   THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM per
),
th AS (
  SELECT n, sx,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta
  FROM mo
),
adj AS (
  SELECT user_id % 2 AS variant, y,
         y - th.theta * (x - CAST(th.sx AS DOUBLE) / th.n) AS y_cuped,
         th.theta AS theta
  FROM per CROSS JOIN th
)
SELECT CAST(variant AS BIGINT) AS variant,
       CAST(count(*) AS BIGINT) AS n_users,
       round(avg(CAST(y AS DOUBLE)), 4) AS mean_y,
       round(avg(y_cuped), 4) AS mean_y_cuped,
       round(stddev_pop(CAST(y AS DOUBLE)), 4) AS sd_y,
       round(stddev_pop(y_cuped), 4) AS sd_y_cuped,
       round(any_value(theta), 6) AS theta
FROM adj GROUP BY variant
"""


@register("stats_cuped_adjust", _CUPED_ORACLE)
def stats_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B comparison of post-period purchase counts
    using pre-period counts as the covariate. Scale: ONE user-grain
    hash-agg, ONE exact-integer moment row broadcast back over the
    user table, ONE 2-row variant agg — theta never sees row-level
    floats, so the adjustment is deterministic at any partitioning."""
    ev = _t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    pre = F.col("ts").cast("timestamp") < F.lit("2024-01-16").cast("timestamp")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(is_p & pre, 1).otherwise(0)).cast("bigint").alias("x"),
        F.sum(F.when(is_p & ~pre, 1).otherwise(0)).cast("bigint").alias("y"),
    )
    mo = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    th = mo.select(
        "n",
        "sx",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("theta"),
    )
    adj = per.crossJoin(F.broadcast(th)).select(
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        "y",
        (
            F.col("y")
            - F.col("theta") * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
        ).alias("y_cuped"),
        "theta",
    )
    return adj.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg(F.col("y").cast("double")), 4).alias("mean_y"),
        F.round(F.avg("y_cuped"), 4).alias("mean_y_cuped"),
        F.round(F.stddev_pop(F.col("y").cast("double")), 4).alias("sd_y"),
        F.round(F.stddev_pop("y_cuped"), 4).alias("sd_y_cuped"),
        F.round(F.any_value("theta"), 6).alias("theta"),
    )


# ---------------------------------------------------------------------------
# attribution_u_shaped — position-based credit for each user's first
# purchase over the prior touch path: 1 touch -> 1.0, 2 -> 0.5 each,
# else 0.4 first + 0.4 last + 0.2 spread over the middle. Complements
# attribution_last_touch (queries_pipeline6.py).
# ---------------------------------------------------------------------------

_USHAPE_ORACLE = """
WITH fp AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS ts_p
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
t AS (
  SELECT e.user_id, e.event_type,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id) AS pos,
         count(*) OVER (PARTITION BY e.user_id) AS n
  FROM events e JOIN fp USING (user_id)
  WHERE e.event_type <> 'purchase' AND CAST(e.ts AS TIMESTAMP) < fp.ts_p
),
cr AS (
  SELECT event_type AS channel,
         CASE WHEN n = 1 THEN 1.0
              WHEN n = 2 THEN 0.5
              WHEN pos = 1 OR pos = n THEN 0.4
              ELSE 0.2 / (n - 2) END AS credit
  FROM t
),
agg AS (
  SELECT channel, round(sum(credit), 6) AS credit,
         CAST(count(*) AS BIGINT) AS n_touches
  FROM cr GROUP BY channel
),
direct AS (
  SELECT '(direct)' AS channel, CAST(count(*) AS DOUBLE) AS credit,
         CAST(0 AS BIGINT) AS n_touches
  FROM fp WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.user_id = fp.user_id)
  HAVING count(*) > 0
)
SELECT * FROM agg UNION ALL SELECT * FROM direct
"""


@register("attribution_u_shaped", _USHAPE_ORACLE)
def attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution of first purchases across the
    preceding touch events. Scale: the purchase lookup is a user-grain
    hash-agg; position and path length come from ONE user-keyed window
    pass (same exchange serves both); credit rollup is a bounded
    hash-agg over |event types|. Total credit equals the number of
    converting users — the '(direct)' bucket keeps no-touch
    conversions accounted."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_p"))
    )
    touches = ev.join(fp, "user_id").filter(
        (F.col("event_type") != "purchase") & (F.col("ts") < F.col("ts_p"))
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    t = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(wseq).alias("pos"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    cr = t.select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
        .alias("credit"),
    )
    agg = cr.groupBy("channel").agg(
        F.round(F.sum("credit"), 6).alias("credit"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
    )
    direct = (
        fp.join(t.select("user_id").distinct(), "user_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") > 0)
        .select(
            F.lit("(direct)").alias("channel"),
            F.col("nd").cast("double").alias("credit"),
            F.lit(0).cast("bigint").alias("n_touches"),
        )
    )
    return agg.unionAll(direct)
