"""Query surface batch 55 (round 10, second wave): ordered-alternative
and randomness tests.

- stats_jonckheere_trend — Jonckheere-Terpstra test for a MONOTONE
  ordered alternative across k ordered groups (Jonckheere 1954;
  Terpstra 1952), on the same structural grouping stats_tukey_hsd
  uses (per-order max line value by order size, where E[max of k]
  really is increasing): pairwise "lower group < higher group" counts
  from a 64-bin quantization, ties at bin grain handled by the 1/2
  convention and the FULL tie-corrected null variance (Lehmann 1975).
- ts_cox_stuart — Cox & Stuart's sign test for trend (1955): pair the
  first half of the daily series with the second half, count positive
  differences, EXACT binomial two-sided p (factorials are exact
  through m = 20 pairs; longer series switch to the normal
  approximation — both engines spell the identical branch).
- ts_bartels_rank — Bartels' rank version of von Neumann's ratio
  (Bartels 1982), the rank test of serial RANDOMNESS: RVN = sum of
  squared successive rank differences over the rank variance; under
  the null E[RVN] = 2 with the exact (n-dependent) variance.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_jonckheere_trend — JT ordered-alternative test, tie-corrected
# ---------------------------------------------------------------------------

_JT_BINS = 64
_JT_MAX_K = 6

_JT_ORACLE = f"""
WITH om AS (
  SELECT l_orderkey, count(*) AS g, max(l_extendedprice) AS x
  FROM lineitem GROUP BY 1
),
base AS (SELECT g, x FROM om WHERE g BETWEEN 1 AND {_JT_MAX_K}),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
cells AS (
  SELECT g, least({_JT_BINS - 1},
                  CAST(floor((x - lo) / (hi - lo) * {_JT_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM base, rng GROUP BY 1, 2
),
u AS (
  SELECT sum(CASE WHEN a.b < bb.b THEN CAST(a.c AS DOUBLE) * bb.c
                  WHEN a.b = bb.b THEN CAST(a.c AS DOUBLE) * bb.c / 2
                  ELSE 0 END) AS j
  FROM cells a JOIN cells bb ON a.g < bb.g
),
gs AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY g
),
ts AS (
  SELECT b, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY b
),
mom AS (
  SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM gs) AS nn,
         (SELECT CAST(count(*) AS INT) FROM gs) AS k_groups,
         (SELECT sum(CAST(n AS DOUBLE) * n) FROM gs) AS sn2,
         (SELECT sum(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)) FROM gs)
           AS ga,
         (SELECT sum(CAST(n AS DOUBLE) * (n - 1) * (n - 2)) FROM gs) AS gb,
         (SELECT sum(CAST(n AS DOUBLE) * (n - 1)) FROM gs) AS gc,
         (SELECT sum(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) FROM ts)
           AS ta,
         (SELECT sum(CAST(t AS DOUBLE) * (t - 1) * (t - 2)) FROM ts) AS tb,
         (SELECT sum(CAST(t AS DOUBLE) * (t - 1)) FROM ts) AS tc
),
stat AS (
  SELECT u.j, mom.nn, mom.k_groups,
         (mom.nn * mom.nn - mom.sn2) / 4.0 AS ej,
         (mom.nn * (mom.nn - 1) * (2 * mom.nn + 5) - mom.ga - mom.ta) / 72.0
           + mom.gb * mom.tb / (36.0 * mom.nn * (mom.nn - 1) * (mom.nn - 2))
           + mom.gc * mom.tc / (8.0 * mom.nn * (mom.nn - 1)) AS vj
  FROM u CROSS JOIN mom
)
SELECT CAST(nn AS BIGINT) AS n_total, k_groups,
       round(j, 2) AS j_stat, round(ej, 2) AS e_j,
       round((j - ej) / sqrt(vj), 6) AS z_stat,
       round(least(1.0, greatest(0.0, {_normal_sf_sql('(j - ej) / sqrt(vj)')}
             )), 6) AS p_value
FROM stat
"""


@register("stats_jonckheere_trend", _JT_ORACLE)
def stats_jonckheere_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative (Jonckheere
    1954): J = sum over group pairs i<j of #{x in G_i < y in G_j}
    (+ 1/2 per tie), against the null moments E[J] = (N^2 - sum n_i^2)/4
    and Lehmann's FULL tie-corrected variance (the three-term A/72 +
    B/36N(N-1)(N-2) + C/8N(N-1) form, with tie multiplicities taken at
    the 64-bin quantization grain — n >> 64 bins makes ties heavy, so
    the no-ties variance would be visibly wrong; the MC audit's null
    simulation pins exactly this). The grouping is the structural one
    from stats_tukey_hsd (per-order max line value by order size
    1..{_JT_MAX_K}), whose population means are genuinely increasing —
    JT is the test you run INSTEAD of ANOVA when the alternative is
    monotone, so the pair answers both post-hoc questions. One-sided
    (increasing) p. Scale: one data-grain hash-agg (per-order max),
    one binning agg, then all pair arithmetic happens on <= k*64
    cells — the quadratic stage is bounded by the grid, never by data
    (the stats_brunner_munzel shape). Binning uses exact min/max
    doubles, so both engines quantize identically."""
    li = _t(spark, sf_dir, "lineitem")
    om = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("g"), F.max("l_extendedprice").alias("x")
    )
    base = om.filter(F.col("g").between(1, _JT_MAX_K)).select("g", "x")
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    cells = (
        base.crossJoin(F.broadcast(rng))
        .select(
            "g",
            F.least(
                F.lit(_JT_BINS - 1),
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _JT_BINS
                ).cast("bigint"),
            ).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    u = (
        cells.alias("a")
        .join(F.broadcast(cells.alias("bb")), F.col("a.g") < F.col("bb.g"))
        .agg(
            F.sum(
                F.when(
                    F.col("a.b") < F.col("bb.b"),
                    F.col("a.c").cast("double") * F.col("bb.c"),
                )
                .when(
                    F.col("a.b") == F.col("bb.b"),
                    F.col("a.c").cast("double") * F.col("bb.c") / 2,
                )
                .otherwise(0.0)
            ).alias("j")
        )
    )
    gs = cells.groupBy("g").agg(F.sum("c").cast("bigint").alias("n"))
    ts = cells.groupBy("b").agg(F.sum("c").cast("bigint").alias("t"))
    nd = F.col("n").cast("double")
    td = F.col("t").cast("double")
    gmom = gs.agg(
        F.sum("n").cast("double").alias("nn"),
        F.count(F.lit(1)).cast("int").alias("k_groups"),
        F.sum(nd * nd).alias("sn2"),
        F.sum(nd * (nd - 1) * (2 * nd + 5)).alias("ga"),
        F.sum(nd * (nd - 1) * (nd - 2)).alias("gb"),
        F.sum(nd * (nd - 1)).alias("gc"),
    )
    tmom = ts.agg(
        F.sum(td * (td - 1) * (2 * td + 5)).alias("ta"),
        F.sum(td * (td - 1) * (td - 2)).alias("tb"),
        F.sum(td * (td - 1)).alias("tc"),
    )
    nn = F.col("nn")
    ej = (nn * nn - F.col("sn2")) / 4.0
    vj = (
        (nn * (nn - 1) * (2 * nn + 5) - F.col("ga") - F.col("ta")) / 72.0
        + F.col("gb") * F.col("tb") / (36.0 * nn * (nn - 1) * (nn - 2))
        + F.col("gc") * F.col("tc") / (8.0 * nn * (nn - 1))
    )
    z = (F.col("j") - ej) / F.sqrt(vj)
    return (
        u.crossJoin(F.broadcast(gmom))
        .crossJoin(F.broadcast(tmom))
        .select(
            nn.cast("bigint").alias("n_total"),
            "k_groups",
            F.round("j", 2).alias("j_stat"),
            F.round(ej, 2).alias("e_j"),
            F.round(z, 6).alias("z_stat"),
            F.round(
                F.least(F.lit(1.0), F.greatest(F.lit(0.0), _normal_sf(z))), 6
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# ts_cox_stuart — sign test for trend, exact binomial through m = 20
# ---------------------------------------------------------------------------

_CS_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
pairs AS (
  SELECT a.event_type, CAST(max(a.n) AS BIGINT) AS n,
         CAST(sum(CASE WHEN b.m <> a.m THEN 1 ELSE 0 END) AS BIGINT) AS mm,
         CAST(sum(CASE WHEN b.m > a.m THEN 1 ELSE 0 END) AS BIGINT) AS s_pos
  FROM seq a
  JOIN seq b ON b.event_type = a.event_type
            AND b.t = a.t + CAST(ceil(a.n / 2.0) AS BIGINT)
  WHERE a.t <= a.n - CAST(ceil(a.n / 2.0) AS BIGINT)
  GROUP BY a.event_type
),
stat AS (
  SELECT event_type, n, mm, s_pos,
         greatest(s_pos, mm - s_pos) AS kk
  FROM pairs
)
SELECT event_type, n AS n_days, mm AS m_pairs, s_pos,
       round(CASE
         WHEN mm = 0 THEN 1.0
         WHEN mm <= 20 THEN least(1.0,
           2 * list_sum(list_transform(range(kk, mm + 1),
                 j -> CAST(factorial(CAST(mm AS INT)) AS DOUBLE)
                      / factorial(CAST(j AS INT))
                      / factorial(CAST(mm - j AS INT))))
             / pow(2.0, mm))
         ELSE least(1.0, 2 * {_normal_sf_sql(
             '(greatest(s_pos, mm - s_pos) - mm / 2.0) / sqrt(mm / 4.0)')})
       END, 6) AS p_value
FROM stat
"""


@register("ts_cox_stuart", _CS_ORACLE)
def ts_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox & Stuart's sign test for trend (1955): pair day i of the
    daily-mean series with day i + ceil(n/2) (first half vs second
    half), count positive differences S among the m non-tied pairs,
    and test S against Binomial(m, 1/2) two-sided. The p is EXACT —
    the binomial tail sums factorial ratios, which are exact integers
    through m = 20 (both engines' factorial is 64-bit; 21! overflows),
    so the 30-day fixture (m = 15) always takes the exact branch; the
    documented scale path for longer series is the normal branch,
    chosen by the SAME m in both engines. The simplest member of the
    trend family: MK counts all O(n^2) pairs, Cox-Stuart only the n/2
    half-offset pairs — one self-join at offset ceil(n/2), no rank
    window at all. Scale: daily reduction is the only
    data-proportional stage; everything after is per-key arithmetic
    on one row."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    w = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "m",
        F.row_number().over(w.orderBy("d")).alias("t"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    c = F.ceil(F.col("a.n") / 2.0).cast("bigint")
    pairs = (
        seq.alias("a")
        .join(
            seq.alias("b"),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.t") == F.col("a.t") + c),
        )
        .filter(F.col("a.t") <= F.col("a.n") - c)
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.max("a.n").cast("bigint").alias("n"),
            F.sum((F.col("b.m") != F.col("a.m")).cast("int"))
            .cast("bigint")
            .alias("mm"),
            F.sum((F.col("b.m") > F.col("a.m")).cast("int"))
            .cast("bigint")
            .alias("s_pos"),
        )
    )
    kk = F.greatest(F.col("s_pos"), F.col("mm") - F.col("s_pos"))
    exact = (
        2
        * F.aggregate(
            F.sequence(kk, F.col("mm")),
            F.lit(0.0),
            lambda acc, j: acc
            + F.factorial(F.col("mm")).cast("double")
            / F.factorial(j)
            / F.factorial(F.col("mm") - j),
        )
        / F.pow(F.lit(2.0), F.col("mm"))
    )
    znorm = (kk - F.col("mm") / 2.0) / F.sqrt(F.col("mm") / 4.0)
    p = (
        F.when(F.col("mm") == 0, F.lit(1.0))
        .when(F.col("mm") <= 20, F.least(F.lit(1.0), exact))
        .otherwise(F.least(F.lit(1.0), 2 * _normal_sf(znorm)))
    )
    return pairs.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("mm").alias("m_pairs"),
        "s_pos",
        F.round(p, 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# ts_bartels_rank — rank von Neumann ratio test of serial randomness
# ---------------------------------------------------------------------------

_BR_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, d,
         rank() OVER (PARTITION BY event_type ORDER BY m)
           + (count(*) OVER (PARTITION BY event_type, m) - 1) / 2.0 AS r,
         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
  FROM daily
),
lagd AS (
  SELECT event_type, n, r,
         lead(r) OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM rk
),
agg AS (
  SELECT event_type, max(n) AS n,
         sum(CASE WHEN rn IS NOT NULL THEN (r - rn) * (r - rn) END) AS nm,
         sum((r - (n + 1) / 2.0) * (r - (n + 1) / 2.0)) AS dn
  FROM lagd GROUP BY event_type
),
stat AS (
  SELECT event_type, n, nm / dn AS rvn,
         (nm / dn - 2)
           / sqrt(4.0 * (n - 2) * (5 * n * n - 2 * n - 9)
                  / (5.0 * n * (n + 1) * (n - 1) * (n - 1))) AS z
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       round(rvn, 6) AS rvn_stat,
       round(z, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql('abs(z)')}), 6) AS p_value
FROM stat
"""


@register("ts_bartels_rank", _BR_ORACLE)
def ts_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank version of von Neumann's ratio (Bartels 1982) —
    the rank test of serial RANDOMNESS: with midranks r_t of the daily
    means, RVN = sum (r_t - r_{t+1})^2 / sum (r_t - (n+1)/2)^2; under
    exchangeability E[RVN] = 2 exactly, and the exact null variance is
    4(n-2)(5n^2-2n-9) / (5n(n+1)(n-1)^2) (Bartels eq. 4; with midrank
    ties the denominator uses the realized rank variance, which is the
    standard plug-in). RVN << 2 flags positive serial dependence
    (neighbors too close in rank), RVN >> 2 alternation — the rank
    complement to ts_ljung_box's parametric ACF test and the runs
    test's coarser binary reduction. Two-sided normal p, MC-audited
    under the iid null. Scale: one rank window + one lead per key over
    CLOCK-bounded daily series; the only data-proportional stage is
    the daily reduction."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    wk = Window.partitionBy("event_type")
    rk = daily.select(
        "event_type",
        "d",
        (
            F.rank().over(wk.orderBy("m"))
            + (F.count(F.lit(1)).over(Window.partitionBy("event_type", "m")) - 1)
            / 2.0
        ).alias("r"),
        F.count(F.lit(1)).over(wk).cast("double").alias("n"),
    )
    lagd = rk.select(
        "event_type",
        "n",
        "r",
        F.lead("r").over(wk.orderBy("d")).alias("rn"),
    )
    agg = lagd.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(
                F.col("rn").isNotNull(),
                (F.col("r") - F.col("rn")) * (F.col("r") - F.col("rn")),
            )
        ).alias("nm"),
        F.sum(
            (F.col("r") - (F.col("n") + 1) / 2.0)
            * (F.col("r") - (F.col("n") + 1) / 2.0)
        ).alias("dn"),
    )
    n = F.col("n")
    rvn = F.col("nm") / F.col("dn")
    z = (rvn - 2) / F.sqrt(
        4.0 * (n - 2) * (5 * n * n - 2 * n - 9) / (5.0 * n * (n + 1) * (n - 1) * (n - 1))
    )
    return agg.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.round(rvn, 6).alias("rvn_stat"),
        F.round(z, 6).alias("z_stat"),
        F.round(F.least(F.lit(1.0), 2 * _normal_sf(F.abs(z))), 6).alias("p_value"),
    )
