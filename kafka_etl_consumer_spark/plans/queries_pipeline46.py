"""Query surface batch 50 (round 9, third wave): random-walk testing,
robust two-sample comparison, regularization, and graph topology.

- ts_variance_ratio — Lo-MacKinlay variance-ratio test per event type:
  is the daily mean series a random walk? The hypothesis-test
  complement to ts_hurst_rs' exponent estimate.
- stats_brunner_munzel — the Brunner-Munzel rank test (the modern
  Behrens-Fisher-safe replacement for Mann-Whitney when variances and
  shapes differ), purchase vs view values on a 64-bin grid.
- ml_ridge_path — ridge regression on standardized OLS moments for a
  lambda grid: the regularization-path view of ml_ols_normal_eq's fit,
  still ONE aggregate pass.
- graph_rich_club — rich-club coefficients phi(k) of the
  co-ordered-parts graph: do high-degree parts preferentially co-order
  with each other?

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline7 import (
    _COORD_EDGE_CTE,
    _coordered_edges,
)
from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_variance_ratio — Lo-MacKinlay random-walk test per event type
# ---------------------------------------------------------------------------

_VR_QS = (2, 4, 8)

_VR_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
  FROM daily
),
dims AS (
  SELECT event_type, CAST(max(t) AS BIGINT) AS tt
  FROM seq GROUP BY event_type
),
mu AS (
  SELECT s.event_type,
         (max(CASE WHEN t = tt THEN m END) - max(CASE WHEN t = 1 THEN m END))
           / (tt - 1.0) AS mu, tt
  FROM seq s JOIN dims USING (event_type)
  GROUP BY s.event_type, tt
),
lagd AS (
  SELECT event_type, t, m,
         {", ".join(f"lag(m, {q}) OVER (PARTITION BY event_type ORDER BY t) AS m{q}" for q in (1,) + _VR_QS)}
  FROM seq
),
v1 AS (
  SELECT l.event_type,
         sum((m - m1 - mu) * (m - m1 - mu)) / (tt - 1.0) AS var1
  FROM lagd l JOIN mu USING (event_type)
  WHERE m1 IS NOT NULL GROUP BY l.event_type, tt
),
vq AS (
  {" UNION ALL ".join(f'''
  SELECT l.event_type, {q} AS q,
         sum((m - m{q} - {q} * mu) * (m - m{q} - {q} * mu))
           / ({q} * (tt - {q}.0)) AS varq
  FROM lagd l JOIN mu USING (event_type)
  WHERE m{q} IS NOT NULL GROUP BY l.event_type, tt''' for q in _VR_QS)}
),
vr AS (
  SELECT vq.event_type, q, varq / var1 AS vr, tt - 1.0 AS nd
  FROM vq JOIN v1 USING (event_type) JOIN mu USING (event_type)
),
z AS (
  SELECT event_type, q, vr,
         (vr - 1) / sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * nd)) AS zv
  FROM vr
)
SELECT event_type, CAST(q AS INT) AS q,
       round(vr, 6) AS variance_ratio,
       round(zv, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql('abs(zv)')}), 6) AS p_value
FROM z
"""


@register("ts_variance_ratio", _VR_ORACLE)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (1988) per event type: under a
    random walk with drift, the variance of q-step increments of the
    daily mean series is q times the 1-step variance, so VR(q) =
    var_q/(q*var_1) = 1; VR > 1 means positive serial dependence
    (trending), VR < 1 mean reversion — the hypothesis test beside
    ts_hurst_rs' point estimate. Estimators: drift mu = (m_T - m_1)/
    (T-1); var_1 = sum(d_t - mu)^2/(T-1) over 1-step diffs; var_q uses
    the OVERLAPPING q-step increments / (q*(T-q)); z = (VR-1) /
    sqrt(2(2q-1)(q-1)/(3q*n_d)) under homoskedasticity (documented
    simple form; both engines spell the identical estimator). Scale:
    the series is calendar-grain, so beyond the daily hash-agg every
    lag window runs on a 30-row grid per key."""
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
    wk = Window.partitionBy("event_type").orderBy("d")
    seq = daily.select(
        "event_type", "m", F.row_number().over(wk).alias("t")
    )
    wt = Window.partitionBy("event_type").orderBy("t")
    lagd = seq.select(
        "event_type",
        "t",
        "m",
        *[F.lag("m", q).over(wt).alias(f"m{q}") for q in (1,) + tuple(_VR_QS)],
    )
    dims = seq.groupBy("event_type").agg(
        F.max("t").cast("bigint").alias("tt"),
        F.max_by("m", "t").alias("m_last"),
        F.min_by("m", "t").alias("m_first"),
    )
    mu = dims.select(
        "event_type",
        ((F.col("m_last") - F.col("m_first")) / (F.col("tt") - 1.0)).alias("mu"),
        "tt",
    )
    ld = lagd.join(mu, "event_type")
    v1 = (
        ld.filter(F.col("m1").isNotNull())
        .groupBy("event_type")
        .agg(
            (
                F.sum(
                    (F.col("m") - F.col("m1") - F.col("mu"))
                    * (F.col("m") - F.col("m1") - F.col("mu"))
                )
                / (F.first("tt") - 1.0)
            ).alias("var1")
        )
    )
    parts = []
    for q in _VR_QS:
        dq = F.col("m") - F.col(f"m{q}") - q * F.col("mu")
        parts.append(
            ld.filter(F.col(f"m{q}").isNotNull())
            .groupBy("event_type")
            .agg(
                F.lit(q).alias("q"),
                (F.sum(dq * dq) / (q * (F.first("tt") - float(q)))).alias("varq"),
            )
        )
    vq = parts[0]
    for p in parts[1:]:
        vq = vq.unionByName(p)
    vr = (
        vq.join(v1, "event_type")
        .join(mu.select("event_type", "tt"), "event_type")
        .select(
            "event_type",
            "q",
            (F.col("varq") / F.col("var1")).alias("vr"),
            (F.col("tt") - 1.0).alias("nd"),
        )
    )
    zv = (F.col("vr") - 1) / F.sqrt(
        2.0 * (2 * F.col("q") - 1) * (F.col("q") - 1) / (3.0 * F.col("q") * F.col("nd"))
    )
    return vr.select(
        "event_type",
        F.col("q").cast("int").alias("q"),
        F.round("vr", 6).alias("variance_ratio"),
        F.round(zv, 6).alias("z_stat"),
        F.round(F.least(F.lit(1.0), 2 * _normal_sf(F.abs(zv))), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# stats_brunner_munzel — rank-based Behrens-Fisher test on a 64-bin grid
# ---------------------------------------------------------------------------

_BM_BINS = 64
_BM_G1, _BM_G2 = "purchase", "view"

_BM_ORACLE = f"""
WITH base AS (
  SELECT event_type AS g, value AS x FROM events
  WHERE event_type IN ('{_BM_G1}', '{_BM_G2}')
),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
cells AS (
  SELECT g, least({_BM_BINS - 1},
                  CAST(floor((x - lo) / (hi - lo) * {_BM_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM base, rng GROUP BY 1, 2
),
pooled AS (
  SELECT b, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY b
),
pc AS (
  SELECT b, t,
         sum(t) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cumt
  FROM pooled
),
wc AS (
  SELECT g, b, c,
         sum(c) OVER (PARTITION BY g ORDER BY b ROWS UNBOUNDED PRECEDING)
           AS cumc
  FROM cells
),
rk AS (
  SELECT wc.g, wc.b, wc.c,
         pc.cumt - pc.t + (pc.t + 1) / 2.0 AS rc,
         wc.cumc - wc.c + (wc.c + 1) / 2.0 AS rw
  FROM wc JOIN pc USING (b)
),
ns AS (
  SELECT g, CAST(sum(c) AS DOUBLE) AS n, sum(c * rc) / sum(c) AS rbar
  FROM rk GROUP BY g
),
sv AS (
  SELECT rk.g, ns.n, ns.rbar,
         sum(c * (rc - rw - (rbar - (n + 1) / 2.0))
               * (rc - rw - (rbar - (n + 1) / 2.0))) / (n - 1) AS s2
  FROM rk JOIN ns USING (g) GROUP BY rk.g, ns.n, ns.rbar
),
stat AS (
  SELECT a.n AS n1, b.n AS n2, a.rbar AS r1, b.rbar AS r2,
         a.s2 AS s21, b.s2 AS s22,
         (b.rbar - a.rbar) / (a.n + b.n) + 0.5 AS p_hat,
         a.n * b.n * (b.rbar - a.rbar)
           / ((a.n + b.n) * sqrt(a.n * a.s2 + b.n * b.s2)) AS w
  FROM (SELECT * FROM sv WHERE g = '{_BM_G1}') a
  CROSS JOIN (SELECT * FROM sv WHERE g = '{_BM_G2}') b
)
SELECT CAST(n1 AS BIGINT) AS n_{_BM_G1}, CAST(n2 AS BIGINT) AS n_{_BM_G2},
       round(p_hat, 6) AS p_hat,
       round(w, 6) AS w_stat,
       round(least(1.0, 2 * {_normal_sf_sql('abs(w)')}), 6) AS p_value
FROM stat
"""


@register("stats_brunner_munzel", _BM_ORACLE)
def stats_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel rank test (2000) of P(X < Y) + P(X = Y)/2 = 1/2,
    purchase vs view event values: the Behrens-Fisher-safe replacement
    for Mann-Whitney — it stays valid when the two groups differ in
    variance AND shape, because the variance estimate uses each group's
    OWN rank dispersion (combined midrank minus within-group midrank).
    Large-sample normal reference (n ~ thousands per group here; both
    engines spell the identical statistic). Values quantize to a 64-bin
    grid first (the stats_mannwhitney_u_binned pattern) so the tie
    structure — and therefore every midrank — is identical
    cross-engine. Scale: one hash-agg to <=2*64 cells, bounded-grid
    windows, then closed-form scalars; the p_hat estimate doubles as
    the common-language effect size."""
    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin(_BM_G1, _BM_G2)).select(
        F.col("event_type").alias("g"), F.col("value").alias("x")
    )
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    cells = (
        base.crossJoin(F.broadcast(rng))
        .select(
            "g",
            F.least(
                F.lit(_BM_BINS - 1),
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _BM_BINS
                ),
            ).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pooled = cells.groupBy("b").agg(F.sum("c").cast("bigint").alias("t"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pc = pooled.select(
        "b", "t", F.sum("t").over(wb).alias("cumt")
    )
    wg = Window.partitionBy("g").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wc = cells.select("g", "b", "c", F.sum("c").over(wg).alias("cumc"))
    rk = wc.join(pc, "b").select(
        "g",
        "b",
        "c",
        (F.col("cumt") - F.col("t") + (F.col("t") + 1) / 2.0).alias("rc"),
        (F.col("cumc") - F.col("c") + (F.col("c") + 1) / 2.0).alias("rw"),
    )
    ns = rk.groupBy("g").agg(
        F.sum("c").cast("double").alias("n"),
        (F.sum(F.col("c") * F.col("rc")) / F.sum("c")).alias("rbar"),
    )
    dev = F.col("rc") - F.col("rw") - (F.col("rbar") - (F.col("n") + 1) / 2.0)
    sv = (
        rk.join(F.broadcast(ns), "g")
        .groupBy("g", "n", "rbar")
        .agg((F.sum(F.col("c") * dev * dev) / (F.col("n") - 1)).alias("s2"))
    )
    a = sv.filter(F.col("g") == _BM_G1).select(
        F.col("n").alias("n1"), F.col("rbar").alias("r1"), F.col("s2").alias("s21")
    )
    b2 = sv.filter(F.col("g") == _BM_G2).select(
        F.col("n").alias("n2"), F.col("rbar").alias("r2"), F.col("s2").alias("s22")
    )
    stat = a.crossJoin(F.broadcast(b2)).select(
        "n1",
        "n2",
        ((F.col("r2") - F.col("r1")) / (F.col("n1") + F.col("n2")) + 0.5).alias(
            "p_hat"
        ),
        (
            F.col("n1")
            * F.col("n2")
            * (F.col("r2") - F.col("r1"))
            / (
                (F.col("n1") + F.col("n2"))
                * F.sqrt(F.col("n1") * F.col("s21") + F.col("n2") * F.col("s22"))
            )
        ).alias("w"),
    )
    return stat.select(
        F.col("n1").cast("bigint").alias(f"n_{_BM_G1}"),
        F.col("n2").cast("bigint").alias(f"n_{_BM_G2}"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round("w", 6).alias("w_stat"),
        F.round(
            F.least(F.lit(1.0), 2 * _normal_sf(F.abs(F.col("w")))), 6
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# ml_ridge_path — ridge on standardized OLS moments, lambda grid
# ---------------------------------------------------------------------------

_RIDGE_LAMBDAS = (0.0, 0.1, 1.0, 10.0)

_RIDGE_ORACLE = f"""
WITH sums AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS s1, sum(l_discount) AS s2,
         sum(l_extendedprice) AS sy,
         sum(l_quantity * l_quantity) AS s11,
         sum(l_discount * l_discount) AS s22,
         sum(l_quantity * l_discount) AS s12,
         sum(l_quantity * l_extendedprice) AS s1y,
         sum(l_discount * l_extendedprice) AS s2y,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
),
mom AS (
  SELECT n,
         (s12 / n - s1 * s2 / (n * n))
           / sqrt((s11 / n - s1 * s1 / (n * n)) * (s22 / n - s2 * s2 / (n * n)))
           AS r,
         (s1y / n - s1 * sy / (n * n))
           / sqrt((s11 / n - s1 * s1 / (n * n)) * (syy / n - sy * sy / (n * n)))
           AS c1,
         (s2y / n - s2 * sy / (n * n))
           / sqrt((s22 / n - s2 * s2 / (n * n)) * (syy / n - sy * sy / (n * n)))
           AS c2
  FROM sums
),
grid AS (SELECT unnest([{", ".join(str(v) for v in _RIDGE_LAMBDAS)}]) AS lam),
beta AS (
  SELECT lam, n,
         ((1 + lam) * c1 - r * c2) / ((1 + lam) * (1 + lam) - r * r) AS b1,
         ((1 + lam) * c2 - r * c1) / ((1 + lam) * (1 + lam) - r * r) AS b2,
         c1, c2
  FROM mom CROSS JOIN grid
),
b0 AS (SELECT sqrt(b1 * b1 + b2 * b2) AS norm0 FROM beta WHERE lam = 0)
SELECT lam, CAST(n AS BIGINT) AS n_rows,
       round(b1, 6) AS beta_quantity_std,
       round(b2, 6) AS beta_discount_std,
       round(b1 * c1 + b2 * c2, 6) AS fit_r2,
       round(sqrt(b1 * b1 + b2 * b2) / norm0, 6) AS shrinkage
FROM beta CROSS JOIN b0
"""


@register("ml_ridge_path", _RIDGE_ORACLE)
def ml_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression l_extendedprice ~ l_quantity + l_discount on
    STANDARDIZED features for a lambda grid {{0, 0.1, 1, 10}} — the
    regularization path beside ml_ols_normal_eq's single fit (lambda=0
    reproduces OLS in correlation form; fit_r2 = beta'c is R^2 there
    and the explained-correlation proxy elsewhere; shrinkage =
    ||beta_lam|| / ||beta_0|| shows coefficients contracting toward 0).
    KEY scale identity (the ml_ols pattern): the ten moment sums come
    from ONE map-side-combined aggregate, every lambda is closed-form
    2x2 arithmetic on that single row — the whole path costs one scan
    at any data size, which is why grid-searched linear baselines are
    cheap at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    sums = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(d).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(q * q).alias("s11"),
        F.sum(d * d).alias("s22"),
        F.sum(q * d).alias("s12"),
        F.sum(q * y).alias("s1y"),
        F.sum(d * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    vq = F.col("s11") / n - F.col("s1") * F.col("s1") / (n * n)
    vd = F.col("s22") / n - F.col("s2") * F.col("s2") / (n * n)
    vy = F.col("syy") / n - F.col("sy") * F.col("sy") / (n * n)
    mom = sums.select(
        "n",
        (
            (F.col("s12") / n - F.col("s1") * F.col("s2") / (n * n))
            / F.sqrt(vq * vd)
        ).alias("r"),
        (
            (F.col("s1y") / n - F.col("s1") * F.col("sy") / (n * n))
            / F.sqrt(vq * vy)
        ).alias("c1"),
        (
            (F.col("s2y") / n - F.col("s2") * F.col("sy") / (n * n))
            / F.sqrt(vd * vy)
        ).alias("c2"),
    )
    grid = spark.range(len(_RIDGE_LAMBDAS)).select(
        F.element_at(
            F.array(*[F.lit(v) for v in _RIDGE_LAMBDAS]),
            (F.col("id") + 1).cast("int"),
        ).alias("lam")
    )
    lam, r, c1, c2 = F.col("lam"), F.col("r"), F.col("c1"), F.col("c2")
    det = (1 + lam) * (1 + lam) - r * r
    beta = mom.crossJoin(F.broadcast(grid)).select(
        "lam",
        "n",
        (((1 + lam) * c1 - r * c2) / det).alias("b1"),
        (((1 + lam) * c2 - r * c1) / det).alias("b2"),
        "c1",
        "c2",
    )
    norm0 = beta.filter(F.col("lam") == 0).select(
        F.sqrt(F.col("b1") * F.col("b1") + F.col("b2") * F.col("b2")).alias("norm0")
    )
    b1, b2 = F.col("b1"), F.col("b2")
    return beta.crossJoin(F.broadcast(norm0)).select(
        "lam",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(b1, 6).alias("beta_quantity_std"),
        F.round(b2, 6).alias("beta_discount_std"),
        F.round(b1 * F.col("c1") + b2 * F.col("c2"), 6).alias("fit_r2"),
        F.round(F.sqrt(b1 * b1 + b2 * b2) / F.col("norm0"), 6).alias("shrinkage"),
    )


# ---------------------------------------------------------------------------
# graph_rich_club — rich-club coefficient over a degree-threshold grid
# ---------------------------------------------------------------------------

_RC_KS = (2, 4, 8, 16)

_RC_ORACLE = f"""
WITH {_COORD_EDGE_CTE},
sym AS (SELECT p1 AS u, p2 AS v FROM e0
        UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
ks AS (SELECT unnest([{", ".join(str(k) for k in _RC_KS)}]) AS k),
nk AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
  FROM deg CROSS JOIN ks WHERE d > k GROUP BY k
),
ek AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_edges
  FROM e0
  JOIN deg d1 ON d1.u = e0.p1
  JOIN deg d2 ON d2.u = e0.p2
  CROSS JOIN ks
  WHERE d1.d > k AND d2.d > k
  GROUP BY k
)
SELECT nk.k AS k, nk.n_nodes, coalesce(ek.n_edges, 0) AS n_edges,
       round(2.0 * coalesce(ek.n_edges, 0)
             / (nk.n_nodes * (nk.n_nodes - 1.0)), 6) AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes > 1
"""


@register("graph_rich_club", _RC_ORACLE)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) of the
    co-ordered-parts graph for degree thresholds k in {{2,4,8,16}}: the
    edge density among vertices of degree > k. A phi(k) that RISES
    with k means hub parts preferentially co-order with other hubs
    (rich-club ordering, Colizza et al. 2006) — the topology diagnostic
    beside degree_powerlaw (distribution) and assortativity (mixing).
    Raw (unnormalized) coefficients — deterministic, no null-model
    sampling. Scale: degree is one hash-agg; membership is two
    vertex-keyed joins onto the edge list (hub sets shrink rapidly with
    k); the k-grid is a broadcast constant."""
    e0 = _coordered_edges(spark, sf_dir)
    sym = e0.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e0.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ks = spark.range(len(_RC_KS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _RC_KS]), (F.col("id") + 1).cast("int")
        ).alias("k")
    )
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    ek = (
        e0.join(deg.select(F.col("u").alias("p1"), F.col("d").alias("d1")), "p1")
        .join(deg.select(F.col("u").alias("p2"), F.col("d").alias("d2")), "p2")
        .crossJoin(F.broadcast(ks))
        .filter((F.col("d1") > F.col("k")) & (F.col("d2") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n_nodes") > 1)
        .select(
            "k",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round(
                2.0
                * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1.0)),
                6,
            ).alias("phi"),
        )
    )
