"""Query surface batch 45 (round 7): rank association, uplift
evaluation, sequential drift, rank changepoint, and BFS centrality.

- stats_kendall_tau_b — Kendall's tau-b between per-user view and
  purchase counts: concordant/discordant pairs from the (x, y) CELL
  GRID (integer-exact), with the standard tie corrections. The
  pair-level complement to stats_spearman_corr's moment formula.
- eval_qini_uplift — Qini / uplift gains table of a deterministic
  targeting score against a hashed treatment split: the standard
  "did targeting the top deciles ADD conversions vs control" readout
  (Radcliffe 2007), on the sharded exact-ntile substrate.
- ts_page_hinkley — the Page-Hinkley sequential mean-drift detector
  over the daily mean event value (Page 1954; the streaming-drift
  standard in river/MOA): cumulative deviation from the running mean
  minus its running minimum, first alarm day where the gap exceeds
  lambda.
- ts_pettitt_changepoint — Pettitt's nonparametric changepoint test
  per event type: U_t from midranks (2*cumrank - t*(n+1), integer-
  exact under ties), K = max|U_t| with its earliest day and the
  approximate significance 2*exp(-6K^2/(n^3+n^2)). The rank-based
  complement to ts_cusum_changepoint's mean-shift CUSUM.
- graph_closeness_harmonic — harmonic closeness centrality of the 5
  smallest co-ordered-parts vertices via multi-source bounded BFS
  (sum of 1/dist over reached vertices; the disconnection-safe
  closeness variant).

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
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_kendall_tau_b — pair-concordance rank association on the cell grid
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
cell AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY x, y),
pairs AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END)
              AS BIGINT) AS conc,
         CAST(sum(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END)
              AS BIGINT) AS disc
  FROM cell a JOIN cell b ON b.x > a.x
),
mx AS (SELECT sum(t * (t - 1) / 2) AS n1
       FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cell GROUP BY x)),
my AS (SELECT sum(t * (t - 1) / 2) AS n2
       FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cell GROUP BY y)),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell)
SELECT n AS n_users, conc AS concordant, disc AS discordant,
       round((conc - disc)
             / sqrt((n * (n - 1) / 2.0 - n1) * (n * (n - 1) / 2.0 - n2)),
             6) AS kendall_tau_b
FROM pairs, mx, my, tot
"""


@register("stats_kendall_tau_b", _KENDALL_ORACLE)
def stats_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between per-user view count and purchase count.
    Scale: ONE user-grain hash-agg, then every pair statistic collapses
    to the (x, y) CELL GRID — concordant/discordant pairs are a
    broadcast non-equi self-join of the grid (|grid| is bounded by the
    activity-count range, hundreds of cells, NOT the user count), and
    the tie corrections n1/n2 are marginal aggregates of the same grid.
    All counts stay integer until the final ratio, so both engines
    produce bit-identical tau under arbitrarily heavy ties — the
    pairwise complement to stats_spearman_corr's moment formula."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    cell = u.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a, b = cell.alias("a"), cell.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("b.x") > F.col("a.x"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), F.col("a.c") * F.col("b.c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("conc"),
            F.sum(
                F.when(F.col("b.y") < F.col("a.y"), F.col("a.c") * F.col("b.c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("disc"),
        )
    )
    n1 = (
        cell.groupBy("x")
        .agg(F.sum("c").cast("bigint").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n1"))
    )
    n2 = (
        cell.groupBy("y")
        .agg(F.sum("c").cast("bigint").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n2"))
    )
    tot = cell.agg(F.sum("c").cast("bigint").alias("n"))
    half = F.col("n") * (F.col("n") - 1) / F.lit(2.0)
    return (
        pairs.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_users"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc"))
                / F.sqrt((half - F.col("n1")) * (half - F.col("n2"))),
                6,
            ).alias("kendall_tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# eval_qini_uplift — uplift gains table on the sharded exact-ntile
# ---------------------------------------------------------------------------

_QINI_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(user_id % 2 = 0 AS INT) AS treated,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
d AS (
  SELECT ntile(10) OVER (ORDER BY score DESC, user_id) AS decile,
         treated, conv
  FROM u
),
g AS (
  SELECT decile,
         CAST(sum(treated) AS BIGINT) AS n_t,
         CAST(sum(1 - treated) AS BIGINT) AS n_c,
         CAST(sum(treated * conv) AS BIGINT) AS r_t,
         CAST(sum((1 - treated) * conv) AS BIGINT) AS r_c
  FROM d GROUP BY decile
),
cum AS (
  SELECT decile, n_t, n_c,
         sum(n_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS ct,
         sum(n_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cc,
         sum(r_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS crt,
         sum(r_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS crc
  FROM g
)
SELECT CAST(decile AS INT) AS decile, n_t AS n_treated, n_c AS n_control,
       round(crt - crc * (ct / CAST(cc AS DOUBLE)), 6) AS qini,
       round(crt / CAST(ct AS DOUBLE)
             - crc / CAST(cc AS DOUBLE), 6) AS cum_uplift
FROM cum
"""


@register("eval_qini_uplift", _QINI_ORACLE)
def eval_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini gains table (Radcliffe 2007): users ranked by a click-count
    targeting score into exact deciles; treatment is the deterministic
    user_id parity split; per cumulative decile the Qini value
    (incremental treated conversions over the control expectation,
    qini_k = R_t - R_c * N_t/N_c) and the cumulative uplift rate
    difference. THE standard readout for "does targeting by this score
    add conversions". Scale: ONE user-grain hash-agg; the decile
    ranking is the sharded exact_ntile substrate (no single-partition
    window); everything after lives on the 10-row decile grid."""
    from kafka_etl_consumer_spark.operators.shard import exact_ntile

    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("conv"),
    ).withColumn("treated", (F.col("user_id") % 2 == 0).cast("int"))
    d = exact_ntile(
        u,
        [F.col("score").desc(), F.col("user_id").asc()],
        10,
        out_col="decile",
        shard_key=-F.col("score"),
    ).select("decile", "treated", "conv")
    g = d.groupBy("decile").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_c"),
        F.sum(F.col("treated") * F.col("conv")).cast("bigint").alias("r_t"),
        F.sum((1 - F.col("treated")) * F.col("conv"))
        .cast("bigint")
        .alias("r_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "decile",
        "n_t",
        "n_c",
        F.sum("n_t").over(wc).alias("ct"),
        F.sum("n_c").over(wc).alias("cc"),
        F.sum("r_t").over(wc).alias("crt"),
        F.sum("r_c").over(wc).alias("crc"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_t").alias("n_treated"),
        F.col("n_c").alias("n_control"),
        F.round(
            F.col("crt") - F.col("crc") * (F.col("ct") / F.col("cc").cast("double")),
            6,
        ).alias("qini"),
        F.round(
            F.col("crt") / F.col("ct").cast("double")
            - F.col("crc") / F.col("cc").cast("double"),
            6,
        ).alias("cum_uplift"),
    )


# ---------------------------------------------------------------------------
# ts_page_hinkley — sequential mean-drift detector on the daily series
# ---------------------------------------------------------------------------

_PH_DELTA = 0.1
_PH_LAMBDA = 5.0

_PH_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1
),
run AS (
  SELECT d, m,
         avg(m) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS rm,
         row_number() OVER (ORDER BY d) AS t
  FROM daily
),
cum AS (
  SELECT d, t,
         sum(m - rm - {_PH_DELTA})
           OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS u
  FROM run
),
ph AS (
  SELECT d, t, u,
         u - min(u) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS ph_t
  FROM cum
)
SELECT CAST(max(t) AS BIGINT) AS n_days,
       round(max(ph_t), 6) AS max_ph,
       strftime(min(CASE WHEN ph_t > {_PH_LAMBDA} THEN d END),
                '%Y-%m-%d') AS alarm_day,
       CAST(max(ph_t) > {_PH_LAMBDA} AS INT) AS drift_detected
FROM ph
"""


@register("ts_page_hinkley", _PH_ORACLE)
def ts_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift detector (Page 1954; the default
    drift monitor in river/MOA) on the daily mean event value:
    cumulative deviation from the RUNNING mean (tolerance delta=0.1),
    alarm when the deviation rises more than lambda=5.0 above its
    running minimum — reports the first alarm day and the peak
    statistic. Scale: one day-grain hash-agg, then three prefix passes
    over the bounded day grid; the daily mean rounds to 6dp in BOTH
    engines before any prefix arithmetic so the cumulative sums see
    identical inputs."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "value")
        .groupBy("d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    wp = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select(
        "d",
        "m",
        F.avg("m").over(wp).alias("rm"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
    )
    cum = run.select(
        "d", "t", F.sum(F.col("m") - F.col("rm") - _PH_DELTA).over(wp).alias("u")
    )
    ph = cum.select(
        "d", "t", (F.col("u") - F.min("u").over(wp)).alias("ph_t")
    )
    return ph.agg(
        F.max("t").cast("bigint").alias("n_days"),
        F.round(F.max("ph_t"), 6).alias("max_ph"),
        F.date_format(
            F.min(F.when(F.col("ph_t") > _PH_LAMBDA, F.col("d"))), "yyyy-MM-dd"
        ).alias("alarm_day"),
        (F.max("ph_t") > _PH_LAMBDA).cast("int").alias("drift_detected"),
    )


# ---------------------------------------------------------------------------
# ts_pettitt_changepoint — rank-based changepoint, integer-exact
# ---------------------------------------------------------------------------

_PETTITT_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, d,
         rank() OVER (PARTITION BY event_type ORDER BY c)
           + (count(*) OVER (PARTITION BY event_type, c) - 1) / 2.0 AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
ut AS (
  SELECT event_type, d, n,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         sum(r) OVER (PARTITION BY event_type ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS cr
  FROM rk
),
stat AS (
  SELECT event_type, d, n,
         abs(2 * cr - t * (n + 1)) AS abs_u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(2 * cr - t * (n + 1)) DESC, d) AS rn
  FROM ut
  WHERE t < n
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS change_day,
       round(abs_u, 1) AS k_stat,
       round(least(1.0, 2 * exp(-6.0 * abs_u * abs_u
                                / (n * n * n + n * n))), 6) AS p_value
FROM stat WHERE rn = 1
"""


@register("ts_pettitt_changepoint", _PETTITT_ORACLE)
def ts_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric changepoint test per event type on the
    daily count series: U_t = 2*cumrank_t - t*(n+1) over midranks
    (integer-exact halves under ties), K = max|U_t| at the earliest
    day, significance ~ 2*exp(-6K^2/(n^3+n^2)). The distribution-free
    complement to ts_cusum_changepoint (which assumes a mean shift in
    level). Scale: one hash-agg to the day grain, then rank/prefix
    windows over the bounded (type x day) grid only — midranks from
    marginal counts keep every intermediate an exact multiple of 0.5,
    so both engines agree bit for bit."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wt = Window.partitionBy("event_type")
    rk = daily.select(
        "event_type",
        "d",
        (
            F.rank().over(wt.orderBy("c"))
            + (F.count(F.lit(1)).over(Window.partitionBy("event_type", "c")) - 1)
            / 2.0
        ).alias("r"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    wd = wt.orderBy("d")
    ut = rk.select(
        "event_type",
        "d",
        "n",
        F.row_number().over(wd).alias("t"),
        F.sum("r").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("cr"),
    )
    stat = ut.filter(F.col("t") < F.col("n")).select(
        "event_type",
        "d",
        "n",
        F.abs(2 * F.col("cr") - F.col("t") * (F.col("n") + 1)).alias("abs_u"),
    )
    best = stat.groupBy("event_type").agg(
        F.min(F.struct((-F.col("abs_u")).alias("nu"), F.col("d"), F.col("n"))).alias(
            "m"
        )
    )
    n = F.col("m.n").cast("double")
    k = -F.col("m.nu")
    return best.select(
        "event_type",
        F.date_format(F.col("m.d"), "yyyy-MM-dd").alias("change_day"),
        F.round(k, 1).alias("k_stat"),
        F.round(
            F.least(
                F.lit(1.0), 2 * F.exp(-6.0 * k * k / (n * n * n + n * n))
            ),
            6,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# graph_closeness_harmonic — multi-source bounded-BFS harmonic closeness
# ---------------------------------------------------------------------------

_CLOSENESS_HOPS = 4
_CLOSENESS_SRCS = 5

_CLOSENESS_ORACLE = f"""
WITH RECURSIVE
{_COORD_EDGE_CTE},
sym AS (SELECT p1 AS u, p2 AS v FROM e0
        UNION ALL SELECT p2 AS u, p1 AS v FROM e0),
srcs AS (SELECT DISTINCT u AS s FROM sym ORDER BY u LIMIT {_CLOSENESS_SRCS}),
walk(s, v, hop) AS (
  SELECT s, s, 0 FROM srcs
  UNION ALL
  SELECT walk.s, e.v, walk.hop + 1 FROM walk JOIN sym e ON e.u = walk.v
  WHERE walk.hop < {_CLOSENESS_HOPS}
),
dist AS (SELECT s, v, min(hop) AS h FROM walk GROUP BY s, v)
SELECT s AS source,
       CAST(count(*) - 1 AS BIGINT) AS n_reached,
       round(sum(CASE WHEN h > 0 THEN 1.0 / h ELSE 0 END), 6)
         AS harmonic_closeness
FROM dist GROUP BY s
"""


@register("graph_closeness_harmonic", _CLOSENESS_ORACLE)
def graph_closeness_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality (sum of 1/dist to every vertex
    reached within 4 hops — the disconnection-safe closeness variant)
    of the 5 smallest vertices of the co-ordered-parts graph, by
    MULTI-SOURCE BFS: state is (source, vertex, dist), every round one
    frontier ⋈ edges join + a min-dist hash-agg, the edge side
    partitioned once and reused across rounds. The oracle's recursive
    CTE enumerates bounded paths (combinatorial at scale), which is
    exactly why the engine iterates distances instead; sources are a
    |srcs|-row TakeOrdered, never a sort of the vertex set.

    Optimization r11 re-measured the betweenness-family eager-edge +
    loop-width treatment here and REVERTED it: the sf0.1 sym state
    (~120k rows) already sizes to the session width, so the only
    change was one extra count job (measured 1.75 s → 1.81 s — pure
    overhead; the lazy checkpoint already materializes sym exactly
    once)."""
    e0 = _coordered_edges(spark, sf_dir)
    sym = e0.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e0.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    sym = sym.repartition("u").localCheckpoint(eager=False)
    srcs = (
        sym.select(F.col("u").alias("s"))
        .distinct()
        .orderBy("s")
        .limit(_CLOSENESS_SRCS)
    )
    dist = srcs.select("s", F.col("s").alias("v"), F.lit(0).alias("hop"))
    dist = dist.localCheckpoint(eager=False)
    for h in range(1, _CLOSENESS_HOPS + 1):
        frontier = dist.filter(F.col("hop") == h - 1)
        step = (
            frontier.alias("f")
            .join(sym.alias("e"), F.col("e.u") == F.col("f.v"))
            .select("f.s", F.col("e.v").alias("v"), F.lit(h).alias("hop"))
        )
        dist = (
            dist.unionByName(step)
            .groupBy("s", "v")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint(eager=False)
        )
    return dist.groupBy(F.col("s").alias("source")).agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
        F.round(
            F.sum(F.when(F.col("hop") > 0, 1.0 / F.col("hop")).otherwise(0.0)), 6
        ).alias("harmonic_closeness"),
    )
