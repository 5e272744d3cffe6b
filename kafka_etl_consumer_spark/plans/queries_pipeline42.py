"""Query surface batch 46 (round 8): the vetted r7 backlog — post-hoc
and homogeneity statistics, boosting, seeded graph relevance, keyword
extraction, uplift summarization, normality, and a value-grain
changepoint.

- stats_breslow_day — homogeneity of odds ratios across the CMH
  strata (Breslow & Day 1980): per-stratum fitted counts under the
  Mantel-Haenszel common OR via the closed-form quadratic root, then
  the chi-square sum. Answers the question stats_cmh_test assumes
  away: IS the odds ratio actually common across strata?
- stats_dunn_posthoc — Dunn's rank-based pairwise post-hoc after
  stats_kruskal_wallis (Dunn 1964), Bonferroni-adjusted, on the same
  tie-averaged count-grid rank substrate.
- ml_gbdt_stump_boost — 3 gradient-boosting rounds of regression
  stumps on residuals (squared loss, XGBoost-hist-style 32-bin
  candidate grid): after ONE histogram aggregate every round is
  closed-form on the 32-row grid, because the model is piecewise
  constant on bins.
- graph_random_walk_ppr — personalized PageRank from a 3-doc seed
  set over the deterministic synthetic link graph (Jeh & Widom 2003)
  — the seeded complement to graph_pagerank/HITS.
- text_rake_keywords — RAKE keyword extraction (Rose et al. 2010):
  phrases split at stopwords/non-alpha tokens, word score =
  degree/frequency over phrase co-occurrence, phrase score = sum of
  member word scores; corpus-level top-15.
- eval_uplift_at_k_curve — AUUC and the Qini coefficient summarizing
  eval_qini_uplift's gains table into the single numbers model
  comparisons use.
- stats_anderson_darling — A-D normality statistic per event type on
  the 64-bin value grid (Stephens-adjusted A*^2), weights from exact
  integer cumulative counts.
- ts_pettitt_values — Pettitt changepoint on the daily MEAN VALUE
  series (the value-grain twin of ts_pettitt_changepoint's count
  series): midranks over 6dp-rounded daily means, integer-exact U_t.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql  # noqa: F401 (tokens re-exported for older pipelines)
from kafka_etl_consumer_spark.operators.nlp import (
    KEYWORD_STOPWORDS,
    keyword_token_grid,
    phrase_members,
)
from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# stats_breslow_day — OR-homogeneity across the CMH strata
# ---------------------------------------------------------------------------

_BD_ORACLE = f"""
WITH base AS (
  SELECT event_type AS k, user_id % 2 AS grp,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS x
  FROM events
),
cells AS (
  SELECT k,
         CAST(sum(CASE WHEN grp = 0 AND x = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS a,
         CAST(sum(CASE WHEN grp = 0 AND x = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS b,
         CAST(sum(CASE WHEN grp = 1 AND x = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c,
         CAST(sum(CASE WHEN grp = 1 AND x = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS d
  FROM base GROUP BY k
),
mh AS (
  SELECT sum(a * d / (a + b + c + d)) / sum(b * c / (a + b + c + d)) AS psi
  FROM cells
),
fit AS (
  SELECT k, a, a + b AS r1, a + c AS c1, a + b + c + d AS nn, psi,
         1 - psi AS qa,
         (a + b + c + d - (a + b) - (a + c)) + psi * ((a + b) + (a + c)) AS qb,
         -psi * (a + b) * (a + c) AS qc
  FROM cells, mh
),
root AS (
  SELECT k, a, r1, c1, nn, psi,
         CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
              ELSE (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa) END AS af
  FROM fit
),
bd AS (
  SELECT CAST(count(*) AS BIGINT) AS k_strata, max(psi) AS psi,
         sum((a - af) * (a - af)
             * (1 / af + 1 / (r1 - af) + 1 / (c1 - af)
                + 1 / (nn - r1 - c1 + af))) AS stat
  FROM root
),
wh AS (
  SELECT k_strata, psi, stat,
         (pow(stat / (k_strata - 1.0), 1.0 / 3)
          - (1 - 2.0 / (9 * (k_strata - 1.0))))
           / sqrt(2.0 / (9 * (k_strata - 1.0))) AS z
  FROM bd
)
SELECT k_strata, round(psi, 6) AS or_mh, round(stat, 6) AS bd_stat,
       CAST(k_strata - 1 AS INT) AS df,
       round({_normal_sf_sql('z')}, 6) AS p_value
FROM wh
"""


@register("stats_breslow_day", _BD_ORACLE)
def stats_breslow_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day test that the odds ratio is HOMOGENEOUS across the
    strata stats_cmh_test pools (same stratification: event-type
    strata, user-parity arms, conversion = value > 50) — the
    prerequisite check for quoting the MH common OR at all. Each
    stratum's fitted count under the common OR psi solves the quadratic
    (1-psi)A^2 + [(N-r1-c1) + psi(r1+c1)]A - psi*r1*c1 = 0; the '+'
    root is the one inside [max(0, r1+c1-N), min(r1, c1)] for any psi
    (the other root falls outside the margin box). The statistic sums
    (a - A)^2 / Var(A) with the harmonic variance; p via the shared
    Wilson-Hilferty chi-square approximation at k-1 df. Scale: ONE hash
    aggregate to the |strata|-row cell grid, then pure closed-form
    arithmetic — flat at any event volume."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("k"),
        (F.col("user_id") % 2).alias("grp"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("x"),
    )
    cells = base.groupBy("k").agg(
        *[
            F.sum(
                F.when((F.col("grp") == g) & (F.col("x") == xv), 1).otherwise(0)
            )
            .cast("double")
            .alias(name)
            for name, g, xv in (("a", 0, 1), ("b", 0, 0), ("c", 1, 1), ("d", 1, 0))
        ]
    )
    mh = cells.agg(
        (
            F.sum(F.expr("a * d / (a + b + c + d)"))
            / F.sum(F.expr("b * c / (a + b + c + d)"))
        ).alias("psi")
    )
    fit = cells.crossJoin(F.broadcast(mh)).selectExpr(
        "k",
        "a",
        "a + b AS r1",
        "a + c AS c1",
        "a + b + c + d AS nn",
        "psi",
        "1 - psi AS qa",
        "(a + b + c + d - (a + b) - (a + c)) + psi * ((a + b) + (a + c)) AS qb",
        "-psi * (a + b) * (a + c) AS qc",
    )
    root = fit.selectExpr(
        "k",
        "a",
        "r1",
        "c1",
        "nn",
        "psi",
        "CASE WHEN abs(qa) < 1e-12 THEN -qc / qb"
        " ELSE (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa) END AS af",
    )
    bd = root.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_strata"),
        F.max("psi").alias("psi"),
        F.sum(
            F.expr(
                "(a - af) * (a - af)"
                " * (1 / af + 1 / (r1 - af) + 1 / (c1 - af)"
                "    + 1 / (nn - r1 - c1 + af))"
            )
        ).alias("stat"),
    )
    dfree = (F.col("k_strata") - 1).cast("double")
    z = (
        F.pow(F.col("stat") / dfree, F.lit(1.0 / 3)) - (1 - 2.0 / (9 * dfree))
    ) / F.sqrt(2.0 / (9 * dfree))
    return bd.select(
        "k_strata",
        F.round("psi", 6).alias("or_mh"),
        F.round("stat", 6).alias("bd_stat"),
        (F.col("k_strata") - 1).cast("int").alias("df"),
        F.round(_normal_sf(z), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# stats_dunn_posthoc — pairwise rank post-hoc after Kruskal-Wallis
# ---------------------------------------------------------------------------

_DUNN_ORACLE = f"""
WITH base AS (
  SELECT o_orderstatus AS s, o_orderpriority AS g, o_totalprice AS x FROM orders
),
rk AS (
  SELECT s, g,
         rank() OVER (PARTITION BY s ORDER BY x)
           + (count(*) OVER (PARTITION BY s, x) - 1) / 2.0 AS ar
  FROM base
),
pg AS (
  SELECT s, g, CAST(count(*) AS BIGINT) AS nj, sum(ar) AS rj
  FROM rk GROUP BY s, g
),
tie AS (
  SELECT s, CAST(sum(t * t * t - t) AS BIGINT) AS ts3
  FROM (SELECT s, x, CAST(count(*) AS BIGINT) AS t FROM base GROUP BY s, x)
  GROUP BY s
),
ps AS (
  SELECT s, CAST(count(*) AS BIGINT) AS k, CAST(sum(nj) AS BIGINT) AS n
  FROM pg GROUP BY s
),
pairs AS (
  SELECT a.s, a.g AS g1, b.g AS g2, a.nj AS n1, b.nj AS n2,
         a.rj / a.nj - b.rj / b.nj AS dmean, ps.n, ps.k, tie.ts3
  FROM pg a JOIN pg b ON b.s = a.s AND a.g < b.g
  JOIN ps ON ps.s = a.s
  JOIN tie ON tie.s = a.s
),
zs AS (
  SELECT s, g1, g2, n1, n2, k,
         dmean / sqrt((n * (n + 1.0) / 12.0 - ts3 / (12.0 * (n - 1.0)))
                      * (1.0 / n1 + 1.0 / n2)) AS zd
  FROM pairs
),
az AS (SELECT *, abs(zd) AS azd FROM zs)
SELECT s AS o_orderstatus, g1, g2, n1, n2, round(zd, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql('azd')} * (k * (k - 1) / 2)), 6)
         AS p_bonf
FROM az
"""


@register("stats_dunn_posthoc", _DUNN_ORACLE)
def stats_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's pairwise post-hoc (Dunn 1964) after stats_kruskal_wallis:
    for every priority pair inside each order status, the standardized
    mean-rank difference z with the pooled tie correction, and the
    Bonferroni-adjusted two-sided p (m = k(k-1)/2 comparisons per
    status) — the "WHICH groups differ" follow-up KW stops short of.
    Scale: identical substrate to KW — tie_avg_ranks' count grid (one
    full-parallelism hash agg + a window over the per-status value
    grid), then the pair table is a self-join of the <= |status|x|prio|
    summary grid (25 rows, broadcast), pure closed-form after. Rank
    sums are exact half-integers, tie terms integers, so z is
    deterministic cross-engine."""
    from kafka_etl_consumer_spark.operators.ranks import tie_avg_ranks, tie_term

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("s"),
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("x"),
    )
    rk = tie_avg_ranks(o, ["s"], "x", cohort_cols=["g"])
    pg = rk.groupBy("s", "g").agg(
        F.sum("cnt").cast("bigint").alias("nj"),
        F.sum(F.col("cnt") * F.col("avg_rank")).alias("rj"),
    )
    tie = tie_term(rk, ["s"], "x")
    ps = pg.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("n"),
    )
    a = pg.alias("a")
    b = pg.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("b.s") == F.col("a.s")) & (F.col("a.g") < F.col("b.g")),
        )
        .select(
            F.col("a.s").alias("s"),
            F.col("a.g").alias("g1"),
            F.col("b.g").alias("g2"),
            F.col("a.nj").alias("n1"),
            F.col("b.nj").alias("n2"),
            (F.col("a.rj") / F.col("a.nj") - F.col("b.rj") / F.col("b.nj")).alias(
                "dmean"
            ),
        )
        .join(F.broadcast(ps), "s")
        .join(F.broadcast(tie), "s")
    )
    zd = F.col("dmean") / F.sqrt(
        (
            F.col("n") * (F.col("n") + 1.0) / 12.0
            - F.col("ts3") / (12.0 * (F.col("n") - 1.0))
        )
        * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    m = F.col("k") * (F.col("k") - 1) / 2
    zs = pairs.select(
        F.col("s").alias("o_orderstatus"),
        "g1",
        "g2",
        "n1",
        "n2",
        zd.alias("zd"),
        m.alias("m"),
    )
    return zs.select(
        "o_orderstatus",
        "g1",
        "g2",
        "n1",
        "n2",
        F.round("zd", 6).alias("z_stat"),
        F.round(
            F.least(F.lit(1.0), 2 * _normal_sf(F.abs(F.col("zd"))) * F.col("m")),
            6,
        ).alias("p_bonf"),
    )


# ---------------------------------------------------------------------------
# ml_gbdt_stump_boost — 3 boosting rounds on the 32-bin histogram grid
# ---------------------------------------------------------------------------

_GBDT_LR = 0.5
_GBDT_ROUNDS = 3
_GBDT_BINS = 32


def _gbdt_oracle(rounds: int = _GBDT_ROUNDS) -> str:
    """Unrolled-CTE oracle: each boosting round is cum-sums over the
    32-row histogram, an ORDER BY ... LIMIT 1 best split, and a
    per-bin prediction update."""
    pre = f"""
WITH base AS (
  SELECT value AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
hist AS (
  SELECT least({_GBDT_BINS - 1},
               CAST(floor((x - lo) / (hi - lo) * {_GBDT_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
  FROM base, rng GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sy) AS BIGINT) AS pt
        FROM hist),
st0 AS (SELECT b, n, sy, CAST(pt AS DOUBLE) / nt AS f FROM hist, tot)"""
    parts = [pre]
    for i in range(1, rounds + 1):
        parts.append(f""",
cum{i} AS (
  SELECT b, n, sy, f,
         sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS nl,
         sum(sy - n * f) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS sl,
         sum(n) OVER () AS ntot,
         sum(sy - n * f) OVER () AS stot
  FROM st{i - 1}
),
best{i} AS (
  SELECT b AS bb, nl, sl, ntot, stot,
         sl * sl / nl + (stot - sl) * (stot - sl) / (ntot - nl) AS score,
         sl / nl AS vl, (stot - sl) / (ntot - nl) AS vr,
         lo + (b + 1) * (hi - lo) / {_GBDT_BINS} AS thr
  FROM cum{i}, rng
  WHERE nl > 0 AND ntot - nl > 0
  ORDER BY sl * sl / nl + (stot - sl) * (stot - sl) / (ntot - nl) DESC, b
  LIMIT 1
),
st{i} AS (
  SELECT c.b, c.n, c.sy,
         c.f + {_GBDT_LR} * CASE WHEN c.b <= t.bb THEN t.vl ELSE t.vr END AS f
  FROM cum{i} c CROSS JOIN best{i} t
),
out{i} AS (
  SELECT {i} AS boost_round, round(t.thr, 6) AS best_threshold,
         round(t.score - t.stot * t.stot / t.ntot, 6) AS gain,
         round((pt - 2 * sum(s.f * s.sy) + sum(s.n * s.f * s.f)) / nt, 6)
           AS train_mse
  FROM st{i} s CROSS JOIN best{i} t CROSS JOIN tot
  GROUP BY t.thr, t.score, t.stot, t.ntot, pt, nt
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM out{i}" for i in range(1, rounds + 1)
    )
    return (
        "".join(parts)
        + f"""
SELECT CAST(boost_round AS INT) AS boost_round, best_threshold, gain, train_mse
FROM ({union}) ORDER BY boost_round"""
    )


@register("ml_gbdt_stump_boost", _gbdt_oracle())
def ml_gbdt_stump_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient boosting with regression stumps (squared loss, learning
    rate 0.5, 3 rounds) predicting the purchase indicator from `value`
    — ml_decision_stump extended past one round, the actual GBDT inner
    loop. KEY scale identity: candidates live on a fixed 32-bin grid,
    so the model is piecewise-constant ON BINS and every residual sum
    the next round needs derives from the bin's (count, sum_y) and the
    CURRENT per-bin prediction — meaning the whole 3-round fit costs
    exactly ONE data-proportional histogram aggregate, then closed-form
    arithmetic + bounded windows on the 32-row grid per round (this is
    the XGBoost-hist/LightGBM reduction, unrolled). Split choice
    maximizes sum_l^2/n_l + sum_r^2/n_r (variance gain), deterministic
    tiebreak on the lower bin. Emits one row per round: threshold,
    gain, and post-update train MSE."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    hist = (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.lit(_GBDT_BINS - 1),
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _GBDT_BINS
                ),
            )
            .cast("bigint")
            .alias("b"),
            "y",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
        )
    )
    # The 32-row histogram is the ONLY data-proportional aggregate; every
    # boosting round references it (directly or through the previous
    # round's state) several times — best, state and mse each re-inline
    # their inputs, so the fully-lazy 3-round plan multiplied into 113k
    # optimized-plan chars whose optimize+codegen time dwarfed execution.
    # Lineage-truncate the histogram and each round's state/cum instead
    # (lazy localCheckpoint — one materialization per run, shared by every
    # reference; guide §3.3): same arithmetic, flat per-round plans.
    hist = hist.localCheckpoint(eager=False)
    tot = hist.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("sy").cast("bigint").alias("pt"),
    )
    state = hist.crossJoin(F.broadcast(tot)).select(
        "b",
        "n",
        "sy",
        (F.col("pt").cast("double") / F.col("nt")).alias("f"),
    )
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()  # 32-row grid: bounded by construction
    outs: list[DataFrame] = []
    for i in range(1, _GBDT_ROUNDS + 1):
        r = F.col("sy") - F.col("n") * F.col("f")
        cum = state.select(
            "b",
            "n",
            "sy",
            "f",
            F.sum("n").over(w_cum).alias("nl"),
            F.sum(r).over(w_cum).alias("sl"),
            F.sum("n").over(w_all).alias("ntot"),
            F.sum(r).over(w_all).alias("stot"),
        ).localCheckpoint(eager=False)  # consumed by best, state and mse
        score = F.col("sl") * F.col("sl") / F.col("nl") + (
            F.col("stot") - F.col("sl")
        ) * (F.col("stot") - F.col("sl")) / (F.col("ntot") - F.col("nl"))
        best = (
            cum.filter(
                (F.col("nl") > 0) & (F.col("ntot") - F.col("nl") > 0)
            )
            .crossJoin(F.broadcast(rng))
            .select(
                F.col("b").alias("bb"),
                score.alias("score"),
                (F.col("sl") / F.col("nl")).alias("vl"),
                (
                    (F.col("stot") - F.col("sl"))
                    / (F.col("ntot") - F.col("nl"))
                ).alias("vr"),
                (
                    F.col("lo")
                    + (F.col("b") + 1)
                    * (F.col("hi") - F.col("lo"))
                    / _GBDT_BINS
                ).alias("thr"),
                "stot",
                "ntot",
            )
            .orderBy(F.desc("score"), "bb")
            .limit(1)
        )
        state = cum.crossJoin(
            F.broadcast(best.select("bb", "vl", "vr"))
        ).select(
            "b",
            "n",
            "sy",
            (
                F.col("f")
                + _GBDT_LR
                * F.when(F.col("b") <= F.col("bb"), F.col("vl")).otherwise(
                    F.col("vr")
                )
            ).alias("f"),
        ).localCheckpoint(eager=False)  # next round's input + this round's mse
        mse = state.crossJoin(F.broadcast(tot)).agg(
            F.round(
                (
                    F.first("pt")
                    - 2 * F.sum(F.col("f") * F.col("sy"))
                    + F.sum(F.col("n") * F.col("f") * F.col("f"))
                )
                / F.first("nt"),
                6,
            ).alias("train_mse")
        )
        outs.append(
            best.crossJoin(F.broadcast(mse)).select(
                F.lit(i).cast("int").alias("boost_round"),
                F.round("thr", 6).alias("best_threshold"),
                F.round(
                    F.col("score")
                    - F.col("stot") * F.col("stot") / F.col("ntot"),
                    6,
                ).alias("gain"),
                "train_mse",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("boost_round")


# ---------------------------------------------------------------------------
# graph_random_walk_ppr — personalized PageRank from a 3-doc seed set
# ---------------------------------------------------------------------------

_PPR_ITERS = 5
_PPR_SEEDS = 3


def _ppr_oracle(iters: int = _PPR_ITERS) -> str:
    """Exact power-iteration oracle with seed teleport, one CTE per
    round (same unrolling as graph_pagerank's oracle)."""
    pre = f"""
WITH n AS (SELECT count(*) AS ni FROM documents),
v AS (SELECT doc_id AS id FROM documents),
e AS (SELECT DISTINCT src, dst FROM (
        SELECT doc_id AS src,
               unnest([(doc_id*7+1) % ni, (doc_id*13+2) % ni,
                       (doc_id*29+3) % ni]) AS dst
        FROM documents, n)),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),
sd AS (SELECT doc_id AS id, 1.0 / {_PPR_SEEDS} AS sm FROM documents
       WHERE doc_id < {_PPR_SEEDS}),
r0 AS (SELECT v.id, coalesce(sd.sm, 0) AS r FROM v LEFT JOIN sd USING (id))"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f""",
r{i} AS (SELECT v.id,
                0.15 * coalesce(sd.sm, 0) + 0.85 * coalesce(sum(t.c), 0) AS r
     FROM v LEFT JOIN sd ON sd.id = v.id
     LEFT JOIN (SELECT e.dst, r{i-1}.r / deg.outdeg AS c
                FROM e JOIN deg USING (src)
                JOIN r{i-1} ON r{i-1}.id = e.src) t ON t.dst = v.id
     GROUP BY v.id, sd.sm)""")
    return (
        pre
        + "".join(rounds)
        + f"\nSELECT id AS doc_id, round(r, 9) AS ppr FROM r{iters}"
    )


@register("graph_random_walk_ppr", _ppr_oracle())
def graph_random_walk_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart, Jeh & Widom
    2003) from a 3-document seed set over the SAME deterministic
    synthetic link graph graph_pagerank uses — the seed-relevance score
    behind seed-expansion retrieval and local community detection,
    completing the PageRank/HITS/PPR centrality ladder. r0 IS the seed
    vector and the teleport redeposits on the seeds only, so mass
    decays with restart-walk distance from the seed set; unreached
    vertices hold exactly 0.0. Scale: identical plan economics to
    graph_pagerank (per round one src-keyed edge⋈rank shuffle + one
    dst-keyed partial+final sum; seed vector is a broadcast left
    join), fully lazy, ranks pinned at 9dp in both engines."""
    from kafka_etl_consumer_spark.operators.graph import personalized_pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = F.broadcast(docs.agg(F.count("*").alias("__ni")))
    edges = (
        docs.crossJoin(n_row)
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (F.col("doc_id") * 7 + 1) % F.col("__ni"),
                    (F.col("doc_id") * 13 + 2) % F.col("__ni"),
                    (F.col("doc_id") * 29 + 3) % F.col("__ni"),
                )
            ).alias("dst"),
        )
        .distinct()
    )
    seeds = docs.filter(F.col("doc_id") < _PPR_SEEDS).select(
        "doc_id", F.lit(1.0 / _PPR_SEEDS).alias("sm")
    )
    ranks = personalized_pagerank(
        edges, docs, seeds, iterations=_PPR_ITERS, id_col="doc_id"
    )
    return ranks.select("doc_id", F.round("ppr", 9).alias("ppr"))


# ---------------------------------------------------------------------------
# text_rake_keywords — RAKE degree/frequency keyword extraction
# ---------------------------------------------------------------------------

# the stopword list lives with the shared substrate in operators/nlp.py
# (round 9); this alias keeps the oracle CTEs and pipeline43's import
# working unchanged.
_RAKE_STOP = KEYWORD_STOPWORDS
_RAKE_SW_SQL = ", ".join(f"'{s}'" for s in _RAKE_STOP)
_RAKE_TOPK = 15

_RAKE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_sql("text")}) AS t,
         unnest(range(1, len({tokens_sql("text")}) + 1)) AS i
  FROM documents
),
flag AS (
  SELECT doc_id, i, t,
         CASE WHEN t IN ({_RAKE_SW_SQL}) OR regexp_matches(t, '[^a-z]')
              THEN 1 ELSE 0 END AS is_delim
  FROM tok
),
pid AS (
  SELECT doc_id, i, t, is_delim,
         sum(is_delim) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS UNBOUNDED PRECEDING) AS p
  FROM flag
),
member AS (SELECT doc_id, p, i, t FROM pid WHERE is_delim = 0),
phrase AS (
  SELECT doc_id, p, string_agg(t, ' ' ORDER BY i) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM member GROUP BY doc_id, p
),
wstat AS (
  SELECT m.t, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(ph.plen) AS BIGINT) AS deg
  FROM member m JOIN phrase ph ON ph.doc_id = m.doc_id AND ph.p = m.p
  GROUP BY m.t
),
wscore AS (
  SELECT t, CAST(round(CAST(deg AS DOUBLE) / freq, 9) AS DECIMAL(28,12)) AS ws
  FROM wstat
),
pscore AS (
  SELECT ph.doc_id, ph.p, ph.phrase, ph.plen, sum(ws) AS ps
  FROM member m
  JOIN phrase ph ON ph.doc_id = m.doc_id AND ph.p = m.p
  JOIN wscore ON wscore.t = m.t
  GROUP BY ph.doc_id, ph.p, ph.phrase, ph.plen
),
agg AS (
  SELECT phrase, CAST(max(plen) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_occ,
         round(CAST(max(ps) AS DOUBLE), 6) AS score
  FROM pscore GROUP BY phrase
)
SELECT phrase, n_words, n_occ, score
FROM agg ORDER BY score DESC, phrase LIMIT {_RAKE_TOPK}
"""


@register("text_rake_keywords", _RAKE_ORACLE)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) at corpus level:
    candidate phrases are maximal token runs between delimiters (a
    22-word stopword list + any token containing a non-letter); each
    word scores degree/frequency over phrase co-occurrence (degree =
    sum of lengths of phrases containing it, self included); a phrase
    scores the sum of its members' word scores; top-15 phrases by
    score. Word scores are quantized to 9dp DECIMAL before the phrase
    sum so the sum is EXACT and order-independent — identical phrases
    score identically in both engines regardless of aggregation order.
    Scale: one posexplode + a per-document prefix window (bounded by
    document length), one (doc, phrase) hash-agg, one vocab-grain
    hash-agg for word stats, one token-keyed join to fold scores back;
    the final top-15 is TakeOrderedAndProject. No per-row Python
    anywhere."""
    docs = _t(spark, sf_dir, "documents")
    # shared extractor substrate (operators/nlp.py): positional grid +
    # delimiter flag, then maximal content runs as candidate phrases
    member = phrase_members(keyword_token_grid(docs))
    phrase = member.groupBy("doc_id", "p").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "t"))),
                lambda x: x["t"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("plen"),
    )
    wstat = (
        member.join(phrase, ["doc_id", "p"])
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    wscore = wstat.select(
        "t",
        F.round(F.col("deg").cast("double") / F.col("freq"), 9)
        .cast("decimal(28,12)")
        .alias("ws"),
    )
    pscore = (
        member.join(phrase, ["doc_id", "p"])
        .join(wscore, "t")
        .groupBy("doc_id", "p", "phrase", "plen")
        .agg(F.sum("ws").alias("ps"))
    )
    agg = pscore.groupBy("phrase").agg(
        F.max("plen").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.round(F.max("ps").cast("double"), 6).alias("score"),
    )
    return agg.orderBy(F.desc("score"), "phrase").limit(_RAKE_TOPK).select(
        "phrase", "n_words", "n_occ", "score"
    )


# ---------------------------------------------------------------------------
# eval_uplift_at_k_curve — AUUC + Qini coefficient over the decile curve
# ---------------------------------------------------------------------------

_UPLIFT_ORACLE = """
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
  SELECT decile,
         sum(n_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS ct,
         sum(n_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cc,
         sum(r_t) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS crt,
         sum(r_c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS crc
  FROM g
),
q AS (
  SELECT decile, ct, cc,
         CAST(round(crt - crc * (ct / CAST(cc AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS qini
  FROM cum
),
last AS (SELECT qini AS q10, ct AS ctt, cc AS cct FROM q WHERE decile = 10)
SELECT CAST(count(*) AS INT) AS n_deciles,
       CAST(max(ctt) AS BIGINT) AS n_treated,
       CAST(max(cct) AS BIGINT) AS n_control,
       round(CAST(sum(qini) AS DOUBLE) / 10.0, 6) AS auuc,
       round((CAST(sum(qini) AS DOUBLE) - 5.5 * CAST(max(q10) AS DOUBLE))
             / 10.0, 6) AS qini_coef
FROM q CROSS JOIN last
"""


@register("eval_uplift_at_k_curve", _UPLIFT_ORACLE)
def eval_uplift_at_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-number summary of eval_qini_uplift's gains table:
    AUUC (mean of the 10 cumulative-decile Qini values — the discrete
    area under the uplift curve) and the Qini coefficient (that area
    minus the random-targeting diagonal, whose discrete sum is
    5.5*qini_10 since sum(k)/10 = 5.5) — the numbers uplift-model
    comparisons actually rank on. Per-decile Qini values are rounded
    to 6dp and summed as DECIMAL in both engines, so the curve area is
    exact and aggregation-order-independent. Scale: identical substrate
    to eval_qini_uplift (one user-grain hash-agg + the sharded
    exact-ntile), then a 10-row grid collapse."""
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
        F.sum("n_t").over(wc).alias("ct"),
        F.sum("n_c").over(wc).alias("cc"),
        F.sum("r_t").over(wc).alias("crt"),
        F.sum("r_c").over(wc).alias("crc"),
    )
    q = cum.select(
        "decile",
        "ct",
        "cc",
        F.round(
            F.col("crt") - F.col("crc") * (F.col("ct") / F.col("cc").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("qini"),
    )
    last = q.filter(F.col("decile") == 10).select(
        F.col("qini").alias("q10"), F.col("ct").alias("ctt"),
        F.col("cc").alias("cct"),
    )
    return q.crossJoin(F.broadcast(last)).agg(
        F.count(F.lit(1)).cast("int").alias("n_deciles"),
        F.max("ctt").cast("bigint").alias("n_treated"),
        F.max("cct").cast("bigint").alias("n_control"),
        F.round(F.sum("qini").cast("double") / 10.0, 6).alias("auuc"),
        F.round(
            (F.sum("qini").cast("double") - 5.5 * F.max("q10").cast("double"))
            / 10.0,
            6,
        ).alias("qini_coef"),
    )


# ---------------------------------------------------------------------------
# stats_anderson_darling — binned A-D normality per event type
# ---------------------------------------------------------------------------

_AD_BINS = 64
_AD_EPS = 1e-12

# Phi(z) = 1 - normal_sf(z); both engines spell the IDENTICAL chain:
# sfv from the shared erfc polynomial, then clamp F and 1-F separately.
_AD_ORACLE = f"""
WITH base AS (SELECT event_type AS g, value AS x FROM events),
rng AS (SELECT g, min(x) AS lo, max(x) AS hi FROM base GROUP BY g),
binned AS (
  SELECT base.g,
         CAST(round(
           CASE WHEN hi = lo THEN lo
                ELSE lo + (least({_AD_BINS - 1},
                                 floor((x - lo) / (hi - lo) * {_AD_BINS}))
                           + 0.5) * (hi - lo) / {_AD_BINS} END,
           6) AS DECIMAL(12,6)) AS mq
  FROM base JOIN rng ON rng.g = base.g
),
cell AS (SELECT g, mq, CAST(count(*) AS BIGINT) AS t FROM binned GROUP BY g, mq),
mom AS (
  SELECT g, CAST(sum(t) AS BIGINT) AS n,
         sum(CAST(t AS DECIMAL(14,0)) * mq) AS sm,
         sum(CAST(t AS DECIMAL(14,0)) * CAST(round(mq * mq, 6) AS DECIMAL(20,6)))
           AS s2
  FROM cell GROUP BY g
),
ms AS (
  SELECT g, n, CAST(sm AS DOUBLE) / n AS mean,
         sqrt((CAST(s2 AS DOUBLE) - n * (CAST(sm AS DOUBLE) / n)
                                      * (CAST(sm AS DOUBLE) / n)) / (n - 1)) AS sd
  FROM mom
),
cum AS (
  SELECT cell.g, mq, t, n, mean, sd,
         sum(t) OVER (PARTITION BY cell.g ORDER BY mq
                      ROWS UNBOUNDED PRECEDING) AS cin
  FROM cell JOIN ms ON ms.g = cell.g
),
zc AS (
  SELECT g, t, n, cin, cin - t AS cprev,
         (CAST(mq AS DOUBLE) - mean) / sd AS z
  FROM cum
),
sf AS (
  SELECT g, t, n, cin, cprev, {_normal_sf_sql('z')} AS sfv FROM zc
),
term AS (
  SELECT g, n,
         CAST(round(
           CAST(cin * cin - cprev * cprev AS DOUBLE)
             * ln(greatest({_AD_EPS}, least(1 - {_AD_EPS}, 1 - sfv)))
           + CAST(2 * n * t - (cin * cin - cprev * cprev) AS DOUBLE)
             * ln(greatest({_AD_EPS}, least(1 - {_AD_EPS}, sfv))),
           6) AS DECIMAL(38,6)) AS tq
  FROM sf
),
a2 AS (
  SELECT g, n, -CAST(n AS DOUBLE) - CAST(sum(tq) AS DOUBLE) / n AS a2
  FROM term GROUP BY g, n
)
SELECT g AS event_type, n, round(a2, 6) AS a2,
       round(a2 * (1 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)), 6)
         AS a2_star
FROM a2
"""


@register("stats_anderson_darling", _AD_ORACLE)
def stats_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling normality statistic per event type on the
    64-bin value grid (the tail-weighted EDF test — far more sensitive
    than KS in the tails, where training-data value distributions
    misbehave), with Stephens' small-sample adjustment A*^2. Binned
    form: values quantize to 6dp-rounded bin midpoints (the repo's
    _binned convention), so the statistic is the A-D of the quantized
    distribution — cross-engine exact, bounded grid. The per-cell
    weights use the block identity sum(2i-1) = cin^2 - cprev^2 over
    exact integer cumulative counts; ln terms are computed on
    identically-spelled doubles and each cell's contribution is
    quantized to 6dp DECIMAL before the group sum, so the sum is
    aggregation-order independent. Scale: one broadcast range join,
    one hash-agg to <= 64 cells per group, one bounded-grid window —
    flat at any volume; tails are clamped at 1e-12 so ln never sees 0."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), F.col("value").alias("x")
    )
    rng = ev.groupBy("g").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    lo, hi = F.col("lo"), F.col("hi")
    b = F.least(
        F.lit(_AD_BINS - 1), F.floor((F.col("x") - lo) / (hi - lo) * _AD_BINS)
    )
    mid = F.when(hi == lo, lo).otherwise(
        lo + (b + 0.5) * (hi - lo) / _AD_BINS
    )
    binned = ev.join(F.broadcast(rng), "g").select(
        "g", F.round(mid, 6).cast("decimal(12,6)").alias("mq")
    )
    cell = binned.groupBy("g", "mq").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    mom = cell.groupBy("g").agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t").cast("decimal(14,0)") * F.col("mq")).alias("sm"),
        F.sum(
            F.col("t").cast("decimal(14,0)")
            * F.round(F.col("mq") * F.col("mq"), 6).cast("decimal(20,6)")
        ).alias("s2"),
    )
    mean = F.col("sm").cast("double") / F.col("n")
    ms = mom.select(
        "g",
        "n",
        mean.alias("mean"),
        F.sqrt(
            (F.col("s2").cast("double") - F.col("n") * mean * mean)
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("mq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.join(ms, "g").select(
        "g",
        "mq",
        "t",
        "n",
        "mean",
        "sd",
        F.sum("t").over(w).alias("cin"),
    )
    zc = cum.select(
        "g",
        "t",
        "n",
        "cin",
        (F.col("cin") - F.col("t")).alias("cprev"),
        ((F.col("mq").cast("double") - F.col("mean")) / F.col("sd")).alias("z"),
    )
    sfv = _normal_sf(F.col("z"))
    s1 = F.col("cin") * F.col("cin") - F.col("cprev") * F.col("cprev")
    fz = F.greatest(
        F.lit(_AD_EPS), F.least(F.lit(1 - _AD_EPS), 1 - F.col("sfv"))
    )
    gz = F.greatest(F.lit(_AD_EPS), F.least(F.lit(1 - _AD_EPS), F.col("sfv")))
    term = zc.withColumn("sfv", sfv).select(
        "g",
        "n",
        F.round(
            s1.cast("double") * F.log(fz)
            + (2 * F.col("n") * F.col("t") - s1).cast("double") * F.log(gz),
            6,
        )
        .cast("decimal(38,6)")
        .alias("tq"),
    )
    a2 = term.groupBy("g", "n").agg(
        (
            -F.col("n").cast("double") - F.sum("tq").cast("double") / F.col("n")
        ).alias("a2")
    )
    return a2.select(
        F.col("g").alias("event_type"),
        "n",
        F.round("a2", 6).alias("a2"),
        F.round(
            F.col("a2")
            * (
                1
                + 0.75 / F.col("n")
                + 2.25 / (F.col("n").cast("double") * F.col("n"))
            ),
            6,
        ).alias("a2_star"),
    )


# ---------------------------------------------------------------------------
# ts_pettitt_values — Pettitt changepoint on the daily MEAN VALUE series
# ---------------------------------------------------------------------------

_PETTITT_V_ORACLE = """
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


@register("ts_pettitt_values", _PETTITT_V_ORACLE)
def ts_pettitt_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint per event type on the daily MEAN VALUE
    series — the value-grain twin of ts_pettitt_changepoint (which
    tests the daily COUNT series): a level shift in what users spend
    is invisible to the count test and vice versa. Daily means round
    to 6dp in BOTH engines before ranking so midranks see identical
    tie structure; from there every intermediate (U_t from midranks)
    is an exact multiple of 0.5. Scale: one hash-agg to the day grain,
    rank/prefix windows over the bounded (type x day) grid only."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    wt = Window.partitionBy("event_type")
    rk = daily.select(
        "event_type",
        "d",
        (
            F.rank().over(wt.orderBy("m"))
            + (F.count(F.lit(1)).over(Window.partitionBy("event_type", "m")) - 1)
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
        F.min(
            F.struct((-F.col("abs_u")).alias("nu"), F.col("d"), F.col("n"))
        ).alias("m")
    )
    n = F.col("m.n").cast("double")
    k = -F.col("m.nu")
    return best.select(
        "event_type",
        F.date_format(F.col("m.d"), "yyyy-MM-dd").alias("change_day"),
        F.round(k, 1).alias("k_stat"),
        F.round(
            F.least(F.lit(1.0), 2 * F.exp(-6.0 * k * k / (n * n * n + n * n))),
            6,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# ts_cusum_oneside — sequential decision-interval CUSUM (streaming twin)
# ---------------------------------------------------------------------------

_CUSUM1_TARGET = 49.0
_CUSUM1_SLACK = 0.25
_CUSUM1_H = 3.0

_CUSUM1_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1
),
run AS (
  SELECT d,
         sum(m - {_CUSUM1_TARGET} - {_CUSUM1_SLACK})
           OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS u,
         row_number() OVER (ORDER BY d) AS t
  FROM daily
),
st AS (
  SELECT d, t,
         u - least(0, min(u) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)) AS s
  FROM run
)
SELECT CAST(max(t) AS BIGINT) AS n_days,
       round(max(s), 6) AS max_cusum,
       strftime(min(CASE WHEN s > {_CUSUM1_H} THEN d END),
                '%Y-%m-%d') AS alarm_day,
       CAST(max(s) > {_CUSUM1_H} AS INT) AS drift_detected
FROM st
"""


@register("ts_cusum_oneside", _CUSUM1_ORACLE)
def ts_cusum_oneside(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided (increase) CUSUM in Page's decision-interval form on
    the daily mean event value: S_t = max(0, S_{t-1} + (m_t - target -
    slack)), alarm when S_t > h — the SEQUENTIAL, fixed-reference
    changepoint detector (ts_cusum_changepoint's retrospective |CUSUM|
    peak needs the whole series' mean; this one is streamable, and IS
    the batch twin of streaming/drift.cusum_monitor, which
    tests/test_stream_drift.py holds to exact final-state parity). The
    max(0, .) recurrence reduces to prefix passes via S_t = U_t -
    min(0, min_j U_j). Scale: one day-grain hash-agg, two prefix
    windows over the bounded day grid; daily means round to 6dp in both
    engines before the prefix arithmetic."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date(F.date_trunc("day", "ts")).alias("d"), "value")
        .groupBy("d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    wp = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select(
        "d",
        F.sum(F.col("m") - _CUSUM1_TARGET - _CUSUM1_SLACK).over(wp).alias("u"),
        F.row_number().over(Window.orderBy("d")).alias("t"),
    )
    st = run.select(
        "d",
        "t",
        (F.col("u") - F.least(F.lit(0.0), F.min("u").over(wp))).alias("s"),
    )
    return st.agg(
        F.max("t").cast("bigint").alias("n_days"),
        F.round(F.max("s"), 6).alias("max_cusum"),
        F.date_format(
            F.min(F.when(F.col("s") > _CUSUM1_H, F.col("d"))), "yyyy-MM-dd"
        ).alias("alarm_day"),
        (F.max("s") > _CUSUM1_H).cast("int").alias("drift_detected"),
    )
