"""Query surface batch 49 (round 9, second wave): grid GLM, seeded
keyword ranking, long-memory estimation, and three statistics gaps.

- ml_logistic_irls_grid — 1-D logistic regression (intercept + slope on
  the binned event value) by 3 Newton/IRLS steps computed entirely on
  the 32-bin histogram grid — the GLM member of the ML-on-grids family
  (stump finds a split, GBDT boosts it, isotonic calibrates, this fits
  the parametric curve).
- text_positionrank_keywords — PositionRank (Florescu & Caragea 2017):
  personalized PageRank over the TextRank co-occurrence graph with the
  teleport concentrated on early-position words. Third extractor on the
  shared operators/nlp.py substrate.
- ts_hurst_rs — Hurst exponent by rescaled-range (R/S) analysis over
  the daily mean series per event type: long-memory beside
  ts_acf_lags' short-range correlation.
- stats_mood_median — Mood's median test (k-sample location on a
  shared global median; the cruder, outlier-immune cousin of
  Kruskal-Wallis).
- stats_kendall_w — Kendall's coefficient of concordance W with tie
  correction: the EFFECT SIZE companion to stats_friedman_test on the
  same complete-block rank design.
- agg_approx_quantiles — percentile_approx at {0.25, 0.5, 0.75} checked
  against its rank-error THEOREM (|rank(approx) - p*n| <= n/accuracy),
  the quantile sibling of agg_approx_distinct's 5-sigma bounds oracle.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ml_logistic_irls_grid — 3 Newton steps on the 32-bin histogram
# ---------------------------------------------------------------------------

_GLM_BINS = 32
_GLM_ITERS = 3


def _glm_oracle(iters: int = _GLM_ITERS) -> str:
    """Unrolled-CTE oracle: each Newton step is five sums over the
    32-row histogram and a closed-form 2x2 solve; betas are quantized
    to 10dp after every step (both engines), so the per-bin doubles
    feeding the next step are bitwise identical cross-engine."""
    pre = f"""
WITH base AS (
  SELECT value AS x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
rng AS (SELECT min(x) AS lo, max(x) AS hi FROM base),
hist AS (
  SELECT least({_GLM_BINS - 1},
               CAST(floor((x - lo) / (hi - lo) * {_GLM_BINS}) AS BIGINT)) AS b,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
  FROM base, rng GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt, CAST(sum(sy) AS DOUBLE) AS st
        FROM hist),
it0 AS (SELECT round(ln(st / (nt - st)), 10) AS b0, CAST(0 AS DOUBLE) AS b1
        FROM tot)"""
    parts = [pre]
    for i in range(1, iters + 1):
        parts.append(f""",
s{i} AS (
  SELECT b0, b1,
         sum(sy - n * mu)            AS g0,
         sum((sy - n * mu) * x)      AS g1,
         sum(n * mu * (1 - mu))      AS h00,
         sum(n * mu * (1 - mu) * x)  AS h01,
         sum(n * mu * (1 - mu) * x * x) AS h11
  FROM (SELECT h.b, h.n, h.sy, CAST(h.b AS DOUBLE) AS x,
               1.0 / (1.0 + exp(-(b0 + b1 * h.b))) AS mu, b0, b1
        FROM hist h CROSS JOIN it{i - 1})
  GROUP BY b0, b1
),
it{i} AS (
  SELECT round(b0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01), 10)
           AS b0,
         round(b1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01), 10)
           AS b1
  FROM s{i}
)""")
    parts.append(f"""
SELECT round(b0, 6) AS beta0, round(b1, 6) AS beta1,
       CAST(nt AS BIGINT) AS n_events,
       round(ll, 4) AS log_lik
FROM it{iters} CROSS JOIN tot CROSS JOIN (
  SELECT sum(sy * (b0 + b1 * b) - n * ln(1 + exp(b0 + b1 * b))) AS ll
  FROM hist CROSS JOIN it{iters}
)""")
    return "".join(parts)


@register("ml_logistic_irls_grid", _glm_oracle())
def ml_logistic_irls_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D logistic regression P(purchase | value bin) ~ sigmoid(b0 +
    b1*bin) fitted by 3 Newton-Raphson (IRLS) steps. KEY scale identity
    (the ml_gbdt_stump_boost pattern): sufficient statistics for every
    step are five sums over the (count, sum_y) histogram — the corpus
    is scanned ONCE into <=32 rows and each iteration is grid
    arithmetic + a closed-form 2x2 solve, so the fit costs one
    data-proportional aggregate regardless of volume or iteration
    count. Betas quantize to 10dp after every step in BOTH engines, so
    iterated float drift cannot diverge cross-engine. Start: intercept
    at the logit of the base rate, slope 0."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("x"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    rng = base.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    hist = (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.lit(_GLM_BINS - 1),
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _GLM_BINS
                ),
            ).alias("b"),
            "y",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
        )
        .cache()
    )
    tot = hist.agg(
        F.sum("n").cast("double").alias("nt"), F.sum("sy").cast("double").alias("st")
    )
    beta = tot.select(
        F.round(F.log(F.col("st") / (F.col("nt") - F.col("st"))), 10).alias("b0"),
        F.lit(0.0).alias("b1"),
    )
    for _ in range(_GLM_ITERS):
        x = F.col("b").cast("double")
        mu = 1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("b"))))
        w = F.col("n") * mu * (1 - mu)
        s = (
            hist.crossJoin(F.broadcast(beta))
            .groupBy("b0", "b1")
            .agg(
                F.sum(F.col("sy") - F.col("n") * mu).alias("g0"),
                F.sum((F.col("sy") - F.col("n") * mu) * x).alias("g1"),
                F.sum(w).alias("h00"),
                F.sum(w * x).alias("h01"),
                F.sum(w * x * x).alias("h11"),
            )
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        beta = s.select(
            F.round(
                F.col("b0")
                + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det,
                10,
            ).alias("b0"),
            F.round(
                F.col("b1")
                + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det,
                10,
            ).alias("b1"),
        )
    ll = (
        hist.crossJoin(F.broadcast(beta))
        .agg(
            F.sum(
                F.col("sy") * (F.col("b0") + F.col("b1") * F.col("b"))
                - F.col("n") * F.log(1 + F.exp(F.col("b0") + F.col("b1") * F.col("b")))
            ).alias("ll")
        )
    )
    return (
        beta.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ll))
        .select(
            F.round("b0", 6).alias("beta0"),
            F.round("b1", 6).alias("beta1"),
            F.col("nt").cast("bigint").alias("n_events"),
            F.round("ll", 4).alias("log_lik"),
        )
    )


# ---------------------------------------------------------------------------
# text_positionrank_keywords — position-personalized TextRank
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_DAMP = 0.85
_PR_TOPK = 15


def _positionrank_oracle(iters: int = _PR_ITERS) -> str:
    """Unrolled power iteration with the teleport vector proportional
    to the sum of inverse token positions (quantized to 12dp before
    iterating — both engines — so the iterated doubles agree)."""
    from kafka_etl_consumer_spark.functions.text import tokens_sql
    from kafka_etl_consumer_spark.plans.queries_pipeline42 import _RAKE_SW_SQL

    pre = f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_sql("text")}) AS t,
         unnest(range(1, len({tokens_sql("text")}) + 1)) AS i
  FROM documents
),
kept AS (
  SELECT doc_id, i, t FROM tok
  WHERE t NOT IN ({_RAKE_SW_SQL}) AND NOT regexp_matches(t, '[^a-z]')
),
e0 AS (
  SELECT DISTINCT least(a.t, b.t) AS u, greatest(a.t, b.t) AS v
  FROM kept a JOIN kept b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  WHERE a.t <> b.t
),
sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
vx AS (SELECT DISTINCT u AS w FROM sym),
tele AS (
  SELECT vx.w, round(sum(1.0 / kept.i), 12) AS s
  FROM vx JOIN kept ON kept.t = vx.w GROUP BY vx.w
),
deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS outdeg FROM sym GROUP BY u),
r0 AS (SELECT w, s, s AS r FROM tele)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f""",
r{i} AS (SELECT t0.w, t0.s,
                {1 - _PR_DAMP} * t0.s
                  + {_PR_DAMP} * coalesce(sum(t.c), 0) AS r
     FROM tele t0
     LEFT JOIN (SELECT sym.v, r{i - 1}.r / deg.outdeg AS c
                FROM sym JOIN deg USING (u)
                JOIN r{i - 1} ON r{i - 1}.w = sym.u) t ON t.v = t0.w
     GROUP BY t0.w, t0.s)"""
        )
    return (
        pre
        + "".join(rounds)
        + f"""
SELECT w AS word, round(r, 9) AS rank
FROM r{iters} ORDER BY round(r, 9) DESC, w LIMIT {_PR_TOPK}"""
    )


@register("text_positionrank_keywords", _positionrank_oracle())
def text_positionrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PositionRank (Florescu & Caragea 2017): TextRank's co-occurrence
    graph, but the PageRank teleport is PERSONALIZED to early-position
    words — each vertex's restart mass is sum(1/position) over its
    occurrences, so title-ish/lead-sentence words pull rank toward
    themselves. The third extractor on the shared substrate
    (operators/nlp.py grid + adjacency; operators/graph
    personalized_pagerank for the iteration): RAKE scores phrase
    membership, TextRank global centrality, PositionRank
    position-biased centrality. The teleport stays UNNORMALIZED
    (PageRank is linear in the teleport, so ranking is unaffected) and
    quantizes to 12dp before iterating; ranks round to 9dp for the
    deterministic top-15 cut. Scale: one grid pass + vocabulary-grain
    teleport agg; per round the same src-keyed join + dst-keyed sum as
    every PageRank here; TakeOrderedAndProject cuts the output."""
    from kafka_etl_consumer_spark.operators.graph import personalized_pagerank
    from kafka_etl_consumer_spark.operators.nlp import (
        adjacent_content_pairs,
        keyword_token_grid,
    )

    docs = _t(spark, sf_dir, "documents")
    grid = keyword_token_grid(docs)
    e0 = adjacent_content_pairs(grid)
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    vx = sym.select(F.col("u").alias("word")).distinct()
    kept = grid.filter(F.col("is_delim") == 0)
    # 1-based positions (the grid's posexplode index is 0-based)
    tele = (
        vx.join(kept.select(F.col("t").alias("word"), "i"), "word")
        .groupBy("word")
        .agg(F.round(F.sum(1.0 / (F.col("i") + 1)), 12).alias("sm"))
    )
    ranks = personalized_pagerank(
        sym, vx, tele, iterations=_PR_ITERS, damping=_PR_DAMP,
        id_col="word", src="u", dst="v",
    )
    r9 = F.round("ppr", 9)
    return (
        ranks.orderBy(r9.desc(), "word")
        .limit(_PR_TOPK)
        .select("word", r9.alias("rank"))
    )


# ---------------------------------------------------------------------------
# ts_hurst_rs — rescaled-range (R/S) Hurst exponent per event type
# ---------------------------------------------------------------------------

_HURST_SIZES = (5, 10, 15, 30)

_HURST_ORACLE = f"""
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
blocks AS (
  SELECT event_type, s.s, CAST(floor((t - 1) / s.s) AS BIGINT) AS blk, t, m
  FROM seq CROSS JOIN (SELECT unnest([{", ".join(str(s) for s in _HURST_SIZES)}]) AS s) s
),
full_blocks AS (
  SELECT event_type, s, blk FROM blocks
  GROUP BY event_type, s, blk HAVING count(*) = s
),
b2 AS (
  SELECT blocks.*,
         avg(m) OVER (PARTITION BY blocks.event_type, blocks.s, blocks.blk)
           AS mb
  FROM blocks JOIN full_blocks USING (event_type, s, blk)
),
c AS (
  SELECT event_type, s, blk, m, mb,
         sum(m - mb) OVER (PARTITION BY event_type, s, blk ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS cd
  FROM b2
),
rs AS (
  SELECT event_type, s, blk,
         (max(cd) - min(cd))
           / nullif(sqrt(sum((m - mb) * (m - mb)) / s), 0) AS rs
  FROM c GROUP BY event_type, s, blk
),
mrs AS (
  SELECT event_type, s, avg(rs) AS mrs FROM rs
  WHERE rs IS NOT NULL AND rs > 0 GROUP BY event_type, s
),
pts AS (SELECT event_type, ln(CAST(s AS DOUBLE)) AS lx, ln(mrs) AS ly
        FROM mrs)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sizes,
       round((sum(lx * ly) - sum(lx) * sum(ly) / count(*))
             / (sum(lx * lx) - sum(lx) * sum(lx) / count(*)), 6) AS hurst
FROM pts GROUP BY event_type
"""


@register("ts_hurst_rs", _HURST_ORACLE)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classical rescaled-range analysis (Hurst 1951,
    Mandelbrot & Wallis 1969): split each event type's daily mean
    series into blocks of size s in {5,10,15,30}; per block compute
    R/S = (range of cumulative mean deviations) / (population std);
    H is the log-log slope of avg(R/S) against s. H ~ 0.5 means a
    memoryless series, H > 0.5 long-range persistence — the long-memory
    diagnostic beside ts_acf_lags' fixed-lag view. Scale: the series is
    CALENDAR-grain (days), so every window below is bounded; the only
    data-proportional stage is the daily hash-agg. The slope is a
    closed-form least squares over <=4 (ln s, ln RS) points — no
    iteration, no driver collect."""
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
    seq = daily.select(
        "event_type",
        "m",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
    )
    sizes = spark.range(len(_HURST_SIZES)).select(
        F.element_at(
            F.array(*[F.lit(s) for s in _HURST_SIZES]), (F.col("id") + 1).cast("int")
        ).alias("s")
    )
    blocks = seq.crossJoin(F.broadcast(sizes)).select(
        "event_type",
        "s",
        F.floor((F.col("t") - 1) / F.col("s")).alias("blk"),
        "t",
        "m",
    )
    wb = Window.partitionBy("event_type", "s", "blk")
    full = (
        blocks.groupBy("event_type", "s", "blk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == F.col("s"))
        .select("event_type", "s", "blk")
    )
    b2 = blocks.join(full, ["event_type", "s", "blk"]).select(
        "event_type", "s", "blk", "t", "m", F.avg("m").over(wb).alias("mb")
    )
    c = b2.select(
        "event_type",
        "s",
        "blk",
        "m",
        "mb",
        F.sum(F.col("m") - F.col("mb"))
        .over(wb.orderBy("t").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cd"),
    )
    rs = c.groupBy("event_type", "s", "blk").agg(
        (
            (F.max("cd") - F.min("cd"))
            / F.nullif(
                F.sqrt(
                    F.sum((F.col("m") - F.col("mb")) * (F.col("m") - F.col("mb")))
                    / F.col("s")
                ),
                F.lit(0.0),
            )
        ).alias("rs")
    )
    mrs = (
        rs.filter(F.col("rs").isNotNull() & (F.col("rs") > 0))
        .groupBy("event_type", "s")
        .agg(F.avg("rs").alias("mrs"))
    )
    pts = mrs.select(
        "event_type",
        F.log(F.col("s").cast("double")).alias("lx"),
        F.log("mrs").alias("ly"),
    )
    cnt = F.count(F.lit(1))
    return pts.groupBy("event_type").agg(
        cnt.cast("bigint").alias("n_sizes"),
        F.round(
            (F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly") / cnt)
            / (F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx") / cnt),
            6,
        ).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# stats_mood_median — k-sample median test on the shared global median
# ---------------------------------------------------------------------------

_MOOD_ORACLE = f"""
WITH grid AS (
  SELECT value AS v, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1
),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc
  FROM grid
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
med AS (
  SELECT min(v) AS med FROM cum, nn
  WHERE cc >= CAST(ceil(n / 2.0) AS BIGINT)
),
cell AS (
  SELECT event_type,
         CAST(sum(CASE WHEN value > med THEN 1 ELSE 0 END) AS BIGINT) AS ab,
         CAST(sum(CASE WHEN value < med THEN 1 ELSE 0 END) AS BIGINT) AS be
  FROM events, med GROUP BY event_type
),
tot AS (SELECT CAST(sum(ab) AS DOUBLE) AS ta, CAST(sum(be) AS DOUBLE) AS tb,
               CAST(count(*) AS BIGINT) AS k
        FROM cell),
q AS (
  SELECT k,
         sum(
           (ab - (ab + be) * ta / (ta + tb)) * (ab - (ab + be) * ta / (ta + tb))
             / ((ab + be) * ta / (ta + tb))
           + (be - (ab + be) * tb / (ta + tb)) * (be - (ab + be) * tb / (ta + tb))
             / ((ab + be) * tb / (ta + tb))
         ) AS chi2
  FROM cell CROSS JOIN tot GROUP BY k
),
z AS (
  SELECT k, chi2, CAST(k - 1 AS DOUBLE) AS dfree,
         (pow(chi2 / (k - 1), 1.0 / 3)
          - (1 - 2.0 / (9 * (k - 1)))) / sqrt(2.0 / (9 * (k - 1))) AS zq
  FROM q
)
SELECT CAST(k AS INT) AS k_groups, round(chi2, 6) AS chi2,
       CAST(dfree AS INT) AS df,
       round({_normal_sf_sql('zq')}, 6) AS p_value
FROM z
"""


@register("stats_mood_median", _MOOD_ORACLE)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: do the k event types share one median? Count
    each group's values strictly above/below the GLOBAL median (ties
    at the median excluded — the classic convention) and chi-square the
    k x 2 table against margins-proportional expecteds, df = k-1
    (Wilson-Hilferty normal transform for the p-value, the
    stats_cochran_q pattern). Cruder but far more outlier-immune than
    Kruskal-Wallis — only the side of the median matters. Scale: the
    exact global median comes from the distinct-value count grid + one
    bounded cumulative window (the stats_ks_test substrate), never a
    full sort; the table is one hash-agg; everything after is k-row
    arithmetic."""
    from kafka_etl_consumer_spark.operators.shard import sharded_prefix_sums

    ev = _t(spark, sf_dir, "events")
    grid = ev.groupBy(F.col("value").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # the distinct-value grid is data grain — the cumulative count runs
    # SHARDED (local prefix + broadcast shard offsets), not on a single
    # partition (the window-guard contract)
    cum = sharded_prefix_sums(grid, ["v"], {"c": "cc"}).select("v", "cc")
    nn = grid.agg(F.sum("c").cast("bigint").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(nn))
        .filter(F.col("cc") >= F.ceil(F.col("n") / 2.0).cast("bigint"))
        .agg(F.min("v").alias("med"))
    )
    cell = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") > F.col("med")).cast("int"))
            .cast("bigint")
            .alias("ab"),
            F.sum((F.col("value") < F.col("med")).cast("int"))
            .cast("bigint")
            .alias("be"),
        )
    )
    tot = cell.agg(
        F.sum("ab").cast("double").alias("ta"),
        F.sum("be").cast("double").alias("tb"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ea = (F.col("ab") + F.col("be")) * F.col("ta") / (F.col("ta") + F.col("tb"))
    eb = (F.col("ab") + F.col("be")) * F.col("tb") / (F.col("ta") + F.col("tb"))
    q = (
        cell.crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.sum(
                (F.col("ab") - ea) * (F.col("ab") - ea) / ea
                + (F.col("be") - eb) * (F.col("be") - eb) / eb
            ).alias("chi2")
        )
    )
    dfree = (F.col("k") - 1).cast("double")
    zq = (
        F.pow(F.col("chi2") / dfree, F.lit(1.0 / 3)) - (1 - 2.0 / (9 * dfree))
    ) / F.sqrt(2.0 / (9 * dfree))
    return q.select(
        F.col("k").cast("int").alias("k_groups"),
        F.round("chi2", 6).alias("chi2"),
        dfree.cast("int").alias("df"),
        F.round(_normal_sf(zq), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# stats_kendall_w — concordance effect size on the Friedman block design
# ---------------------------------------------------------------------------

_KW_ORACLE = f"""
WITH cellt AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         event_type AS g, round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
full_blocks AS (
  SELECT d FROM cellt GROUP BY d
  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM events)
),
b AS (SELECT cellt.* FROM cellt JOIN full_blocks USING (d)),
rk AS (
  SELECT d, g,
         rank() OVER (PARTITION BY d ORDER BY m)
           + (count(*) OVER (PARTITION BY d, m) - 1) / 2.0 AS r
  FROM b
),
dims AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n,
                CAST(count(DISTINCT g) AS BIGINT) AS k
         FROM rk),
rj AS (SELECT g, sum(r) AS rsum FROM rk GROUP BY g),
s2 AS (SELECT sum(rsum * rsum) AS srj FROM rj),
ties AS (
  SELECT coalesce(sum(t * t * t - t), 0) AS tt
  FROM (SELECT d, m, CAST(count(*) AS BIGINT) AS t FROM b GROUP BY d, m)
),
w AS (
  SELECT n, k, srj, tt,
         (12 * srj - 3 * n * n * k * (k + 1.0) * (k + 1.0))
           / (CAST(n AS DOUBLE) * n * k * (k * k - 1.0) - n * tt) AS kw
  FROM dims CROSS JOIN s2 CROSS JOIN ties
)
SELECT n AS n_blocks, CAST(k AS INT) AS k_treatments,
       round(kw, 6) AS kendall_w,
       round(n * (k - 1) * kw, 6) AS chi2,
       CAST(k - 1 AS INT) AS df
FROM w
"""


@register("stats_kendall_w", _KW_ORACLE)
def stats_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W (tie-corrected): HOW MUCH
    do the day blocks agree on the ordering of the event types, on the
    same complete-block midrank design as stats_friedman_test — the
    effect size (0 = no agreement, 1 = identical rankings) where
    Friedman only answers significant-or-not; chi2 = n(k-1)W is the
    Friedman statistic itself, reported for cross-checking. Scale:
    identical substrate (one (day, type)-grid hash-agg + bounded-grid
    midrank windows); W is closed-form on k rank sums."""
    ev = _t(spark, sf_dir, "events")
    cellt = (
        ev.select(
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            F.col("event_type").alias("g"),
            "value",
        )
        .groupBy("d", "g")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    k_row = ev.agg(F.countDistinct("event_type").alias("kk"))
    full = (
        cellt.groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(k_row))
        .filter(F.col("c") == F.col("kk"))
        .select("d")
    )
    b = cellt.join(full, "d")
    rk = b.select(
        "d",
        "g",
        (
            F.rank().over(Window.partitionBy("d").orderBy("m"))
            + (F.count(F.lit(1)).over(Window.partitionBy("d", "m")) - 1) / 2.0
        ).alias("r"),
    )
    dims = rk.agg(
        F.countDistinct("d").cast("bigint").alias("n"),
        F.countDistinct("g").cast("bigint").alias("k"),
    )
    srj = (
        rk.groupBy("g")
        .agg(F.sum("r").alias("rsum"))
        .agg(F.sum(F.col("rsum") * F.col("rsum")).alias("srj"))
    )
    ties = (
        b.groupBy("d", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0)
            ).alias("tt")
        )
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    kw = (12 * F.col("srj") - 3 * n * n * k * (k + 1) * (k + 1)) / (
        n * n * k * (k * k - 1) - n * F.col("tt")
    )
    return (
        dims.crossJoin(F.broadcast(srj))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_blocks"),
            F.col("k").cast("int").alias("k_treatments"),
            F.round(kw, 6).alias("kendall_w"),
            F.round(n * (k - 1) * kw, 6).alias("chi2"),
            (F.col("k") - 1).cast("int").alias("df"),
        )
    )


# ---------------------------------------------------------------------------
# agg_approx_quantiles — percentile_approx vs its rank-error theorem
# ---------------------------------------------------------------------------

_AQ_PS = (0.25, 0.5, 0.75)
_AQ_ACC = 1000

_AQ_ORACLE = f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
SELECT p, n, 1 AS within_bounds
FROM nn CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _AQ_PS)}]) AS p)
"""


@register("agg_approx_quantiles", _AQ_ORACLE)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) at p in {{.25,.5,.75}}
    over the event value, verified against the algorithm's own THEOREM
    instead of a value hash (the agg_approx_distinct pattern — approx
    answers differ run-to-run and engine-to-engine, their GUARANTEE
    does not): with accuracy a, the returned value's exact rank must
    lie within n/a of p*n. within_bounds is computed in-plan from the
    sketch output joined back against the exact rank (one conditional
    count per p over a single scan); the oracle asserts the literal 1.
    Scale: the sketch is a single-pass mergeable aggregate (no sort, no
    shuffle beyond the final merge); the verification scan is one
    conditional-sum pass — drop it in production and keep only the
    sketch."""
    ev = _t(spark, sf_dir, "events")
    apq = ev.agg(
        F.percentile_approx(
            "value", F.array(*[F.lit(p) for p in _AQ_PS]), F.lit(_AQ_ACC)
        ).alias("qs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    checked = ev.crossJoin(F.broadcast(apq)).agg(
        F.first("n").alias("n"),
        *[
            agg
            for i in range(len(_AQ_PS))
            for agg in (
                F.sum(
                    (F.col("value") < F.element_at(F.col("qs"), i + 1)).cast("long")
                ).alias(f"rank_lo_{i}"),
                F.sum(
                    (F.col("value") <= F.element_at(F.col("qs"), i + 1)).cast("long")
                ).alias(f"rank_hi_{i}"),
            )
        ],
    )
    # a tied value occupies the rank INTERVAL [rank_lo+1, rank_hi]; the
    # sketch answer is correct iff that interval intersects the theorem
    # band [p*n - tol, p*n + tol] — testing rank_hi alone false-flags a
    # correct answer whose duplicate mass exceeds n/accuracy (ADVICE r9)
    tol = F.col("n").cast("double") / _AQ_ACC + 1
    rows = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                (
                    (F.col(f"rank_lo_{i}") + 1 <= F.lit(p) * F.col("n") + tol)
                    & (F.col(f"rank_hi_{i}") >= F.lit(p) * F.col("n") - tol)
                )
                .cast("int")
                .alias("within_bounds"),
            )
            for i, p in enumerate(_AQ_PS)
        ]
    )
    return (
        checked.select("n", F.explode(rows).alias("r"))
        .select(F.col("r.p").alias("p"), "n", F.col("r.within_bounds").alias("within_bounds"))
    )
