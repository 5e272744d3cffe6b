"""Query surface batch 47 (round 8, second wave): graph-ranked keyword
extraction and the repeated-measures rank test.

- text_textrank_keywords — TextRank (Mihalcea & Tarau 2004): PageRank
  over the word co-occurrence graph (adjacent content-token pairs),
  top-15 words. The graph-centrality complement to RAKE's
  degree/frequency scores (queries_pipeline42) — TextRank rewards
  words that bridge many contexts, RAKE rewards long-phrase
  membership.
- stats_friedman_test — Friedman's rank test for k related samples
  (Conover's tie-corrected form): do the event types differ in daily
  mean value when each DAY is its own block? The repeated-measures
  complement to stats_kruskal_wallis (which treats rows as
  independent, not blocked).
- stats_page_trend — Page's L test for an ORDERED alternative in the
  same complete-block design (Friedman answers "differ at all",
  Page answers "increase along this order").
- ts_mann_kendall — the Mann-Kendall monotone-trend test per event
  type on the daily mean series (tie-corrected variance, continuity
  correction) — the significance test beside ts_theilsen_trend's
  slope estimate.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql
from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
    _normal_sf,
    _normal_sf_sql,
)
from kafka_etl_consumer_spark.plans.queries_pipeline42 import (
    _RAKE_STOP,
    _RAKE_SW_SQL,
)
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# text_textrank_keywords — PageRank over the word co-occurrence graph
# ---------------------------------------------------------------------------

_TR_ITERS = 5
_TR_TOPK = 15
_TR_DAMP = 0.85


def _textrank_oracle(iters: int = _TR_ITERS) -> str:
    """Unrolled power-iteration oracle over the adjacency graph of
    content tokens (same stopword/non-alpha delimiter rule as RAKE)."""
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
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM vx),
deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS outdeg FROM sym GROUP BY u),
r0 AS (SELECT w, 1.0 / nd AS r FROM vx, n)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f""",
r{i} AS (SELECT vx.w,
                {1 - _TR_DAMP} / n.nd + {_TR_DAMP} * coalesce(sum(t.c), 0) AS r
     FROM vx CROSS JOIN n
     LEFT JOIN (SELECT sym.v, r{i - 1}.r / deg.outdeg AS c
                FROM sym JOIN deg USING (u)
                JOIN r{i - 1} ON r{i - 1}.w = sym.u) t ON t.v = vx.w
     GROUP BY vx.w, n.nd)"""
        )
    return (
        pre
        + "".join(rounds)
        + f"""
SELECT w AS word, round(r, 9) AS rank
FROM r{iters} ORDER BY round(r, 9) DESC, w LIMIT {_TR_TOPK}"""
    )


@register("text_textrank_keywords", _textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords: damped PageRank (5 rounds) over the
    co-occurrence graph whose vertices are content words (RAKE's
    stopword + non-alpha rule) and whose edges link tokens ADJACENT in
    the original stream (a delimiter between two content words breaks
    adjacency — exactly the phrase boundary RAKE splits on). Top-15
    words by rank, 9dp-rounded tiebreak on the word. Scale: adjacency
    pairs come from ONE lag window per document (bounded by document
    length) — no token self-join; the graph is vocabulary-grain
    (sublinear in corpus size), and each PageRank round is the standard
    one src-keyed join + one dst-keyed partial+final sum from
    operators/graph.pagerank; the cut is TakeOrderedAndProject."""
    from kafka_etl_consumer_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("i", "t")
    )
    kept = ~F.col("t").isin(_RAKE_STOP) & ~F.col("t").rlike("[^a-z]")
    w = Window.partitionBy("doc_id").orderBy("i")
    adj = tok.select(
        "t",
        kept.alias("k"),
        F.lag("t").over(w).alias("pt"),
        F.lag(kept.cast("boolean")).over(w).alias("pk"),
    ).filter(F.col("k") & F.col("pk") & (F.col("t") != F.col("pt")))
    e0 = adj.select(
        F.least("t", "pt").alias("u"), F.greatest("t", "pt").alias("v")
    ).distinct()
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    vx = sym.select(F.col("u").alias("word")).distinct()
    ranks = pagerank(
        sym, vx, iterations=_TR_ITERS, damping=_TR_DAMP,
        id_col="word", src="u", dst="v",
    )
    r9 = F.round("rank", 9)
    return (
        ranks.orderBy(r9.desc(), "word")
        .limit(_TR_TOPK)
        .select("word", r9.alias("rank"))
    )


# ---------------------------------------------------------------------------
# stats_friedman_test — k related samples, day blocks, tie-corrected
# ---------------------------------------------------------------------------

_FRIEDMAN_ORACLE = f"""
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
a2 AS (SELECT sum(r * r) AS a FROM rk),
q AS (
  SELECT n, k,
         (k - 1) * sum((rsum - n * (k + 1) / 2.0)
                       * (rsum - n * (k + 1) / 2.0))
           / (a - n * k * (k + 1.0) * (k + 1.0) / 4.0) AS qs
  FROM rj CROSS JOIN dims CROSS JOIN a2
  GROUP BY n, k, a
),
wh AS (
  SELECT n, k, qs, k - 1 AS df,
         (pow(qs / (k - 1.0), 1.0 / 3) - (1 - 2.0 / (9 * (k - 1.0))))
           / sqrt(2.0 / (9 * (k - 1.0))) AS z
  FROM q
)
SELECT n AS n_blocks, CAST(k AS INT) AS k_treatments,
       round(qs, 6) AS q_stat, CAST(df AS INT) AS df,
       round({_normal_sf_sql('z')}, 6) AS p_value
FROM wh
"""


@register("stats_friedman_test", _FRIEDMAN_ORACLE)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's rank test (tie-corrected, Conover's form) that the
    event types differ in daily mean value when each DAY is a block:
    within every complete day the k types get midranks of their
    6dp-rounded daily means; Q = (k-1) * sum_j (R_j - n(k+1)/2)^2 /
    (A - nk(k+1)^2/4) with A the sum of squared midranks — the
    repeated-measures complement to Kruskal-Wallis (which ignores the
    day blocking). Days missing a type are dropped (complete-block
    design). p via the shared Wilson-Hilferty chi-square approximation
    at k-1 df. Scale: one hash-agg to the (day, type) grid, then every
    window and sum runs on that bounded grid — midranks are exact
    halves, A is an exact multiple of 0.25, so Q is deterministic
    cross-engine."""
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
    rj = rk.groupBy("g").agg(F.sum("r").alias("rsum"))
    a2 = rk.agg(F.sum(F.col("r") * F.col("r")).alias("a"))
    q = (
        rj.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(a2))
        .groupBy("n", "k", "a")
        .agg(
            (
                (F.first("k") - 1)
                * F.sum(
                    (F.col("rsum") - F.col("n") * (F.col("k") + 1) / 2.0)
                    * (F.col("rsum") - F.col("n") * (F.col("k") + 1) / 2.0)
                )
            ).alias("num")
        )
        .select(
            "n",
            "k",
            (
                F.col("num")
                / (
                    F.col("a")
                    - F.col("n") * F.col("k") * (F.col("k") + 1.0)
                    * (F.col("k") + 1.0) / 4.0
                )
            ).alias("qs"),
        )
    )
    dfree = (F.col("k") - 1).cast("double")
    z = (
        F.pow(F.col("qs") / dfree, F.lit(1.0 / 3)) - (1 - 2.0 / (9 * dfree))
    ) / F.sqrt(2.0 / (9 * dfree))
    return q.select(
        F.col("n").alias("n_blocks"),
        F.col("k").cast("int").alias("k_treatments"),
        F.round("qs", 6).alias("q_stat"),
        (F.col("k") - 1).cast("int").alias("df"),
        F.round(_normal_sf(z), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# stats_page_trend — Page's L test for an ORDERED alternative in the
# same complete-block rank design as stats_friedman_test
# ---------------------------------------------------------------------------

_PAGE_ORACLE = f"""
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
ord_g AS (
  SELECT g, CAST(row_number() OVER (ORDER BY g) AS DOUBLE) AS w
  FROM (SELECT DISTINCT g FROM rk)
),
dims AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n,
                CAST(count(DISTINCT g) AS BIGINT) AS k
         FROM rk),
l AS (
  SELECT sum(w * rsum) AS lstat, n, k
  FROM (SELECT rk.g, sum(r) AS rsum FROM rk GROUP BY rk.g) rj
  JOIN ord_g ON ord_g.g = rj.g CROSS JOIN dims
  GROUP BY n, k
),
z AS (
  SELECT n, k, lstat,
         (12 * lstat - 3 * n * k * (k + 1.0) * (k + 1.0))
           / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1)
                  * (k * k - 1.0) * (k + 1)) AS zl
  FROM l
)
SELECT n AS n_blocks, CAST(k AS INT) AS k_treatments,
       round(lstat, 1) AS l_stat, round(zl, 6) AS z_stat,
       round({_normal_sf_sql('zl')}, 6) AS p_value
FROM z
"""


@register("stats_page_trend", _PAGE_ORACLE)
def stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ORDERED alternative (Page 1963): in the same
    complete-day-block rank design as stats_friedman_test, weight each
    treatment's rank sum by its hypothesized order position (here the
    alphabetical event-type order — the deterministic stand-in for a
    dose/level ordering) and test L = sum_j w_j R_j against its null
    normal approximation z = (12L - 3nk(k+1)^2) / sqrt(n k^2 (k+1)
    (k^2-1)(k+1)). Friedman asks "do they differ AT ALL"; Page asks
    "do they INCREASE along this order" — far more powerful when the
    alternative is monotone. Scale: identical substrate (one (day,
    type)-grid hash-agg + bounded-grid midrank windows); L is an exact
    multiple of 0.5."""
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
    ord_g = (
        rk.select("g")
        .distinct()
        .select(
            "g",
            F.row_number().over(Window.orderBy("g")).cast("double").alias("w"),
        )
    )
    dims = rk.agg(
        F.countDistinct("d").cast("bigint").alias("n"),
        F.countDistinct("g").cast("bigint").alias("k"),
    )
    rj = rk.groupBy("g").agg(F.sum("r").alias("rsum"))
    l = (
        rj.join(F.broadcast(ord_g), "g")
        .crossJoin(F.broadcast(dims))
        .groupBy("n", "k")
        .agg(F.sum(F.col("w") * F.col("rsum")).alias("lstat"))
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    zl = (12 * F.col("lstat") - 3 * n * k * (k + 1) * (k + 1)) / F.sqrt(
        n * k * k * (k + 1) * (k * k - 1) * (k + 1)
    )
    return l.select(
        F.col("n").alias("n_blocks"),
        F.col("k").cast("int").alias("k_treatments"),
        F.round("lstat", 1).alias("l_stat"),
        F.round(zl, 6).alias("z_stat"),
        F.round(_normal_sf(zl), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# ts_mann_kendall — monotone-trend test on the daily mean series
# ---------------------------------------------------------------------------

_MK_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.m > a.m THEN 1
                       WHEN b.m < a.m THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.d > a.d
  GROUP BY a.event_type
),
nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
tie AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
  FROM (SELECT event_type, m, CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, m)
  GROUP BY event_type
),
v AS (
  SELECT p.event_type, s, n,
         (n * (n - 1.0) * (2 * n + 5) - tt) / 18.0 AS var_s
  FROM pairs p JOIN nn USING (event_type) JOIN tie USING (event_type)
),
z AS (
  SELECT event_type, s, n, var_s,
         CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
              WHEN s < 0 THEN (s + 1) / sqrt(var_s)
              ELSE 0.0 END AS zmk
  FROM v
),
az AS (SELECT *, abs(zmk) AS azmk FROM z)
SELECT event_type, n AS n_days, s AS s_stat, round(zmk, 6) AS z_stat,
       round(least(1.0, 2 * {_normal_sf_sql('azmk')}), 6) AS p_value,
       CASE WHEN s > 0 THEN 'increasing' WHEN s < 0 THEN 'decreasing'
            ELSE 'none' END AS trend
FROM az
"""


@register("ts_mann_kendall", _MK_ORACLE)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type on the daily mean
    value series: S = sum over day pairs of sgn(m_j - m_i), tie-corrected
    variance n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18, continuity-corrected
    z, two-sided p — the distribution-free "is there ANY monotone trend"
    test that complements ts_theilsen_trend's slope estimate (same
    sgn-pair foundation; Kendall 1975). Scale: one hash-agg to the day
    grain; the pair sum is an equi-join on event_type over the BOUNDED
    per-type day grid (30 days = 435 pairs per type — never a cartesian
    over events); S and the tie term are exact integers."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d"),
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.round(F.avg("value"), 6).alias("m"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.m") > F.col("a.m"), 1)
                .when(F.col("b.m") < F.col("a.m"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tie = (
        daily.groupBy("event_type", "m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tt")
        )
    )
    v = pairs.join(nn, "event_type").join(tie, "event_type").select(
        "event_type",
        "s",
        "n",
        (
            (
                F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5)
                - F.col("tt")
            )
            / 18.0
        ).alias("var_s"),
    )
    zmk = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    z = v.select("event_type", "s", "n", zmk.alias("zmk"))
    return z.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round("zmk", 6).alias("z_stat"),
        F.round(
            F.least(F.lit(1.0), 2 * _normal_sf(F.abs(F.col("zmk")))), 6
        ).alias("p_value"),
        F.when(F.col("s") > 0, "increasing")
        .when(F.col("s") < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )
