"""Query surface batch 58 (round 10, fifth wave): spectral entropy,
the Markov stationary distribution, and partial autocorrelation.

- ts_spectral_entropy — normalized Shannon entropy of the periodogram
  (reusing ts_fisher_g's Fourier grid): ~1 for white noise, small when
  one frequency dominates — the continuous complement to Fisher's g
  single-peak test.
- seq_markov_stationary — stationary distribution of the per-user
  event-transition Markov chain by 8 unrolled power-iteration rounds
  over the row-normalized matrix event_transition_matrix reports.
- ts_pacf_durbin — partial autocorrelation at lags 1..4 via the
  Durbin-Levinson recursion on the hourly-count ACF (the AR-order
  diagnostic; ts_acf_lags gives the raw correlations, this removes
  the shorter-lag pass-through).

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# ts_spectral_entropy — periodogram entropy on the Fisher grid
# ---------------------------------------------------------------------------

_SE_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         round(avg(value), 6) AS m
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         count(*) OVER (PARTITION BY event_type) AS n,
         avg(m) OVER (PARTITION BY event_type) AS mbar
  FROM daily
),
jj AS (
  SELECT event_type, t, n, m - mbar AS x,
         unnest(range(1, CAST(floor((n - 1) / 2.0) AS BIGINT) + 1)) AS j
  FROM seq
),
per AS (
  SELECT event_type, j, CAST(max(n) AS BIGINT) AS n,
         round(pow(sum(x * cos(2 * {math.pi!r} * j * t / n)), 2)
               + pow(sum(x * sin(2 * {math.pi!r} * j * t / n)), 2), 6) AS i
  FROM jj GROUP BY event_type, j
),
tot AS (
  SELECT event_type, max(n) AS n, CAST(count(*) AS BIGINT) AS m,
         sum(i) AS si
  FROM per GROUP BY event_type
),
ent AS (
  SELECT per.event_type, tot.n, tot.m,
         -sum(CASE WHEN i > 0 THEN (i / si) * ln(i / si) ELSE 0 END) AS h
  FROM per JOIN tot USING (event_type) GROUP BY per.event_type, tot.n, tot.m
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(m AS INT) AS n_freqs,
       round(h, 6) AS entropy,
       round(h / ln(CAST(m AS DOUBLE)), 6) AS spectral_entropy
FROM ent
"""


@register("ts_spectral_entropy", _SE_ORACLE)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of the demeaned daily-mean series
    per event type: H = -sum p_j ln p_j over the normalized periodogram
    p_j = I_j / sum I (the SAME Fourier grid and 6dp ordinate rounding
    as ts_fisher_g, so the two diagnostics share one spectral
    substrate), reported raw and divided by ln(m) so 1.0 means a flat
    white-noise spectrum and values near 0 mean one frequency carries
    all the variance. Fisher's g asks "is the single largest peak
    significant"; spectral entropy measures how CONCENTRATED the whole
    spectrum is — the standard signal-complexity feature in forecasting
    pipelines (e.g. the tsfeatures set). Zero-power ordinates
    contribute 0 (the x ln x limit), spelled identically in both
    engines. Scale: the daily reduction is the only data-proportional
    stage; the (t, j) grid is calendar-bounded (n * n/2 rows per key)
    and collapses in one hash-agg."""
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
    wt = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        F.row_number().over(wt.orderBy("d")).alias("t"),
        F.count(F.lit(1)).over(wt).alias("n"),
        (F.col("m") - F.avg("m").over(wt)).alias("x"),
    )
    jj = seq.select(
        "event_type",
        "t",
        "n",
        "x",
        F.explode(
            F.sequence(F.lit(1), F.floor((F.col("n") - 1) / 2.0).cast("int"))
        ).alias("j"),
    )
    ang = 2 * math.pi * F.col("j") * F.col("t") / F.col("n")
    per = jj.groupBy("event_type", "j").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(
            F.pow(F.sum(F.col("x") * F.cos(ang)), 2)
            + F.pow(F.sum(F.col("x") * F.sin(ang)), 2),
            6,
        ).alias("i"),
    )
    tot = per.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("i").alias("si"),
    )
    p = F.col("i") / F.col("si")
    ent = (
        per.select("event_type", "i")  # tot carries n (join would collide)
        .join(tot, "event_type")
        .groupBy("event_type", "n", "m")
        .agg(
            (-F.sum(F.when(F.col("i") > 0, p * F.log(p)).otherwise(0.0))).alias(
                "h"
            )
        )
    )
    return ent.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("m").cast("int").alias("n_freqs"),
        F.round("h", 6).alias("entropy"),
        F.round(F.col("h") / F.log(F.col("m").cast("double")), 6).alias(
            "spectral_entropy"
        ),
    )


# ---------------------------------------------------------------------------
# seq_markov_stationary — unrolled power iteration on the transition matrix
# ---------------------------------------------------------------------------

_MS_ROUNDS = 8


def _markov_oracle(rounds: int = _MS_ROUNDS) -> str:
    """Unrolled pi' = pi P rounds; the transition probabilities quantize
    to 6dp and every iterate to 12dp (both engines), so the chain of
    doubles is bitwise identical cross-engine."""
    pre = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY event_id) AS next_type
  FROM events
),
cnt AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
p AS (
  SELECT c.event_type AS src, c.next_type AS dst,
         round(c.n / CAST(t.row_n AS DOUBLE), 6) AS p
  FROM cnt c JOIN (SELECT event_type, sum(n) AS row_n
                   FROM cnt GROUP BY event_type) t USING (event_type)
),
states AS (SELECT DISTINCT src AS s FROM p),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM states),
pi0 AS (SELECT s, round(1.0 / k, 12) AS pi FROM states, ns)"""
    parts = [pre]
    for i in range(1, rounds + 1):
        parts.append(f""",
pi{i} AS (
  SELECT st.s, round(coalesce(sum(pr.pi * pr.p), 0), 12) AS pi
  FROM states st
  LEFT JOIN (SELECT p.dst, pi{i - 1}.pi, p.p
             FROM p JOIN pi{i - 1} ON pi{i - 1}.s = p.src) pr
    ON pr.dst = st.s
  GROUP BY st.s
)""")
    parts.append(f"""
SELECT s AS event_type, round(pi, 6) AS stationary_p,
       {rounds} AS n_rounds
FROM pi{rounds}""")
    return "".join(parts)


@register("seq_markov_stationary", _markov_oracle())
def seq_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-transition Markov
    chain (the long-run fraction of time a user's behavior spends in
    each event type): 8 power-iteration rounds pi' = pi P from the
    uniform start, over the SAME row-normalized matrix
    event_transition_matrix reports. The chain on this fixture is
    irreducible and aperiodic (every type follows every type), so the
    iteration converges geometrically; 8 rounds take the uniform start
    well past 6dp stationarity. Iterates quantize to 12dp per round
    and the matrix to 6dp (the PageRank/IRLS discipline), so the float
    chain cannot drift cross-engine. Scale: one data-grain lead window
    builds the transitions; everything after is k x k grid arithmetic
    (k = #event types) — the state is DRIVER-SMALL BY CONSTRUCTION, so
    the iteration runs as ONE applyInPandas task over the grid
    (optimization r11, guide §8/VERDICT r10 item 6: the previous 8
    unrolled join/agg rounds were ~32 micro-stages of pure per-stage
    scheduling latency on ≤ k² rows — measured 1.9-4.8 s at sf0.1 for
    arithmetic on a 5x5 matrix). Rounding inside the task mirrors
    Spark's HALF_UP-on-shortest-decimal F.round exactly (Decimal(repr),
    the same contract BigDecimal.valueOf uses), so the emitted doubles
    are bit-identical to the unrolled plan's."""
    import pandas as pd
    from pyspark.sql import types as T

    ev = _t(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("event_id"))
        .alias("next_type"),
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cnt.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    p = cnt.join(tot, "event_type").select(
        F.col("event_type").alias("src"),
        F.col("next_type").alias("dst"),
        F.round(F.col("n") / F.col("row_n").cast("double"), 6).alias("p"),
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("stationary_p", T.DoubleType()),
            T.StructField("n_rounds", T.IntegerType()),
        ]
    )

    def solve(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        from decimal import ROUND_HALF_UP, Decimal

        def r(x: float, d: int) -> float:
            # exact mirror of Spark's round(double, d): HALF_UP over the
            # shortest decimal repr (BigDecimal.valueOf == repr())
            return float(
                Decimal(repr(float(x))).quantize(
                    Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
                )
            )

        states = sorted(pdf["src"].unique())
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        m = np.zeros((k, k))
        for src, dst, pv in zip(pdf["src"], pdf["dst"], pdf["p"]):
            j = idx.get(dst)
            if j is not None:  # dst never observed as a src: no pi mass
                m[idx[src], j] = pv
        pi = np.full(k, r(1.0 / k, 12))
        for _ in range(_MS_ROUNDS):
            pi = np.array([r(v, 12) for v in pi @ m])
        return pd.DataFrame(
            {
                "event_type": states,
                "stationary_p": [r(v, 6) for v in pi],
                "n_rounds": np.full(k, _MS_ROUNDS, dtype="int32"),
            }
        )

    return p.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: solve(pdf), schema
    )


# ---------------------------------------------------------------------------
# ts_pacf_durbin — partial autocorrelation via Durbin-Levinson, lags 1..4
# ---------------------------------------------------------------------------

_PACF_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, c,
         lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
         lag(c, 3) OVER w AS c3, lag(c, 4) OVER w AS c4
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
),
acf AS (
  SELECT event_type,
         round(corr(c, c1), 6) AS r1, round(corr(c, c2), 6) AS r2,
         round(corr(c, c3), 6) AS r3, round(corr(c, c4), 6) AS r4
  FROM lagged GROUP BY event_type
),
dl AS (
  SELECT event_type, r1, r2, r3, r4,
         r1 AS f11,
         (r2 - r1 * r1) / (1 - r1 * r1) AS f22
  FROM acf
),
dl2 AS (
  SELECT *, f11 - f22 * f11 AS f21 FROM dl
),
dl3 AS (
  SELECT *,
         (r3 - f21 * r2 - f22 * r1) / (1 - f21 * r1 - f22 * r2) AS f33
  FROM dl2
),
dl4 AS (
  SELECT *, f21 - f33 * f22 AS f31, f22 - f33 * f21 AS f32 FROM dl3
),
dl5 AS (
  SELECT *,
         (r4 - f31 * r3 - f32 * r2 - f33 * r1)
           / (1 - f31 * r1 - f32 * r2 - f33 * r3) AS f44
  FROM dl4
)
SELECT event_type, CAST(lag AS INT) AS lag, round(f, 6) AS pacf
FROM dl5 UNPIVOT (f FOR lag IN (f11 AS '1', f22 AS '2',
                                f33 AS '3', f44 AS '4'))
"""


@register("ts_pacf_durbin", _PACF_ORACLE)
def ts_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the hourly event-count series at lags
    1..4 by the Durbin-Levinson recursion (Durbin 1960): phi_kk is the
    correlation between x_t and x_{t-k} AFTER regressing out the
    intervening lags — the AR(p) order diagnostic (an AR(p) series has
    phi_kk = 0 for k > p, while its raw ACF decays geometrically and
    never tells you p). Inputs are the SAME lag correlations
    ts_acf_lags reports, rounded to 6dp BEFORE the recursion so both
    engines iterate identical doubles; the recursion itself is the
    standard unrolled scalar algebra (phi22 through phi44 with the
    intermediate phi_kj updates), identically spelled in both engines.
    Scale: one hash-agg to the hourly grain, one window pass, one
    grouped corr — the recursion is per-key scalar arithmetic on a
    4-value row."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "c",
        *[F.lag("c", i).over(w).alias(f"c{i}") for i in range(1, 5)],
    )
    acf = lagged.groupBy("event_type").agg(
        *[
            F.round(F.corr("c", f"c{i}"), 6).alias(f"r{i}")
            for i in range(1, 5)
        ]
    )
    r1, r2, r3, r4 = [F.col(f"r{i}") for i in range(1, 5)]
    f11 = r1
    f22 = (r2 - r1 * r1) / (1 - r1 * r1)
    dl = acf.select("event_type", "r1", "r2", "r3", "r4",
                    f11.alias("f11"), f22.alias("f22"))
    dl2 = dl.withColumn("f21", F.col("f11") - F.col("f22") * F.col("f11"))
    dl3 = dl2.withColumn(
        "f33",
        (r3 - F.col("f21") * r2 - F.col("f22") * r1)
        / (1 - F.col("f21") * r1 - F.col("f22") * r2),
    )
    dl4 = dl3.withColumn(
        "f31", F.col("f21") - F.col("f33") * F.col("f22")
    ).withColumn("f32", F.col("f22") - F.col("f33") * F.col("f21"))
    dl5 = dl4.withColumn(
        "f44",
        (r4 - F.col("f31") * r3 - F.col("f32") * r2 - F.col("f33") * r1)
        / (1 - F.col("f31") * r1 - F.col("f32") * r2 - F.col("f33") * r3),
    )
    stacked = dl5.select(
        "event_type",
        F.expr(
            "stack(4, '1', f11, '2', f22, '3', f33, '4', f44) AS (lag, f)"
        ),
    )
    return stacked.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.round("f", 6).alias("pacf"),
    ).filter(F.col("pacf").isNotNull() & ~F.isnan("pacf"))
