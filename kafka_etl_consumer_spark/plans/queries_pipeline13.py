"""Query surface batch 18 (round 4): row-pattern matching, distributional
testing, and multimodal fingerprint dedup.

- MATCH_RECOGNIZE-lite V-shape detection on the daily event series:
  maximal down/up runs via run-length encoding, adjacent (down, up) run
  pairs with lengths/depth/recovery — the quantifier filter (DOWN{2,}
  UP{2,}) becomes a trivial predicate on the output
- two-sample Kolmogorov-Smirnov test between the even/odd user cohorts'
  value distributions (exact D from tie-aware ECDFs + the asymptotic
  p-value) — the distribution-level complement to the mean-level t /
  permutation tests
- perceptual-hash (aHash) duplicate classes over the decoded image
  column: REAL Arrow-batched decode -> 60-bit threshold fingerprint ->
  one hash-agg to dup classes — content-based multimodal dedup, the
  image-side sibling of text exact-dedup

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data operator families
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# win_pattern_vshape — run-length encode the daily series' move directions,
# then report every maximal DOWN-run immediately followed by an UP-run:
# bottom day, run lengths, drawdown depth, recovery height.
# ---------------------------------------------------------------------------

_VSHAPE_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
mv AS (SELECT d, y,
              lag(y) OVER (ORDER BY d) AS yp,
              CAST(sign(y - lag(y) OVER (ORDER BY d)) AS INT) AS dir
       FROM daily),
chg AS (SELECT *, CASE WHEN dir IS DISTINCT FROM
                            lag(dir) OVER (ORDER BY d)
                       THEN 1 ELSE 0 END AS c
        FROM mv WHERE dir IS NOT NULL),
rid AS (SELECT *, sum(c) OVER (ORDER BY d) AS run_id FROM chg),
runs AS (SELECT run_id, any_value(dir) AS dir,
                CAST(count(*) AS BIGINT) AS n_moves,
                min(d) AS start_d, max(d) AS end_d,
                arg_min(yp, d) AS y_before, arg_max(y, d) AS y_end
         FROM rid GROUP BY run_id),
pairs AS (SELECT *,
                 lag(dir) OVER (ORDER BY start_d) AS pdir,
                 lag(n_moves) OVER (ORDER BY start_d) AS pn,
                 lag(end_d) OVER (ORDER BY start_d) AS pend,
                 lag(y_before) OVER (ORDER BY start_d) AS pyb,
                 lag(y_end) OVER (ORDER BY start_d) AS pye
          FROM runs)
SELECT strftime(pend, '%Y-%m-%d') AS bottom_day,
       CAST(pn AS BIGINT) AS down_len, n_moves AS up_len,
       CAST(pyb - pye AS BIGINT) AS depth,
       CAST(y_end - pye AS BIGINT) AS recovery
FROM pairs WHERE pdir = -1 AND dir = 1
"""


@register("win_pattern_vshape", _VSHAPE_ORACLE)
def win_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every maximal down-run/up-run adjacency in the daily event counts
    (the MATCH_RECOGNIZE 'V' pattern; filter down_len/up_len >= k for the
    {k,} quantifier). Scale: the raw scan collapses to the DAY grain
    first; direction, run ids, run aggregates, and the adjacent-run lag
    all run over the bounded day series — pattern matching never touches
    row-grain data."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"))
        .groupBy(F.col("d").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    wd = Window.orderBy("d")
    mv = daily.select(
        "d",
        "y",
        F.lag("y").over(wd).alias("yp"),
        F.signum(F.col("y") - F.lag("y").over(wd)).cast("int").alias("dir"),
    ).filter(F.col("dir").isNotNull())
    chg = mv.select(
        "*",
        F.when(
            ~F.col("dir").eqNullSafe(F.lag("dir").over(wd)), 1
        ).otherwise(0).alias("c"),
    )
    rid = chg.select("*", F.sum("c").over(wd).alias("run_id"))
    runs = rid.groupBy("run_id").agg(
        F.first("dir").alias("dir"),
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.min("d").alias("start_d"),
        F.max("d").alias("end_d"),
        F.min_by("yp", "d").alias("y_before"),
        F.max_by("y", "d").alias("y_end"),
    )
    wr = Window.orderBy("start_d")
    pairs = runs.select(
        "*",
        F.lag("dir").over(wr).alias("pdir"),
        F.lag("n_moves").over(wr).alias("pn"),
        F.lag("end_d").over(wr).alias("pend"),
        F.lag("y_before").over(wr).alias("pyb"),
        F.lag("y_end").over(wr).alias("pye"),
    )
    return pairs.filter((F.col("pdir") == -1) & (F.col("dir") == 1)).select(
        F.date_format("pend", "yyyy-MM-dd").alias("bottom_day"),
        F.col("pn").cast("bigint").alias("down_len"),
        F.col("n_moves").alias("up_len"),
        (F.col("pyb") - F.col("pye")).cast("bigint").alias("depth"),
        (F.col("y_end") - F.col("pye")).cast("bigint").alias("recovery"),
    )


# ---------------------------------------------------------------------------
# stats_ks_test — two-sample KS: D = max |ECDF0 - ECDF1| with tie-aware
# step functions (RANGE window frames include peers identically in both
# engines), plus the asymptotic two-sided p-value 2 exp(-2 lambda^2).
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH base AS (SELECT value AS x, user_id % 2 AS g FROM events),
tot AS (SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1
        FROM base),
cum AS (SELECT x,
               sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
                 OVER (ORDER BY x RANGE UNBOUNDED PRECEDING) AS c0,
               sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                 OVER (ORDER BY x RANGE UNBOUNDED PRECEDING) AS c1
        FROM base),
d AS (SELECT round(max(abs(c0 / n0 - c1 / n1)), 6) AS d_stat
      FROM cum CROSS JOIN tot)
SELECT CAST(tot.n0 AS BIGINT) AS n0, CAST(tot.n1 AS BIGINT) AS n1,
       d.d_stat,
       round(least(1.0, 2 * exp(-2 * pow(d.d_stat
             * sqrt(tot.n0 * tot.n1 / (tot.n0 + tot.n1)), 2))), 6)
         AS p_asymptotic
FROM d CROSS JOIN tot
"""


@register("stats_ks_test", _KS_ORACLE)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test of event value, even vs odd user cohorts.
    Scale: the ECDFs are step functions that change only at DISTINCT
    values, and D is attained at a step — so the statistic computes
    exactly from per-value cohort counts (one full-parallelism hash
    agg) with the cumulative window running over the distinct-value
    grid, never a per-row global sort (same count-grid substrate as
    operators/ranks.py). At 100 TB with near-unique values, quantize x
    to a fixed grid first (the stats_mannwhitney_u_binned pattern) — D
    error <= bin width."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(F.col("value").alias("x"), (F.col("user_id") % 2).alias("g"))
    cell = base.groupBy("x").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("a0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("a1"),
    )
    tot = cell.agg(
        F.sum("a0").cast("double").alias("n0"),
        F.sum("a1").cast("double").alias("n1"),
    )
    # one row per distinct value, so ROWS == RANGE here and the peers
    # the row-level RANGE frame absorbed are already inside each cell
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = cell.select(
        F.sum("a0").over(wc).alias("c0"),
        F.sum("a1").over(wc).alias("c1"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(F.abs(F.col("c0") / F.col("n0") - F.col("c1") / F.col("n1"))),
                6,
            ).alias("d_stat")
        )
    )
    lam = F.col("d_stat") * F.sqrt(
        F.col("n0") * F.col("n1") / (F.col("n0") + F.col("n1"))
    )
    return d.crossJoin(F.broadcast(tot)).select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        "d_stat",
        F.round(
            F.least(F.lit(1.0), 2 * F.exp(-2 * F.pow(lam, 2))), 6
        ).alias("p_asymptotic"),
    )


# ---------------------------------------------------------------------------
# multimodal_phash_dedup — duplicate-image classes by 60-bit average-hash:
# the same deterministic 16x9 PPM fixtures as multimodal_pixels decode
# through the REAL parser in an Arrow batch; the aHash thresholds each
# pixel's grey against the image mean (both rounded to 6dp in BOTH
# engines before comparing, so bit patterns are cross-engine exact); one
# hash-agg groups identical fingerprints.
# ---------------------------------------------------------------------------

_PHASH_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
g AS (SELECT doc_id, j,
             (((doc_id*7 + 3*j) % 256) + ((doc_id*7 + 3*j + 1) % 256)
              + ((doc_id*7 + 3*j + 2) % 256)) / 3.0 AS grey
      FROM d, (SELECT unnest(range(0, 144)) AS j)),
m AS (SELECT doc_id, round(avg(grey), 6) AS mg FROM g GROUP BY doc_id),
h AS (SELECT g.doc_id,
             -- 1::BIGINT << j, NOT 2 ** j: DuckDB ** returns DOUBLE,
             -- which loses low bits above 2^53 and corrupts the hash
             CAST(sum(CASE WHEN round(g.grey, 6) > m.mg AND g.j < 60
                      THEN CAST(1 AS BIGINT) << CAST(g.j AS INT)
                      ELSE 0 END) AS BIGINT) AS phash
      FROM g JOIN m USING (doc_id) GROUP BY g.doc_id)
SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM h GROUP BY phash HAVING count(*) > 1
"""


@register("multimodal_phash_dedup", _PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image duplicate classes by 60-bit aHash (classes of 2+ docs, with
    canonical min/max ids). Scale: decode + hash is ONE narrow Arrow
    mapInPandas pass emitting 8 bytes per image; the class rollup is one
    hash-agg on the fingerprint. Pairwise near-dup (hamming <= t) plugs
    in as simhash-style band joins on hash slices — same shape as
    dedup_simhash; exact classes need no pair stage at all."""
    import numpy as np

    from kafka_etl_consumer_spark.operators import multimodal as M
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    W, H = 16, 9
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def gen_and_hash(batches):
        weights = 1 << np.arange(60, dtype=np.int64)
        for pdf in batches:
            ids, hashes = [], []
            for i in pdf["doc_id"]:
                flat = (int(i) * 7 + np.arange(W * H * 3)) % 256
                media = M.encode_ppm(flat, W, H)
                w, h, c, arr = M._parse_image(bytes(media))
                grey = arr.reshape(-1, 3).astype(np.float64).mean(axis=1)
                mg = round(float(grey.mean()), 6)
                bits = np.round(grey[:60], 6) > mg
                ids.append(int(i))
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = ensure_min_parallelism(docs).mapInPandas(gen_and_hash, out_schema)
    return (
        h.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )
