"""Query surface batch 15 (round 4): the production ANN stack end-to-end,
distributed BPE merge learning, resampling inference, and corpus law fitting.

- IVF-PQ ANN with asymmetric-distance candidate ranking and exact re-rank —
  the full production vector-store read path (IVF prune -> PQ/ADC rank ->
  shortlist re-rank), completing the ladder brute-force -> LSH -> IVF-Flat
- BPE merge learning as a DISTRIBUTED iterative algorithm over the word-
  frequency table (the way real tokenizer trainers run), 8 hash-checked
  merge rounds
- Poisson-bootstrap confidence interval for the mean (the coordination-free
  resampling scheme that works on a cluster: per-row weights are
  independent hash-derived Poisson(1) draws, no global multinomial)
- Zipf law fit of the token frequency distribution (log-log OLS slope)

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data operator families
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql
from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# sim_ann_ivfpq — IVF-PQ with ADC: see operators/similarity.ivfpq_ann_topk
# for the full plan rationale. Oracle rebuilds the identical IVF codebook,
# cell assignment, PQ codes (round-9-then-argmin, ties to smaller code),
# per-query ADC tables, shortlist, and exact re-rank.
# ---------------------------------------------------------------------------

_IVFPQ_ORACLE = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cb AS (SELECT row_number() OVER (ORDER BY hh, vec_id) AS centroid_id,
              emb AS cvec
       FROM (SELECT vec_id, emb,
                    {hash64_sql("CAST(vec_id AS VARCHAR)")} AS hh
             FROM emb
             ORDER BY hh, vec_id LIMIT 16)),
asg AS (SELECT vec_id, emb, centroid_id,
               round(list_dot_product(emb, cvec)
                     / (sqrt(list_dot_product(emb, emb))
                        * sqrt(list_dot_product(cvec, cvec))), 6) AS cs
        FROM emb CROSS JOIN cb),
corp AS (SELECT vec_id, emb, centroid_id AS cluster
         FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cs DESC, centroid_id) AS crn FROM asg)
         WHERE crn = 1),
qprobe AS (SELECT vec_id AS q_vec_id, emb AS q_emb, centroid_id AS cluster
           FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY cs DESC, centroid_id) AS crn FROM asg)
           WHERE vec_id < 5 AND crn <= 4),
subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
pqcb AS (SELECT subs.s, CAST(e.vec_id AS INT) AS code,
                e.emb[subs.s * 8 + 1 : subs.s * 8 + 8] AS cent
         FROM emb e, subs WHERE e.vec_id < 4),
d AS (SELECT e.vec_id, p.s, p.code,
             round(list_sum(list_transform(range(1, 9),
                   i -> (e.emb[p.s * 8 + i] - p.cent[i])
                        * (e.emb[p.s * 8 + i] - p.cent[i]))), 9) AS dist
      FROM emb e, pqcb p),
codes AS (SELECT vec_id, s, code
          FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                           ORDER BY dist, code) AS rn FROM d)
          WHERE rn = 1),
cand AS (SELECT q.q_vec_id, q.q_emb, e.vec_id
         FROM qprobe q JOIN corp e USING (cluster)
         WHERE e.vec_id <> q.q_vec_id),
adc AS (SELECT c.q_vec_id, c.vec_id,
               round(sum(round(list_sum(list_transform(range(1, 9),
                     i -> (c.q_emb[kk.s * 8 + i] - p.cent[i])
                          * (c.q_emb[kk.s * 8 + i] - p.cent[i]))), 9)), 6)
                 AS approx_d
        FROM cand c
        JOIN codes kk ON kk.vec_id = c.vec_id
        JOIN pqcb p ON p.s = kk.s AND p.code = kk.code
        GROUP BY c.q_vec_id, c.vec_id),
short AS (SELECT q_vec_id, vec_id
          FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                           ORDER BY approx_d, vec_id) AS srn FROM adc)
          WHERE srn <= 60),
q0 AS (SELECT vec_id AS q_vec_id, emb AS q_emb FROM emb WHERE vec_id < 5),
rr AS (SELECT s.q_vec_id, s.vec_id,
              round(list_dot_product(q0.q_emb, e.emb)
                    / (sqrt(list_dot_product(q0.q_emb, q0.q_emb))
                       * sqrt(list_dot_product(e.emb, e.emb))), 6) AS score
       FROM short s JOIN q0 USING (q_vec_id) JOIN emb e USING (vec_id))
SELECT q_vec_id, vec_id, score
FROM (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                 ORDER BY score DESC, vec_id) AS rn FROM rr)
WHERE rn <= 10
"""


@register("sim_ann_ivfpq", _IVFPQ_ORACLE)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-10 for 5 query vectors: 16-cell IVF index, nprobe=4,
    8x4 product-quantization codebook, ADC candidate ranking, 60-row
    shortlist, exact cosine re-rank. The corpus picks up (cluster, codes)
    in ONE narrow broadcast-codebook scan — 8 code bytes per vector is
    the PQ memory claim; per-candidate ranking is 8 ADC table lookups,
    full vectors are only touched again for the shortlist
    (operators/similarity.py ivfpq_ann_topk has the full 100 TB plan)."""
    from kafka_etl_consumer_spark.operators import similarity as S

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    return S.ivfpq_ann_topk(
        e.select("vec_id", "embedding"), q, k=10, dims=64,
        n_centroids=16, nprobe=4, subspaces=8, codebook_size=4, shortlist=60,
    )


# ---------------------------------------------------------------------------
# corpus_bpe_merges — byte-pair-encoding merge learning, distributed: the
# corpus collapses to the word-frequency table FIRST (the pre-aggregation
# every real BPE trainer uses — pair statistics are identical and the
# iterative state is |vocab| rows, not |corpus| rows); then 8 rounds of
# (count adjacent symbol pairs weighted by word frequency) -> (merge the
# argmax pair everywhere, left-to-right non-overlapping).
#
# The merge rewrite runs on a space-joined symbol string with a DOUBLED-
# separator trick: ' a  b ' patterns can't share boundary spaces, so plain
# replace() (left-to-right, non-overlapping, identical semantics in Spark
# and DuckDB) implements exactly BPE's merge rule — 'a a a' merges once,
# 'a b a b' merges twice. The oracle unrolls the identical 8 rounds as
# MATERIALIZED CTEs (plain CTEs would inline ~3^8 scans), so pair counts,
# tie-breaks (count DESC, pair ASC), and the rewrite itself are all
# hash-checked every round.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 8


def _bpe_oracle_sql(rounds: int) -> str:
    parts = [
        f"WITH toks AS (SELECT unnest({tokens_sql('text')}) AS w FROM documents),",
        "wf0 AS MATERIALIZED (SELECT w,"
        " array_to_string(string_split(w, ''), ' ') AS seq,"
        " count(*) AS f FROM toks GROUP BY w)",
    ]
    for i in range(rounds):
        parts.append(
            f", p{i} AS MATERIALIZED ("
            f" SELECT pr, sum(f) AS n FROM ("
            f"  SELECT unnest(list_transform(range(1, len(string_split(seq, ' '))),"
            f"   i -> string_split(seq, ' ')[i] || ' ' || string_split(seq, ' ')[i+1]))"
            f"   AS pr, f FROM wf{i})"
            f" GROUP BY pr)"
            f", b{i} AS MATERIALIZED ("
            f" SELECT pr, replace(pr, ' ', '') AS mg, CAST(n AS BIGINT) AS n"
            f" FROM p{i} ORDER BY n DESC, pr LIMIT 1)"
            f", wf{i + 1} AS MATERIALIZED ("
            f" SELECT w, trim(replace("
            f"   replace(' ' || replace(seq, ' ', '  ') || ' ',"
            f"           ' ' || replace(b{i}.pr, ' ', '  ') || ' ',"
            f"           ' ' || b{i}.mg || ' '),"
            f"   '  ', ' ')) AS seq, f"
            f" FROM wf{i} CROSS JOIN b{i})"
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS r, pr AS pair, mg AS merged, n FROM b{i}"
        for i in range(rounds)
    )
    parts.append(sel)
    return "\n".join(parts)


@register("corpus_bpe_merges", _bpe_oracle_sql(_BPE_ROUNDS))
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 learned BPE merges (round, pair, merged symbol, weighted
    pair count) over the document corpus.

    Scale shape: ONE corpus-sized shuffle total (token -> word-frequency
    hash-agg); every merge round then runs on the |vocab|-row state —
    pair counting is a narrow zip/explode + hash-agg on that bounded
    table, the argmax is a 1-row TakeOrdered broadcast back, and the
    rewrite is pure string codegen. `localCheckpoint(eager=False)` per
    round truncates the 3x/round lineage growth (the repo's standard
    iterative-plan rule, operators/graph.py)."""
    docs = _t(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(
            "w", F.array_join(F.split("w", ""), " ").alias("seq"), "f"
        )
    )

    def dbl(c):
        return F.concat(F.lit(" "), F.replace(c, F.lit(" "), F.lit("  ")), F.lit(" "))

    outs = []
    for i in range(_BPE_ROUNDS):
        arr = F.split("seq", " ")
        n = F.size(arr)
        prs = F.zip_with(
            F.slice(arr, 1, n - 1),
            F.slice(arr, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        best = (
            wf.select(F.explode(prs).alias("pr"), "f")
            .groupBy("pr")
            .agg(F.sum("f").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), "pr")
            .limit(1)
            .select("pr", F.replace("pr", F.lit(" "), F.lit("")).alias("mg"), "n")
        )
        outs.append(
            best.select(
                F.lit(i).cast("int").alias("r"),
                F.col("pr").alias("pair"),
                F.col("mg").alias("merged"),
                "n",
            )
        )
        wf = (
            wf.crossJoin(F.broadcast(best))
            .select(
                "w",
                F.trim(
                    F.replace(
                        F.replace(
                            dbl(F.col("seq")),
                            dbl(F.col("pr")),
                            F.concat(F.lit(" "), F.col("mg"), F.lit(" ")),
                        ),
                        F.lit("  "),
                        F.lit(" "),
                    )
                ).alias("seq"),
                "f",
            )
            .localCheckpoint(eager=False)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# stats_bootstrap_ci — Poisson bootstrap CI for mean(o_totalprice): each
# (row, resample) weight is an independent Poisson(1) draw via the
# inverse CDF of a hash-uniform — the distributed bootstrap (no global
# multinomial coordination, any row's weight computable anywhere), and
# hash-determinism makes it reproducible AND cross-engine checkable.
#
# The B uniforms per row come from ONE md5 plus B affine rehashes
# u_b = ((base % P) * a_b + c_b) % P / P — the same rehash scheme MinHash
# uses (functions/hashing.py: coefficients bounded so (P-1)*a+c < 2^62,
# no BIGINT overflow in either engine). The md5-per-(row,resample) form
# benched 6.1s at sf0.1; this is one hash per row.
# ---------------------------------------------------------------------------

_BOOT_B = 40
# Poisson(1) CDF thresholds for weights 0..4 (else 5)
_POIS_CDF = (0.36787944117, 0.73575888234, 0.91969860293, 0.98101184313,
             0.99634015317)


def _boot_coeffs(n: int) -> list[tuple[int, int]]:
    from kafka_etl_consumer_spark.functions.hashing import affine_coeffs

    return affine_coeffs("boot", n)


def _boot_oracle() -> str:
    from kafka_etl_consumer_spark.functions.hashing import MINHASH_PRIME as P

    coeff_rows = ", ".join(
        f"({b}, {a}, {c})" for b, (a, c) in enumerate(_boot_coeffs(_BOOT_B))
    )
    return f"""
WITH co(b, a, c) AS (SELECT * FROM (VALUES {coeff_rows})),
base AS (SELECT o_totalprice AS x,
                {hash64_sql("'boot|' || CAST(o_orderkey AS VARCHAR)")} % {P} AS h
         FROM orders),
u AS (SELECT co.b, base.x,
             ((base.h * co.a + co.c) % {P}) / CAST({P} AS DOUBLE) AS u
      FROM base CROSS JOIN co),
w AS (SELECT b, x,
             CASE WHEN u < {_POIS_CDF[0]} THEN 0
                  WHEN u < {_POIS_CDF[1]} THEN 1
                  WHEN u < {_POIS_CDF[2]} THEN 2
                  WHEN u < {_POIS_CDF[3]} THEN 3
                  WHEN u < {_POIS_CDF[4]} THEN 4
                  ELSE 5 END AS wt
      FROM u),
m AS (SELECT b, round(sum(wt * x) / sum(wt), 6) AS mb FROM w GROUP BY b),
pt AS (SELECT round(avg(o_totalprice), 6) AS point_mean FROM orders)
SELECT CAST({_BOOT_B} AS INT) AS n_resamples, pt.point_mean,
       round(quantile_cont(mb, 0.025), 6) AS lo95,
       round(quantile_cont(mb, 0.975), 6) AS hi95,
       round(stddev_samp(mb), 6) AS boot_se
FROM m CROSS JOIN pt GROUP BY pt.point_mean
"""


_BOOT_ORACLE = _boot_oracle()


@register("stats_bootstrap_ci", _BOOT_ORACLE)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI (+ bootstrap SE) for the mean order total,
    B=40 deterministic resamples. Scale: the fan-out is x B on the
    NARROW (key, value) projection; each resample mean partial-aggregates
    map-side to B rows; the quantile runs over B scalars. No sampling
    pass, no coordination, retry-stable — the bootstrap that actually
    works on a cluster."""
    from kafka_etl_consumer_spark.functions.hashing import MINHASH_PRIME as P

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = o.select(
        F.col("o_totalprice").alias("x"),
        (
            hash64(F.concat(F.lit("boot|"), F.col("o_orderkey").cast("string")))
            % P
        ).alias("h"),
    )
    us = F.array(
        *[
            ((F.col("h") * a + c) % P) / float(P)
            for a, c in _boot_coeffs(_BOOT_B)
        ]
    )
    u = F.col("u")
    wt = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
    )
    w = base.select("x", F.posexplode(us).alias("b", "u")).select(
        "b", "x", wt.alias("wt")
    )
    m = w.groupBy("b").agg(
        F.round(F.sum(F.col("wt") * F.col("x")) / F.sum("wt"), 6).alias("mb")
    )
    pt = o.agg(F.round(F.avg("o_totalprice"), 6).alias("point_mean"))
    return (
        m.crossJoin(F.broadcast(pt))
        .groupBy("point_mean")
        .agg(
            F.round(F.percentile("mb", F.lit(0.025)), 6).alias("lo95"),
            F.round(F.percentile("mb", F.lit(0.975)), 6).alias("hi95"),
            F.round(F.stddev_samp("mb"), 6).alias("boot_se"),
        )
        .select(
            F.lit(_BOOT_B).cast("int").alias("n_resamples"),
            "point_mean", "lo95", "hi95", "boot_se",
        )
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — does the corpus obey Zipf's law? OLS fit of
# log2(frequency) against log2(rank): slope ~ -1 for natural language;
# a flat slope flags synthetic/templated text — a cheap corpus-health
# fingerprint next to the entropy and repetition signals.
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = f"""
WITH tf AS (SELECT t, count(*) AS f
            FROM (SELECT unnest({tokens_sql("text")}) AS t FROM documents)
            GROUP BY t),
r AS (SELECT log2(CAST(row_number() OVER (ORDER BY f DESC, t) AS DOUBLE)) AS lr,
             log2(CAST(f AS DOUBLE)) AS lf
      FROM tf)
SELECT CAST(count(*) AS BIGINT) AS n_types,
       round(regr_slope(lf, lr), 6) AS slope,
       round(regr_intercept(lf, lr), 6) AS intercept,
       round(regr_r2(lf, lr), 6) AS r2
FROM r
"""


@register("text_zipf_fit", _ZIPF_ORACLE)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf log-log OLS over the token frequency table. Scale: one
    corpus-sized token hash-agg; the rank window and regression moments
    run on the |vocab|-row frequency table (regr_* are single-pass
    moment aggregates). The global rank sort is over vocab, not corpus."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    r = tf.select(
        F.log2(
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), "t"))
            .cast("double")
        ).alias("lr"),
        F.log2(F.col("f").cast("double")).alias("lf"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(F.regr_slope("lf", "lr"), 6).alias("slope"),
        F.round(F.regr_intercept("lf", "lr"), 6).alias("intercept"),
        F.round(F.regr_r2("lf", "lr"), 6).alias("r2"),
    )
