"""Query surface batch 42 (round 7, third wave): stratified and
equivalence experimentation tests, and a second iterative link-analysis
algorithm.

- stats_cmh_test — Cochran-Mantel-Haenszel: ONE stratified 2x2 test
  across the event-type strata instead of five unpooled chi-squares —
  the Simpson's-paradox-proof way to read an A/B that ran across
  heterogeneous segments. Continuity-corrected statistic + the
  Mantel-Haenszel common odds ratio, all from integer per-stratum
  counts (one hash aggregate), chi-square(1) survival via the repo's
  standard A-S erf polynomial.
- stats_noninferiority_tost — two one-sided tests against a +/-5
  margin per event type (Welch normal approximation): the question
  launches actually ask ("is B at most negligibly worse than A"),
  which neither a significance test nor a CI answers directly.
  Equivalence verdicts compare ROUNDED p-values so a last-ulp cannot
  flip the flag cross-engine.
- graph_hits_hubs_auth — Kleinberg HITS (3 mutual power-iteration
  rounds, L1-normalized) over the same deterministic modular link
  graph graph_pagerank uses; hubs and authorities are the asymmetric
  complement to PageRank's single score. Oracle unrolls the rounds as
  chained CTEs exactly like the PageRank oracle; scores round at 9
  decimals to absorb summation-order drift.

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283 of mykidong/kafka-etl-consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# chi-square(1) survival: P(X > x) = 1 - erf(sqrt(x/2)), erf by the
# repo-standard Abramowitz-Stegun 7.1.26 polynomial (same constants as
# stats_mannwhitney_u / stats_bayes_ab_beta) so engines agree exactly.
_CHI1_P = """
((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
  - 0.284496736) * tt + 0.254829592) * tt * exp(-aa * aa)
"""

_CMH_ORACLE = f"""
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
per AS (
  SELECT k, a, b, c, d, a + b + c + d AS t,
         a - (a + b) * (a + c) / (a + b + c + d) AS dev,
         (a + b) * (c + d) * (a + c) * (b + d)
           / ((a + b + c + d) * (a + b + c + d) * (a + b + c + d - 1)) AS var,
         a * d / (a + b + c + d) AS orn,
         b * c / (a + b + c + d) AS ord
  FROM cells
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_strata,
         sum(dev) AS sd, sum(var) AS sv,
         sum(orn) AS son, sum(ord) AS sod
  FROM per
),
st AS (
  SELECT k_strata,
         greatest(abs(sd) - 0.5, 0) * greatest(abs(sd) - 0.5, 0) / sv AS q,
         son / sod AS or_mh
  FROM agg
),
e AS (
  SELECT *, sqrt(q / 2) AS aa, 1 / (1 + 0.3275911 * sqrt(q / 2)) AS tt
  FROM st
)
SELECT k_strata, round(q, 6) AS cmh_stat,
       round({_CHI1_P}, 6) AS p_value,
       round(or_mh, 6) AS or_mh
FROM e
"""


@register("stats_cmh_test", _CMH_ORACLE)
def stats_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of the conversion flag (value > 50)
    between arms (deterministic user-parity split) STRATIFIED by event
    type — pooling the five 2x2 tables the Simpson-safe way, with the
    continuity-corrected statistic and the MH common odds ratio. The
    per-stratum cells are ONE hash aggregate of integer counts; the
    pooled statistic is arithmetic over the |strata|-row grid, so the
    plan shape is flat at any event volume."""
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
    per = cells.selectExpr(
        "k",
        "a - (a + b) * (a + c) / (a + b + c + d) AS dev",
        "(a + b) * (c + d) * (a + c) * (b + d)"
        " / ((a + b + c + d) * (a + b + c + d) * (a + b + c + d - 1)) AS var",
        "a * d / (a + b + c + d) AS orn",
        "b * c / (a + b + c + d) AS ord",
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_strata"),
        F.sum("dev").alias("sd"),
        F.sum("var").alias("sv"),
        F.sum("orn").alias("son"),
        F.sum("ord").alias("sod"),
    )
    st = agg.selectExpr(
        "k_strata",
        "greatest(abs(sd) - 0.5, 0) * greatest(abs(sd) - 0.5, 0) / sv AS q",
        "son / sod AS or_mh",
    )
    e = st.selectExpr(
        "*", "sqrt(q / 2) AS aa", "1 / (1 + 0.3275911 * sqrt(q / 2)) AS tt"
    )
    return e.selectExpr(
        "k_strata",
        "round(q, 6) AS cmh_stat",
        f"round({_CHI1_P}, 6) AS p_value",
        "round(or_mh, 6) AS or_mh",
    )


# normal CDF via the same polynomial (signed form, as stats_bayes_ab_beta)
_PHI_Z = """
0.5 * (1 + (CASE WHEN z{i} >= 0 THEN 1 ELSE -1 END)
       * (1 - ((((1.061405429 * t{i} - 1.453152027) * t{i} + 1.421413741) * t{i}
                - 0.284496736) * t{i} + 0.254829592) * t{i} * exp(-az{i} * az{i})))
"""

_TOST_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         avg(CASE WHEN user_id % 2 = 0 THEN value END) AS ma,
         avg(CASE WHEN user_id % 2 = 1 THEN value END) AS mb,
         var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS va,
         var_samp(CASE WHEN user_id % 2 = 1 THEN value END) AS vb
  FROM events GROUP BY event_type
),
se AS (
  SELECT *, mb - ma AS diff, sqrt(va / n_a + vb / n_b) AS s FROM g
),
zz AS (
  SELECT *, (diff + 5.0) / s AS z1, (diff - 5.0) / s AS z2 FROM se
),
e AS (
  SELECT *, abs(z1) / sqrt(2) AS az1, 1 / (1 + 0.3275911 * (abs(z1) / sqrt(2))) AS t1,
            abs(z2) / sqrt(2) AS az2, 1 / (1 + 0.3275911 * (abs(z2) / sqrt(2))) AS t2
  FROM zz
),
p AS (
  SELECT event_type, n_a, n_b, diff, s,
         round(1 - {_PHI_Z.format(i=1)}, 6) AS p_lower,
         round({_PHI_Z.format(i=2)}, 6) AS p_upper
  FROM e
)
SELECT event_type, n_a, n_b, round(diff, 6) AS diff, round(s, 6) AS se,
       p_lower, p_upper,
       CASE WHEN greatest(p_lower, p_upper) < 0.05 THEN 1 ELSE 0 END
         AS equivalent
FROM p
"""


@register("stats_noninferiority_tost", _TOST_ORACLE)
def stats_noninferiority_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence testing by TOST (two one-sided tests) against a
    +/-5.0 margin on the value mean per event type, Welch normal
    approximation: p_lower rejects "B is worse than A by more than 5",
    p_upper rejects "B is better by more than 5"; both under 0.05 means
    the arms are statistically EQUIVALENT within the margin — the
    question a do-no-harm launch review actually asks. One hash
    aggregate per stratum; the verdict compares ROUNDED p-values so a
    summation-order ulp cannot flip it between engines."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.avg(F.when(F.col("user_id") % 2 == 0, F.col("value"))).alias("ma"),
        F.avg(F.when(F.col("user_id") % 2 == 1, F.col("value"))).alias("mb"),
        F.var_samp(F.when(F.col("user_id") % 2 == 0, F.col("value"))).alias("va"),
        F.var_samp(F.when(F.col("user_id") % 2 == 1, F.col("value"))).alias("vb"),
    )
    se = g.selectExpr("*", "mb - ma AS diff", "sqrt(va / n_a + vb / n_b) AS s")
    zz = se.selectExpr("*", "(diff + 5.0) / s AS z1", "(diff - 5.0) / s AS z2")
    e = zz.selectExpr(
        "*",
        "abs(z1) / sqrt(2) AS az1",
        "1 / (1 + 0.3275911 * (abs(z1) / sqrt(2))) AS t1",
        "abs(z2) / sqrt(2) AS az2",
        "1 / (1 + 0.3275911 * (abs(z2) / sqrt(2))) AS t2",
    )
    p = e.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "diff",
        "s",
        f"round(1 - {_PHI_Z.format(i=1)}, 6) AS p_lower",
        f"round({_PHI_Z.format(i=2)}, 6) AS p_upper",
    )
    return p.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "round(diff, 6) AS diff",
        "round(s, 6) AS se",
        "p_lower",
        "p_upper",
        "CASE WHEN greatest(p_lower, p_upper) < 0.05 THEN 1 ELSE 0 END"
        " AS equivalent",
    )


_HITS_ITERS = 3


def _hits_oracle(iters: int = _HITS_ITERS) -> str:
    """Exact HITS oracle: each half-round unrolled as CTEs, same L1
    normalization order as operators/graph.hits."""
    pre = """
    WITH n AS (SELECT count(*) AS ni, CAST(count(*) AS DOUBLE) AS nd FROM documents),
    v AS (SELECT doc_id AS id FROM documents),
    e AS (SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src,
                   unnest([(doc_id*7+1) % ni, (doc_id*13+2) % ni,
                           (doc_id*29+3) % ni]) AS dst
            FROM documents, n)),
    h0 AS (SELECT id, 1.0/nd AS s FROM v, n)"""
    parts = []
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
    a{i}r AS (SELECT e.dst AS id, sum({prev_h}.s) AS x
          FROM e JOIN {prev_h} ON {prev_h}.id = e.src GROUP BY e.dst),
    a{i}n AS (SELECT v.id, coalesce(a{i}r.x, 0) AS x FROM v LEFT JOIN a{i}r USING (id)),
    a{i}s AS (SELECT sum(x) AS tot FROM a{i}n),
    a{i} AS (SELECT id, x / tot AS s FROM a{i}n, a{i}s),
    h{i}r AS (SELECT e.src AS id, sum(a{i}.s) AS x
          FROM e JOIN a{i} ON a{i}.id = e.dst GROUP BY e.src),
    h{i}n AS (SELECT v.id, coalesce(h{i}r.x, 0) AS x FROM v LEFT JOIN h{i}r USING (id)),
    h{i}s AS (SELECT sum(x) AS tot FROM h{i}n),
    h{i} AS (SELECT id, x / tot AS s FROM h{i}n, h{i}s)""")
        prev_h = f"h{i}"
    return (
        pre
        + "".join(parts)
        + f"""
    SELECT h{iters}.id AS doc_id, round(h{iters}.s, 9) AS hub,
           round(a{iters}.s, 9) AS auth
    FROM h{iters} JOIN a{iters} ON a{iters}.id = h{iters}.id"""
    )


@register("graph_hits_hubs_auth", oracle=_hits_oracle())
def graph_hits_hubs_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS hubs/authorities (3 mutual power-iteration rounds,
    L1-normalized) over the same deterministic modular link graph as
    graph_pagerank — the asymmetric complement to PageRank: a node can
    be a strong hub (links to good authorities) without being an
    authority itself, which one scalar rank cannot express. Plan shape
    per half-round: one edge-keyed join + one grouped sum + a broadcast
    one-row normalizer; everything lazy (operators/graph.hits). Scores
    round at 9 decimals in both engines, absorbing summation-order
    drift, same convention as PageRank."""
    from kafka_etl_consumer_spark.operators.graph import hits

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
    scores = hits(edges, docs, iterations=_HITS_ITERS, id_col="doc_id")
    return scores.select(
        "doc_id", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth")
    )
