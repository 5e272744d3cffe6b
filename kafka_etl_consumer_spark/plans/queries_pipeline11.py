"""Query surface batch 16 (round 4): positional phrase search, forecast
backtesting, community quality, and coreset selection.

- exact phrase matching over the token-position structure (the positional-
  index feature BM25 bag-of-words retrieval cannot express)
- seasonal-naive forecast backtest: naive-1 vs seasonal-naive-7 accuracy
  (MAE/RMSE/MAPE/bias) over a rolling 14-day holdout — the baseline every
  real forecast must beat
- Newman modularity of the label-propagation communities (is the detected
  structure actually denser than chance?)
- greedy k-center coreset selection (farthest-point traversal): the
  diversity-maximizing subset picker for training-data curation, an
  iterative algorithm whose every round is hash-checked

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data operator families
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# search_phrase_match — exact adjacent-token phrase occurrences with counts
# and first positions, from the same bigram structure the BPE trainer uses.
# ---------------------------------------------------------------------------

_PHRASES = ("hash join", "merge sort")

_PHRASE_ORACLE = f"""
WITH t AS (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents),
p AS (SELECT doc_id, list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1]) AS prs FROM t),
ph AS (SELECT unnest(['hash join', 'merge sort']) AS phrase)
SELECT ph.phrase, p.doc_id,
       CAST(len(list_filter(prs, x -> x = ph.phrase)) AS BIGINT) AS n_occ,
       CAST(list_position(prs, ph.phrase) AS INT) AS first_pos
FROM p CROSS JOIN ph
WHERE len(list_filter(prs, x -> x = ph.phrase)) > 0
"""


@register("search_phrase_match", _PHRASE_ORACLE)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents containing each exact phrase, with occurrence count and
    1-based first token position. Scale: tokenization + the bigram zip +
    the per-phrase containment check are all narrow codegen over one
    scan — no inverted-index shuffle needed for a fixed phrase list; the
    only output rows are matches. (For ad-hoc phrase workloads, build
    the positional variant of search_inverted_index once and join.)"""
    docs = _t(spark, sf_dir, "documents")
    arr = tokens(F.col("text"))
    t = docs.select("doc_id", arr.alias("toks"))
    n = F.size("toks")
    prs = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    p = t.select("doc_id", prs.alias("prs"))
    ph = F.explode(F.array(*[F.lit(x) for x in _PHRASES])).alias("phrase")
    matches = p.select("doc_id", "prs", ph).select(
        "phrase",
        "doc_id",
        F.size(F.filter("prs", lambda x: x == F.col("phrase")))
        .cast("bigint")
        .alias("n_occ"),
        F.array_position("prs", F.col("phrase")).cast("int").alias("first_pos"),
    )
    return matches.filter(F.col("n_occ") > 0)


# ---------------------------------------------------------------------------
# ts_snaive_backtest — rolling 14-day holdout accuracy of the two
# baselines every forecast must beat: yesterday's value (naive-1) and
# same-weekday-last-week (seasonal-naive-7).
# ---------------------------------------------------------------------------

_SNAIVE_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
l AS (SELECT d, y,
             lag(y, 1) OVER (ORDER BY d) AS f1,
             lag(y, 7) OVER (ORDER BY d) AS f7,
             max(d) OVER () AS md
      FROM daily),
bt AS (SELECT * FROM l WHERE d > md - 14),
um AS (SELECT 'naive1' AS model, y, f1 AS f FROM bt
       UNION ALL SELECT 'snaive7', y, f7 FROM bt)
SELECT model, CAST(count(*) AS BIGINT) AS n_days,
       round(avg(abs(y - f)), 6) AS mae,
       round(sqrt(avg(CAST((y - f) * (y - f) AS DOUBLE))), 6) AS rmse,
       round(avg(abs(y - f) / CAST(y AS DOUBLE)), 6) AS mape,
       round(avg(f - CAST(y AS DOUBLE)), 6) AS bias
FROM um GROUP BY model
"""


@register("ts_snaive_backtest", _SNAIVE_ORACLE)
def ts_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """naive-1 vs seasonal-naive-7 backtest (MAE/RMSE/MAPE/bias) on the
    last 14 days of the daily event series. Scale: the raw scan collapses
    to the DAY grain in one partial-combining hash-agg; lags + the error
    aggregates run over the bounded day series; adding models adds rows
    to a 2-branch union of the SAME windowed frame, not new scans."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"))
        .groupBy(F.col("d").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    w = Window.orderBy("d")
    l_ = daily.select(
        "d",
        "y",
        F.lag("y", 1).over(w).alias("f1"),
        F.lag("y", 7).over(w).alias("f7"),
        F.max("d").over(Window.partitionBy()).alias("md"),
    )
    bt = l_.filter(F.col("d") > F.date_sub(F.col("md"), 14))
    um = bt.select(F.lit("naive1").alias("model"), "y", F.col("f1").alias("f")).unionByName(
        bt.select(F.lit("snaive7").alias("model"), "y", F.col("f7").alias("f"))
    )
    err = F.col("y") - F.col("f")
    return um.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg(F.abs(err)), 6).alias("mae"),
        F.round(F.sqrt(F.avg((err * err).cast("double"))), 6).alias("rmse"),
        F.round(F.avg(F.abs(err) / F.col("y").cast("double")), 6).alias("mape"),
        F.round(F.avg(F.col("f") - F.col("y").cast("double")), 6).alias("bias"),
    )


# ---------------------------------------------------------------------------
# graph_modularity — Newman modularity Q of the 3-round label-propagation
# partition: Q = sum_c [ m_c/m - (d_c/2m)^2 ]. The quality gate on
# community detection — LPA always returns SOMETHING; Q says whether the
# something is denser than a random graph with the same degrees.
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from kafka_etl_consumer_spark.plans.queries_pipeline6 import _LPA_ORACLE

    # reuse the LPA oracle's CTE chain up to i3 (drop its final SELECT)
    lpa_ctes = _LPA_ORACLE[: _LPA_ORACLE.index(",\nsizes AS")]
    return (
        lpa_ctes
        + """,
deg AS (SELECT u, count(*) AS dg FROM sym GROUP BY u),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e0),
within AS (SELECT la.lbl AS c, count(*) AS mc
           FROM e0 JOIN i3 la ON la.u = e0.p1
           JOIN i3 lb ON lb.u = e0.p2
           WHERE la.lbl = lb.lbl GROUP BY la.lbl),
comm AS (SELECT i3.lbl AS c, count(*) AS nv, sum(deg.dg) AS dc
         FROM i3 JOIN deg ON deg.u = i3.u GROUP BY i3.lbl)
SELECT comm.c AS community, CAST(nv AS BIGINT) AS n_vertices,
       CAST(coalesce(within.mc, 0) AS BIGINT) AS internal_edges,
       CAST(dc AS BIGINT) AS degree_sum,
       round(coalesce(within.mc, 0) / m.m
             - (dc / (2.0 * m.m)) * (dc / (2.0 * m.m)), 6) + 0.0
         AS contribution,
       round(sum(coalesce(within.mc, 0)) OVER () / m.m
             - sum(dc * dc) OVER () / (4.0 * m.m * m.m), 6)
         AS modularity
FROM comm LEFT JOIN within ON within.c = comm.c CROSS JOIN m
"""
    )


@register("graph_modularity", _modularity_oracle())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity decomposition (+ the total Q on every
    row) of the LPA partition over the co-ordered-parts graph
    (orderkey%10 slice — the same graph/rounds as
    graph_label_propagation, so the partitions are identical).
    Scale: LPA's per-round join shuffles only the (vertex, label) side;
    the Q math adds one within-edge count (two label joins keyed by
    endpoint) and bounded per-community aggregates; the final window
    runs over |communities| rows."""
    from kafka_etl_consumer_spark.operators.graph import label_propagation

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst"))
        .distinct()
        .cache()
    )
    labels = label_propagation(e, iterations=3).select(
        F.col("vertex").alias("u"), F.col("community").alias("lbl")
    )
    sym = e.select(F.col("src").alias("u")).unionByName(
        e.select(F.col("dst").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("dg"))
    m = e.agg(F.count(F.lit(1)).cast("double").alias("m"))
    la = labels.withColumnsRenamed({"u": "p1", "lbl": "ca"})
    lb = labels.withColumnsRenamed({"u": "p2", "lbl": "cb"})
    within = (
        e.select(F.col("src").alias("p1"), F.col("dst").alias("p2"))
        .join(la, "p1")
        .join(lb, "p2")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).alias("mc"))
    )
    comm = (
        labels.join(deg, "u")
        .groupBy(F.col("lbl").alias("c"))
        .agg(F.count(F.lit(1)).alias("nv"), F.sum("dg").alias("dc"))
    )
    contrib = (
        F.coalesce(F.col("mc"), F.lit(0)) / F.col("m")
        - (F.col("dc") / (2.0 * F.col("m"))) * (F.col("dc") / (2.0 * F.col("m")))
    )
    return (
        comm.join(within, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("c").alias("community"),
            F.col("nv").cast("bigint").alias("n_vertices"),
            F.coalesce(F.col("mc"), F.lit(0)).cast("bigint").alias("internal_edges"),
            F.col("dc").cast("bigint").alias("degree_sum"),
            # + 0.0 normalizes IEEE -0.0 (DuckDB round keeps the sign,
            # Spark does not; the driver compares canonical strings)
            (F.round(contrib, 6) + F.lit(0.0)).alias("contribution"),
            # the TOTAL is computed from exact integer window sums
            # (sum mc, sum dc^2) so 6dp rounding can't flip on float
            # summation order across ~|communities| doubles
            F.round(
                F.sum(F.coalesce(F.col("mc"), F.lit(0)))
                .over(Window.partitionBy())
                / F.col("m")
                - F.sum(F.col("dc") * F.col("dc")).over(Window.partitionBy())
                / (4.0 * F.col("m") * F.col("m")),
                6,
            ).alias("modularity"),
        )
    )


# ---------------------------------------------------------------------------
# sample_coreset_kcenter — greedy farthest-point traversal: seed at
# vec_id 0, then 7 rounds of "pick the point farthest from every chosen
# center" (squared L2, round-6 before compare, ties to smaller id). The
# classic 2-approximation to the k-center problem — the diverse-subset
# selector for curation/labeling budgets. Every pick and the shrinking
# coverage radius are hash-checked by an unrolled MATERIALIZED-CTE oracle.
# ---------------------------------------------------------------------------

_KCENTER_K = 8


def _kcenter_oracle(k: int) -> str:
    sq = (
        "round(list_sum(list_transform(range(1, 65),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 6)"
    )
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),",
        "c0 AS (SELECT emb AS cv FROM e WHERE vec_id = 0),",
        "m0 AS MATERIALIZED (SELECT vec_id, emb, "
        + sq.format(a="emb", b="cv")
        + " AS mind FROM e CROSS JOIN c0)",
    ]
    for r in range(1, k):
        parts.append(
            f", b{r} AS MATERIALIZED (SELECT vec_id AS cid, emb AS cv,"
            f" mind AS radius FROM m{r - 1} ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if r < k - 1:
            parts.append(
                f", m{r} AS MATERIALIZED (SELECT m.vec_id, m.emb,"
                f" least(m.mind, " + sq.format(a="m.emb", b=f"b{r}.cv")
                + f") AS mind FROM m{r - 1} m CROSS JOIN b{r})"
            )
    sel = ["SELECT CAST(0 AS INT) AS r, CAST(0 AS BIGINT) AS center_vec_id,"
           " 0.0 AS radius"]
    for r in range(1, k):
        sel.append(
            f"SELECT CAST({r} AS INT), cid, radius FROM b{r}"
        )
    parts.append(" UNION ALL ".join(sel))
    return "\n".join(parts)


@register("sample_coreset_kcenter", _kcenter_oracle(_KCENTER_K))
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8 greedy k-center picks (round, chosen vec_id, coverage radius
    at pick time — the max-min distance, which must be non-increasing).
    Scale per round: min-distance update is a narrow per-row fold against
    ONE broadcast center; the argmax is a 1-row TakeOrdered; state is one
    double per point, localCheckpoint per round truncates lineage (the
    repo's iterative-plan rule). O(n·k·d) total work — the same as any
    honest farthest-point traversal, with no quadratic pair matrix."""

    def sq(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    c0 = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("cv"))
    cur = e.crossJoin(F.broadcast(c0)).select(
        "vec_id", "emb", sq(F.col("emb"), F.col("cv")).alias("mind")
    )
    outs = [
        c0.select(
            F.lit(0).cast("int").alias("r"),
            F.lit(0).cast("bigint").alias("center_vec_id"),
            F.lit(0.0).alias("radius"),
        )
    ]
    for r in range(1, _KCENTER_K):
        pick = (
            cur.orderBy(F.col("mind").desc(), "vec_id")
            .limit(1)
            .select(
                F.col("vec_id").alias("cid"),
                F.col("emb").alias("cv"),
                F.col("mind").alias("radius"),
            )
        )
        outs.append(
            pick.select(
                F.lit(r).cast("int").alias("r"),
                F.col("cid").cast("bigint").alias("center_vec_id"),
                F.col("radius").alias("radius"),
            )
        )
        if r < _KCENTER_K - 1:
            cur = (
                cur.crossJoin(F.broadcast(pick.select("cv")))
                .select(
                    "vec_id",
                    "emb",
                    F.least(F.col("mind"), sq(F.col("emb"), F.col("cv"))).alias(
                        "mind"
                    ),
                )
                .localCheckpoint(eager=False)
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
