"""Query surface batch 4: corpus-preparation operators round 2 — PII
scrubbing, within-document repetition signals, sequence packing, embedding
int8 quantization — plus SQL-surface widening (regression/median
aggregates, positional explode).

Every query carries a full DuckDB oracle computing the SAME formula (the
PII regexes are RE2-safe so Java and RE2 match byte-for-byte; shingle /
token builders are shared with the dedup oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql, word_shingles_sql
from kafka_etl_consumer_spark.operators import embeddings as E
from kafka_etl_consumer_spark.operators import packing as P
from kafka_etl_consumer_spark.operators import text as X
from kafka_etl_consumer_spark.operators.text import PII_PATTERNS
from kafka_etl_consumer_spark.plans.registry import _t, register

_TOK = tokens_sql("text")


# ---------------------------------------------------------------------------
# PII redaction (C4/Dolma-style scrub). The synthetic documents table has no
# real PII, so the query deterministically injects one email + phone + IPv4
# per document (pure function of doc_id, identical in both engines) and the
# operator must find and mask exactly those spans.
# ---------------------------------------------------------------------------

_PII_SUFFIX_SQL = (
    "' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
)

_PII_COUNTS_SQL = ", ".join(
    "len(regexp_extract_all(t, '" + pat + "')) AS n_" + name
    for name, pat, _ in PII_PATTERNS
)

_PII_CLEAN_SQL = "t"
for _name, _pat, _repl in PII_PATTERNS:
    _PII_CLEAN_SQL = (
        "regexp_replace(" + _PII_CLEAN_SQL + ", '" + _pat + "', '" + _repl + "', 'g')"
    )


def _with_pii(docs: DataFrame) -> DataFrame:
    suffix = F.concat(
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".0.1"),
    )
    return docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))


@register(
    "text_pii_redact",
    oracle=f"""
    WITH d AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS t FROM documents)
    SELECT doc_id, {_PII_COUNTS_SQL}, {_PII_CLEAN_SQL} AS clean
    FROM d
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + mask emails / phones / IPv4 per document.
    Narrow regexp map, JVM codegen, no shuffle (operators/text.pii_redact)."""
    return X.pii_redact(_with_pii(_t(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher-style quality signals)
# ---------------------------------------------------------------------------


@register(
    "text_repetition",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    g AS (SELECT doc_id, toks,
                 {word_shingles_sql('toks', 2)} AS sh2,
                 {word_shingles_sql('toks', 3)} AS sh3
          FROM tok)
    SELECT doc_id,
           len(toks) AS n_tokens,
           CASE WHEN len(sh2) > 0
                THEN round((len(sh2) - len(list_distinct(sh2))) / CAST(len(sh2) AS DOUBLE), 6)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(sh3) > 0
                THEN round((len(sh3) - len(list_distinct(sh3))) / CAST(len(sh3) AS DOUBLE), 6)
                ELSE 0.0 END AS dup_3gram_frac,
           CASE WHEN len(toks) > 0
                THEN round(list_max(list_transform(list_distinct(toks),
                           u -> len(list_filter(toks, x -> x = u)))) / CAST(len(toks) AS DOUBLE), 6)
                ELSE 0.0 END AS top_token_frac
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-shingle fractions + top-token concentration per document
    (operators/text.repetition_profile). Per-row array built-ins only."""
    return X.repetition_profile(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Sequence packing (token-budget training batches)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048
_PACK_SHARDS = 8


@register(
    "pack_sequences",
    oracle=f"""
    WITH d AS (SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
                      len({_TOK}) AS n_toks
               FROM documents),
    o AS (SELECT shard, doc_id, n_toks,
                 CAST(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id) - n_toks
                      AS BIGINT) AS off
          FROM d)
    SELECT shard, off // {_PACK_BUDGET} AS pack_id, count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS pack_tokens, min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM o GROUP BY 1, 2
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: hash-shard the corpus, exclusive
    prefix-sum of token counts per shard, pack = offset // budget; returns
    the per-pack rollup (operators/packing.pack_sequences). One shuffle."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.size(tokens("text")).alias("n_toks"))
    return P.pack_sequences(
        d, token_col="n_toks", order_col="doc_id", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization
# ---------------------------------------------------------------------------


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    d AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e),
    st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM d GROUP BY i),
    q AS (SELECT vec_id,
                 CASE WHEN mx > mn
                      THEN CAST(round((x - mn) / (mx - mn) * 255, 0) AS BIGINT) - 128
                      ELSE 0 END AS qv,
                 x, mn, mx
          FROM d JOIN st USING (i)),
    r AS (SELECT vec_id, qv,
                 CASE WHEN mx > mn
                      THEN abs((qv + 128) / 255.0 * (mx - mn) + mn - x)
                      ELSE 0.0 END AS e
          FROM q)
    SELECT vec_id, CAST(sum(qv) AS BIGINT) AS q_sum, min(qv) AS q_min, max(qv) AS q_max,
           round(sum(e) / count(*), 6) AS mae
    FROM r GROUP BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension affine int8 quantization of the embedding store with
    reconstruction-error audit (operators/embeddings.quantize_int8).
    d-row stats shuffle + broadcast back; zero corpus shuffle."""
    return E.quantize_int8(_t(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# SQL surface: regression / median aggregates, positional explode
# ---------------------------------------------------------------------------


@register(
    "regr_agg",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 6) AS covar_s,
           round(covar_pop(l_extendedprice, l_quantity), 6) AS covar_p,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(median(CAST(l_quantity AS DOUBLE)), 6) AS median_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression / covariance aggregate family + exact median,
    grouped. Single-pass hash aggregate with map-side partial combine."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(y, x), 6).alias("corr_price_qty"),
        F.round(F.covar_samp(y, x), 6).alias("covar_s"),
        F.round(F.covar_pop(y, x), 6).alias("covar_p"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.median(x.cast("double")), 6).alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pos_explode_tokens",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents WHERE doc_id < 20)
    SELECT doc_id,
           unnest(generate_series(0, len(toks) - 1)) AS pos,
           unnest(toks) AS token
    FROM tok
    """,
)
def pos_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (token, 0-based position) — the LATERAL VIEW
    posexplode shape; generator runs inside codegen, no shuffle."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )


@register(
    "lateral_topk_per_order",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM orders o, LATERAL (
        SELECT l_linenumber, l_extendedprice FROM lineitem
        WHERE l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
    WHERE o.o_orderkey < 1000
    """,
)
def lateral_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 line items
    per order). Catalyst decorrelates this into an equi-join + per-key
    rank limit — the filtered orders side broadcasts and the pattern runs
    without any nested-loop stage, so it scales like a windowed top-k."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        FROM orders o, LATERAL (
            SELECT l_linenumber, l_extendedprice FROM lineitem
            WHERE l_orderkey = o.o_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        WHERE o.o_orderkey < 1000
        """
    )


@register(
    "variant_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS k,
           CAST(props->>'k' AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json(props) -> binary variant, then typed path extraction with
    try_variant_get. Variant decode stays columnar/JVM-side (no Python,
    no UDF); at 100 TB this is a narrow map over the scan."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return ev.select(
        F.col("event_id"),
        k.alias("k"),
        F.pmod(k, F.lit(10)).alias("k_bucket"),
    )
