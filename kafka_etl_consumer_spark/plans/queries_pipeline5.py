"""Query surface batch 9+ (round 2 extensions):

- span-level exact dedup (repeated k-grams cut OUT of documents)
- Unicode-script detection (code-point-range precursor to language ID)
- bucketed interval-overlap join
- corpus-bigram LM familiarity score (CCNet/KenLM-style quality gate)
- vocabulary build + per-document OOV rate
- temperature-scaled source mixing
- time-series motif search (z-normalized pattern top-k)
- event transition matrix (Markov counts/probabilities)
- data-quality validation suite
- weighted sampling without replacement (Efraimidis-Spirakis)
- mergeable histogram quantiles, count-min frequencies, Bloom membership

The reference has no analytics surface at all (pass-through ETL,
ETLTask.java:261-283 of the reference); these extend the training-data
pipeline operators the brief requires. Every query carries an exact DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64_sql
from kafka_etl_consumer_spark.functions.text import tokens_sql
from kafka_etl_consumer_spark.operators.dedup import remove_duplicate_spans
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# duplicated-span removal (Lee et al. 2022 exact-substring dedup, word-gram
# form). k=8-word grams occurring >= 2 times corpus-wide are cut from every
# document; the oracle replays the identical tokenize/gram/hash/cover logic.
# ---------------------------------------------------------------------------

_SPAN_K = 8

_SPAN_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
),
occ AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - {_SPAN_K - 2})) AS start
  FROM docs
),
occ2 AS (
  SELECT doc_id, start,
         {hash64_sql(f"array_to_string(toks[start : start + {_SPAN_K - 1}], ' ')")} AS gh
  FROM occ
),
dup AS (SELECT gh FROM occ2 GROUP BY gh HAVING count(*) >= 2),
ds AS (
  SELECT doc_id, list_sort(list(DISTINCT start)) AS dups
  FROM occ2 JOIN dup USING (gh) GROUP BY doc_id
),
kept AS (
  SELECT d.doc_id, d.toks,
         list_filter(
           d.toks,
           (t, i) -> len(list_filter(coalesce(ds.dups, CAST([] AS BIGINT[])),
                                     s -> s <= i AND i <= s + {_SPAN_K - 1})) = 0
         ) AS kl
  FROM docs d LEFT JOIN ds USING (doc_id)
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(toks) - len(kl) AS n_removed,
       md5(coalesce(array_to_string(kl, ' '), '')) AS clean_fp
FROM kept
"""


@register("dedup_span_removal", _SPAN_ORACLE)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut every corpus-repeated 8-word gram out of every document.

    Spark side is :func:`remove_duplicate_spans` — see its docstring for
    the three-shuffle 100 TB shape (gram-count hash-agg, hash-keyed dup
    join, id-keyed cover collect reusing the doc partitioning).
    """
    return remove_duplicate_spans(_t(spark, sf_dir, "documents"), k=_SPAN_K)


# ---------------------------------------------------------------------------
# Unicode-script detection: per-document code-point-range histogram and the
# dominant script. Pure JVM regexp (one narrow map, zero shuffle); the
# stopword-based text_lang_id answers "which language", this answers "which
# writing system" — the cheap first gate a multilingual pipeline runs
# before any language model is consulted.
# ---------------------------------------------------------------------------

# char-class per script; counted as len(text) - len(text with class removed)
_SCRIPTS = {
    "n_latin": "[A-Za-zÀ-ɏ]",
    "n_cyrillic": "[Ѐ-ӿ]",
    "n_cjk": "[぀-ヿ一-鿿가-힯]",
    "n_digit": "[0-9]",
}

_DOMINANT_SQL = """
CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
     WHEN n_cyrillic >= n_cjk THEN 'cyrillic'
     ELSE 'cjk' END
"""

# the same class literals verbatim in both engines: character-identical
# regexes, so the counts agree exactly
_SCRIPT_ORACLE = (
    "WITH c AS (SELECT doc_id, "
    + ", ".join(
        "CAST(length(regexp_extract_all(text, '{cls}')) AS BIGINT) AS {name}".format(
            cls=cls.replace("'", "''"), name=name
        )
        for name, cls in _SCRIPTS.items()
    )
    + f" FROM documents) SELECT c.*, {_DOMINANT_SQL} AS script FROM c"
)


@register("text_script_detect", _SCRIPT_ORACLE)
def text_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script character counts + dominant script.

    One narrow map over the scan: each count is a JVM ``regexp_count``
    (whole-stage codegen, no Python, no shuffle) — at 100 TB this runs at
    scan speed and is the cheapest possible multilingual routing gate.
    """
    d = _t(spark, sf_dir, "documents")
    cols = [
        F.regexp_count("text", F.lit(cls)).cast("bigint").alias(name)
        for name, cls in _SCRIPTS.items()
    ]
    c = d.select("doc_id", *cols)
    return c.withColumn("script", F.expr(_DOMINANT_SQL))


# ---------------------------------------------------------------------------
# interval-overlap join: bucketed equi-join shape (operators/joins.py
# interval_join) vs DuckDB's native inequality join — same pairs, but the
# Spark plan never builds the per-key quadratic candidate set.
# ---------------------------------------------------------------------------

_IVL_ORACLE = """
WITH li AS (
  SELECT l_suppkey, l_orderkey AS ok, l_linenumber AS ln,
         datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS s,
         datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
           + 1 + (l_linenumber * 3 + l_orderkey) % 14 AS e
  FROM lineitem
)
SELECT x.l_suppkey, CAST(count(*) AS BIGINT) AS n_overlap_pairs
FROM li x JOIN li y ON x.l_suppkey = y.l_suppkey
  AND (x.ok < y.ok OR (x.ok = y.ok AND x.ln < y.ln))
  AND x.s <= y.e AND y.s <= x.e
GROUP BY x.l_suppkey
"""


@register("join_interval_overlap", _IVL_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: overlapping transit-interval pairs among its shipments
    (interval = [shipdate, shipdate + 1..14 deterministic days], as days
    since 1992-01-01).

    Uses :func:`interval_join`'s bucketed emit-once shape — equi-join on
    (supplier, 16-day bucket) — so the plan compares only same-bucket pairs
    instead of every same-supplier pair. The DuckDB oracle runs the naive
    inequality join over the identical synthesized intervals.
    """
    from kafka_etl_consumer_spark.operators.joins import interval_join

    epoch = F.lit("1992-01-01").cast("date")
    s = F.datediff(F.col("l_shipdate"), epoch)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        s.alias("s"),
        (s + 1 + (F.col("l_linenumber") * 3 + F.col("l_orderkey")) % 14).alias("e"),
    )
    x = li.select("l_suppkey", F.col("ok").alias("xok"), F.col("ln").alias("xln"),
                  F.col("s").alias("xs"), F.col("e").alias("xe"))
    y = li.select("l_suppkey", F.col("ok").alias("yok"), F.col("ln").alias("yln"),
                  F.col("s").alias("ys"), F.col("e").alias("ye"))
    pairs = interval_join(
        x, y, on=["l_suppkey"],
        left_interval=("xs", "xe"), right_interval=("ys", "ye"),
        bucket_width=16,
    ).filter(
        (F.col("xok") < F.col("yok"))
        | ((F.col("xok") == F.col("yok")) & (F.col("xln") < F.col("yln")))
    )
    return pairs.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_overlap_pairs")
    )


# ---------------------------------------------------------------------------
# corpus-bigram LM familiarity score (the CCNet/KenLM-style quality gate,
# engine-native: the "language model" is the corpus's own bigram table)
# ---------------------------------------------------------------------------

from kafka_etl_consumer_spark.functions.text import word_shingles_sql  # noqa: E402

_LM_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
),
big AS (
  SELECT doc_id, unnest({word_shingles_sql("toks", 2)}) AS g FROM docs
),
bh AS (SELECT doc_id, {hash64_sql("g")} AS gh FROM big),
cnt AS (SELECT gh, count(*) AS c FROM bh GROUP BY gh),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(ln(c)), 6) AS lm_score
  FROM bh JOIN cnt USING (gh) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(sc.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
       sc.lm_score
FROM docs d LEFT JOIN sc USING (doc_id)
"""


@register("text_bigram_lm_score", _LM_ORACLE)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: avg ln(corpus bigram count) per doc.

    Spark side is :func:`operators.nlp.bigram_lm_score` (three-exchange
    skeleton, broadcast-eligible count table); the oracle replays the
    identical tokenize/bigram/hash/count/avg pipeline in SQL.
    """
    from kafka_etl_consumer_spark.operators.nlp import bigram_lm_score

    return bigram_lm_score(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# vocabulary build + OOV scoring (tokenizer-training precursor)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS token FROM docs),
cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
vocab AS (SELECT token FROM cnt ORDER BY c DESC, token ASC LIMIT 512),
pd AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (token) GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       coalesce(pd.n_oov, CAST(0 AS BIGINT)) AS n_oov,
       round(pd.n_oov / CAST(pd.n_tokens AS DOUBLE), 6) AS oov_rate
FROM docs d LEFT JOIN pd USING (doc_id)
"""


@register("text_vocab_oov", _VOCAB_ORACLE)
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-512 vocabulary + per-document OOV rate.

    Spark side is :func:`operators.nlp.vocab_oov_rate` — token counts in
    one map-collapsed hash-agg, TakeOrderedAndProject top-k, broadcast-back
    membership join.
    """
    from kafka_etl_consumer_spark.operators.nlp import vocab_oov_rate

    return vocab_oov_rate(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# temperature-scaled source mixing (the GPT-3/PaLM data-mixing op): per
# source, weight ∝ tokens^alpha with alpha < 1 up-weighting small sources;
# emits the per-source sampling rate that realizes the mix at a target
# token budget. One narrow map + one tiny per-source agg + a one-row
# total broadcast back — nothing here grows with corpus size except the
# first scan.
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.3
_MIX_TARGET = 20_000  # target tokens drawn across the mix

_MIX_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(sum(len({tokens_sql("text")})) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
w AS (SELECT *, pow(n_tokens, {_MIX_ALPHA}) AS wt FROM per_src),
t AS (SELECT sum(wt) AS total_w FROM w)
SELECT source, n_docs, n_tokens,
       round(wt / total_w, 6) AS mix_share,
       round({_MIX_TARGET} * wt / total_w / n_tokens, 6) AS sample_rate
FROM w CROSS JOIN t
"""


@register("corpus_mix_temperature", _MIX_ORACLE)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature mix: share ∝ n_tokens^0.3, plus the sampling
    rate hitting a 20k-token target budget.

    Shuffles: ONE per-source partial+final agg over token counts computed
    in the scan map (size(tokens) — no explode); the weight normalizer is a
    one-row aggregate crossJoin-broadcast back, never a driver collect.
    """
    from kafka_etl_consumer_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
    )
    w = per.withColumn("wt", F.pow("n_tokens", F.lit(_MIX_ALPHA)))
    tot = w.agg(F.sum("wt").alias("total_w"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("wt") / F.col("total_w"), 6).alias("mix_share"),
            F.round(
                F.lit(_MIX_TARGET) * F.col("wt") / F.col("total_w") / F.col("n_tokens"), 6
            ).alias("sample_rate"),
        )
    )


# ---------------------------------------------------------------------------
# time-series motif search: top-k z-normalized Euclidean matches of a fixed
# query pattern over per-user sliding windows of the events value series
# (the MASS/matrix-profile workload class, one-pattern form)
# ---------------------------------------------------------------------------

_MOTIF_M = 8
# query pattern [1..8], z-normalized offline; the literal doubles below are
# embedded verbatim in BOTH plans so the two engines parse identical values
_MOTIF_ZQ = [
    (i - 4.5) / (5.25 ** 0.5) for i in range(1, _MOTIF_M + 1)
]
_ZQ_SQL = "[" + ", ".join(repr(v) for v in _MOTIF_ZQ) + "]"

_MOTIF_ORACLE = f"""
WITH win AS (
  SELECT user_id, event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN CURRENT ROW AND {_MOTIF_M - 1} FOLLOWING) AS w
  FROM events
),
full_w AS (SELECT * FROM win WHERE len(w) = {_MOTIF_M}),
st AS (
  SELECT user_id, event_id, w,
         list_aggregate(w, 'sum') / {_MOTIF_M} AS mu
  FROM full_w
),
sd AS (
  SELECT *, sqrt(list_aggregate(list_transform(w, x -> (x - mu) * (x - mu)),
                                'sum') / {_MOTIF_M}) AS sigma
  FROM st
),
d AS (
  SELECT user_id, event_id,
         round(sqrt(list_aggregate(
           list_transform(w, (x, i) -> pow((x - mu) / sigma - ({_ZQ_SQL})[i], 2)),
           'sum')), 6) AS dist
  FROM sd WHERE sigma > 1e-9
)
SELECT user_id, event_id AS start_event_id, dist
FROM d ORDER BY dist, user_id, start_event_id LIMIT 20
"""


@register("ts_motif_topk", _MOTIF_ORACLE)
def ts_motif_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 sliding windows (per-user, length 8) of the event value
    series nearest to an up-trend pattern under z-normalized Euclidean
    distance — the one-pattern form of matrix-profile/MASS similarity
    search, on DataFrame built-ins.

    Scale shape: ONE user-keyed exchange feeds the window collect; the
    z-normalize + distance math is higher-order array expressions in
    codegen (zero Python); the final cut is TakeOrderedAndProject on the
    ROUNDED distance with a total-order tiebreak — deterministic across
    engines and partitionings. At 100 TB the window collect moves each
    value m times within its user partition — bounded, no pair explosion.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.currentRow, _MOTIF_M - 1)
    )
    qarr = F.array(*[F.lit(v) for v in _MOTIF_ZQ])
    win = ev.select(
        "user_id", "event_id", F.collect_list("value").over(w8).alias("w")
    ).filter(F.size("w") == _MOTIF_M)
    mu = (F.aggregate("w", F.lit(0.0), lambda a, x: a + x) / _MOTIF_M).alias("mu")
    st = win.select("user_id", "event_id", "w", mu)
    sigma = F.sqrt(
        F.aggregate(
            "w", F.lit(0.0), lambda a, x: a + (x - F.col("mu")) * (x - F.col("mu"))
        )
        / _MOTIF_M
    ).alias("sigma")
    sd = st.select("*", sigma).filter(F.col("sigma") > 1e-9)
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    "w",
                    qarr,
                    lambda x, q: F.pow((x - F.col("mu")) / F.col("sigma") - q, F.lit(2.0)),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
        6,
    ).alias("dist")
    return (
        sd.select("user_id", F.col("event_id").alias("start_event_id"), dist)
        .orderBy("dist", "user_id", "start_event_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# event transition matrix: per (event_type -> next event_type) counts and
# row-normalized probabilities over per-user event sequences (the Markov
# view of user behavior; funnel_steps answers "did the path happen",
# this answers "what usually follows what")
# ---------------------------------------------------------------------------

_TRANS_ORACLE = """
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
tot AS (SELECT event_type, sum(n) AS row_n FROM cnt GROUP BY event_type)
SELECT c.event_type, c.next_type, c.n,
       round(c.n / CAST(t.row_n AS DOUBLE), 6) AS p
FROM cnt c JOIN tot t USING (event_type)
"""


@register("event_transition_matrix", _TRANS_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, next_type, n, p): Markov transition counts and
    probabilities over per-user event streams.

    ONE user-keyed exchange feeds the lead(); the pair count is a
    partial+final hash-agg over the tiny (type, type) key space; the row
    normalizer re-aggregates those counts (rows = |types|², trivially
    broadcast for the join). Nothing downstream of the window grows with
    the corpus.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cnt = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    return cnt.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("row_n").cast("double"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# data-quality validation: expectation rules over orders (mixed zero and
# non-zero violation counts so the gate is exercised, not vacuous)
# ---------------------------------------------------------------------------

_VALIDATE_ORACLE = """
SELECT 'rows_scanned' AS rule, CAST(count(*) AS BIGINT) AS n_violations FROM orders
UNION ALL
SELECT 'not_null:o_orderkey', CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'expr:price_positive', CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'expr:price_under_200k', CAST(sum(CASE WHEN NOT (o_totalprice < 200000) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'expr:priority_in_set', CAST(sum(CASE WHEN NOT (o_orderpriority IN
  ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'unique:o_orderkey', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'ref:orders_customer', CAST(count(*) AS BIGINT)
FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
  ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
"""


@register("validate_orders", _VALIDATE_ORACLE)
def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders: null/range/set membership in ONE
    aggregated scan, key uniqueness via one hash-agg, customer referential
    integrity via one anti-join. See :mod:`operators/validate`.
    """
    from kafka_etl_consumer_spark.operators.validate import validate_table

    return validate_table(
        _t(spark, sf_dir, "orders"),
        not_null=["o_orderkey"],
        expr=[
            ("price_positive", "o_totalprice > 0"),
            ("price_under_200k", "o_totalprice < 200000"),
            (
                "priority_in_set",
                "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',"
                "'4-NOT SPECIFIED','5-LOW')",
            ),
        ],
        unique=["o_orderkey"],
        ref=[("orders_customer", "o_custkey", _t(spark, sf_dir, "customer"), "c_custkey")],
    )


# ---------------------------------------------------------------------------
# weighted sampling WITHOUT replacement, fixed k (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

_WRS_ORACLE = f"""
WITH p AS (
  SELECT doc_id, n_chars,
         round(pow(({hash64_sql("CAST(doc_id AS VARCHAR)")} + 0.5) / 1152921504606846976.0,
                   1.0 / CAST(n_chars AS DOUBLE)), 6) AS priority
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, priority
FROM p ORDER BY priority DESC, doc_id ASC LIMIT 64
"""


@register("sample_weighted_reservoir", _WRS_ORACLE)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-64 length-weighted document sample via A-ES priorities
    (:func:`operators.sampling.weighted_reservoir_k`): longer documents
    proportionally likelier, size exact, selection deterministic."""
    from kafka_etl_consumer_spark.operators.sampling import weighted_reservoir_k

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.col("n_chars"), F.col("doc_id").cast("string").alias("__k")
    )
    return weighted_reservoir_k(d, 64, "n_chars", "__k").select(
        "doc_id", "n_chars", "priority"
    )


# ---------------------------------------------------------------------------
# mergeable histogram quantiles (the deterministic scale path for
# percentiles; exact `percentile` buffers whole groups — stats_agg)
# ---------------------------------------------------------------------------

def _hq_col(q: str) -> str:
    return f"""round(max(CASE WHEN before < {q} * n AND {q} * n <= before + c
      THEN lo + (bin + ({q} * n - before) / c) * w END), 6)"""


_HQ_ORACLE = f"""
WITH mm AS (
  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
         max(CAST(l_extendedprice AS DOUBLE)) AS hi,
         count(l_extendedprice) AS n
  FROM lineitem
),
b AS (
  SELECT least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo)
                           / ((hi - lo) / 1000)) AS INT), 999) AS bin,
         lo, hi, n
  FROM lineitem CROSS JOIN mm
),
c AS (SELECT bin, lo, hi, n, count(*) AS c FROM b GROUP BY bin, lo, hi, n),
cum AS (
  SELECT *, sum(c) OVER (ORDER BY bin) - c AS before, (hi - lo) / 1000 AS w
  FROM c
)
SELECT CAST(max(n) AS BIGINT) AS n,
       {_hq_col('0.5')} AS q_0_5,
       {_hq_col('0.95')} AS q_0_95,
       {_hq_col('0.99')} AS q_0_99
FROM cum
"""


@register("quantile_histogram", _HQ_ORACLE)
def quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of l_extendedprice via the 1000-bin mergeable histogram
    sketch (:func:`operators.sketch.histogram_quantiles`) — error ≤ one bin
    width, counters add across partitions/batches, bit-reproducible."""
    from kafka_etl_consumer_spark.operators.sketch import histogram_quantiles

    return histogram_quantiles(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", [0.5, 0.95, 0.99]
    )


# ---------------------------------------------------------------------------
# count-min sketch point queries for the exact top tokens (sketch family:
# theta distinct, histogram quantiles, and now CMS frequencies)
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W, _CMS_K = 4, 256, 10

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest({tokens_sql("text")}) AS token FROM documents
),
top AS (
  SELECT token, CAST(count(*) AS BIGINT) AS true_n
  FROM tok GROUP BY token ORDER BY true_n DESC, token ASC LIMIT {_CMS_K}
),
cells AS (
  SELECT j, {hash64_sql("'cms-' || CAST(j AS VARCHAR) || ':' || token")} % {_CMS_W} AS cell,
         count(*) AS c
  FROM tok CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS j)
  GROUP BY j, cell
)
SELECT t.token, t.true_n,
       CAST(min(c.c) AS BIGINT) AS cms_est
FROM top t
JOIN cells c
  ON c.cell = {hash64_sql("'cms-' || CAST(c.j AS VARCHAR) || ':' || t.token")} % {_CMS_W}
GROUP BY t.token, t.true_n
"""


@register("sketch_cms_tokens", _CMS_ORACLE)
def sketch_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS estimates vs true counts for the corpus's top-10 tokens — the
    1 KiB-state frequency sketch (:func:`operators.sketch.cms_estimate`)
    point-queried at the exact heavy hitters (verification pairing, like
    ngram_jaccard is to minhash)."""
    from kafka_etl_consumer_spark.functions.text import tokens
    from kafka_etl_consumer_spark.operators.sketch import cms_estimate

    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("token"))
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("token"))
        .limit(_CMS_K)
    )
    return cms_estimate(tok, "token", top, _CMS_D, _CMS_W)


# ---------------------------------------------------------------------------
# bloom membership pre-filter with false-positive accounting: src0 tokens
# probed against a bloom of every OTHER source's vocabulary — the constant-
# memory pre-filter that replaces a full semi-join at 100 TB, with its FP
# cost measured against the exact answer
# ---------------------------------------------------------------------------

_BLOOM_M, _BLOOM_K = 4096, 3


def _bloom_pos_sql(j: str, tok: str) -> str:
    expr = "'bloom-' || CAST({j} AS VARCHAR) || ':' || {tok}".format(j=j, tok=tok)
    return f"{hash64_sql(expr)} % {_BLOOM_M}"


_BLOOM_ORACLE = f"""
WITH docs AS (SELECT source, {tokens_sql("text")} AS toks FROM documents),
qtok AS (
  SELECT DISTINCT token FROM (
    SELECT unnest({word_shingles_sql("toks", 2)}) AS token
    FROM docs WHERE source = 'src0'
    UNION ALL
    -- known-absent probes: the bloom's false-positive path must actually
    -- be exercised, and the synthetic corpus shares its whole bigram space
    SELECT 'zz-probe-' || CAST(unnest(range(0, 200)) AS VARCHAR) AS token
  )
),
ctok AS (
  SELECT DISTINCT unnest({word_shingles_sql("toks", 2)}) AS token
  FROM docs WHERE source <> 'src0'
),
js AS (SELECT unnest(range(0, {_BLOOM_K})) AS j),
bits AS (
  SELECT DISTINCT {_bloom_pos_sql("j", "token")} AS bit
  FROM ctok CROSS JOIN js
),
probe AS (
  SELECT q.token, count(b.bit) = {_BLOOM_K} AS bloom_hit
  FROM qtok q CROSS JOIN js
  LEFT JOIN bits b ON b.bit = {_bloom_pos_sql("j", "q.token")}
  GROUP BY q.token
),
truth AS (
  SELECT p.token, p.bloom_hit, (c.token IS NOT NULL) AS true_hit
  FROM probe p LEFT JOIN ctok c USING (token)
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(sum(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits,
       CAST(sum(CASE WHEN bloom_hit AND NOT true_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positives
FROM truth
"""


@register("sketch_bloom_membership", _BLOOM_ORACLE)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filter vs exact semi-join, with measured false positives.

    (n_queries, n_bloom_hits, n_true_hits, n_false_positives): src0's
    distinct word bigrams probed against a 4096-bit/3-hash bloom of the
    other sources' bigrams (:func:`operators.sketch.bloom_bits` /
    :func:`bloom_might_contain`). Bloom never misses a true member
    (n_bloom_hits >= n_true_hits); the FP column is the price of the
    constant memory.
    """
    from kafka_etl_consumer_spark.functions.text import tokens
    from kafka_etl_consumer_spark.operators.sketch import (
        bloom_bits,
        bloom_might_contain,
    )

    d = _t(spark, sf_dir, "documents")
    from kafka_etl_consumer_spark.functions.text import word_shingles

    grams = word_shingles(tokens("text"), 2)
    probes = spark.range(0, 200).select(
        F.concat(F.lit("zz-probe-"), F.col("id").cast("string")).alias("token")
    )
    qtok = (
        d.filter(F.col("source") == "src0")
        .select(F.explode(grams).alias("token"))
        .unionByName(probes)
        .distinct()
    )
    # cached: referenced twice (bloom build + ground-truth join) — uncached
    # the tokenize/shingle/explode/distinct pipeline runs twice end to end
    ctok = (
        d.filter(F.col("source") != "src0")
        .select(F.explode(grams).alias("token"))
        .distinct()
        .cache()
    )
    bits = bloom_bits(ctok, "token", _BLOOM_M, _BLOOM_K)
    probed = bloom_might_contain(qtok, "token", bits, _BLOOM_M, _BLOOM_K)
    truth = probed.join(
        ctok.withColumn("__t", F.lit(1)), "token", "left"
    ).select("bloom_hit", F.col("__t").isNotNull().alias("true_hit"))
    return truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.col("bloom_hit").cast("int")).cast("bigint").alias("n_bloom_hits"),
        F.sum(F.col("true_hit").cast("int")).cast("bigint").alias("n_true_hits"),
        F.sum((F.col("bloom_hit") & ~F.col("true_hit")).cast("int"))
        .cast("bigint")
        .alias("n_false_positives"),
    )


# ---------------------------------------------------------------------------
# graph: triangle count + clustering coefficient over the co-ordered-parts
# graph (edge = two parts appearing in the same order)
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
ends AS (SELECT p1 AS v FROM e UNION ALL SELECT p2 FROM e),
deg AS (SELECT v, count(*) AS d FROM ends GROUP BY v),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vertices,
         CAST(sum(d) / 2 AS BIGINT) AS n_edges,
         CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
  FROM deg
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e ab JOIN e bc ON ab.p2 = bc.p1
            JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2
)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
       round(3.0 * n_triangles / CAST(n_wedges AS DOUBLE), 6) AS global_clustering
FROM base CROSS JOIN tri
"""


@register("graph_triangles", _TRI_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles + global clustering of the parts-co-ordered-together
    graph (:func:`operators.graph.triangle_stats` — see its docstring for
    the degree-orientation refinement that bounds the wedge join at
    100 TB)."""
    from kafka_etl_consumer_spark.operators.graph import triangle_stats

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .distinct()
    )
    return triangle_stats(e)


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (the keyword complement to sim_* embedding search)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["vector", "hash", "join"]
_BM25_K1, _BM25_B = 1.2, 0.75

_BM25_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS d FROM docs),
corpus AS (SELECT count(*) AS n, avg(d) AS avgdl FROM dl),
hits AS (
  SELECT doc_id, t FROM (SELECT doc_id, unnest(toks) AS t FROM docs)
  WHERE t IN ('vector', 'hash', 'join')
),
tf AS (SELECT doc_id, t, count(*) AS tf FROM hits GROUP BY doc_id, t),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id,
         sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * ({_BM25_K1} + 1))
             / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * d / avgdl))) AS s
  FROM tf JOIN dfreq USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


@register("search_bm25_topk", _BM25_ORACLE)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for the query {vector, hash, join} under Okapi
    BM25 (:func:`operators.nlp.bm25_topk`): one query-term-filtered tf
    shuffle, broadcast df/corpus scalars, TakeOrdered cut."""
    from kafka_etl_consumer_spark.operators.nlp import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS)


# ---------------------------------------------------------------------------
# inverted-index build (the index behind BM25), postings fingerprinted
# ---------------------------------------------------------------------------

_IDX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_sql("text")}) AS token FROM documents
),
per_doc AS (
  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY token, doc_id
)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_fp
FROM per_doc GROUP BY token
"""


@register("search_inverted_index", _IDX_ORACLE)
def search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full inverted index over documents (term -> df, cf, postings), the
    posting lists md5-fingerprinted so every list is value-pinned without
    hashing megabytes of arrays. See :func:`operators.nlp.inverted_index`
    for the stopword-skew story."""
    from kafka_etl_consumer_spark.operators.nlp import inverted_index

    idx = inverted_index(_t(spark, sf_dir, "documents"))
    return idx.select(
        "token",
        "df",
        "cf",
        F.md5(
            F.concat_ws(",", F.transform("postings", lambda x: x.cast("string")))
        ).alias("postings_fp"),
    )
