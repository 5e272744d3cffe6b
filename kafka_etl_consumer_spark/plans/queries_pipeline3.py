"""Query surface batch 6: corpus-preparation round 3 — overlapping
token-window chunking and benchmark n-gram decontamination.

Chunking is the pre-tokenization step before sequence packing
(pack_sequences); decontamination is the eval-overlap scrub every training
corpus runs. Both carry exact DuckDB oracles built from the shared token /
shingle / hash builders (functions/text.py, functions/hashing.py) so the
formulas are provably identical across engines.

The reference has no text surface (pass-through ETL, ETLTask.java:261-283).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64_sql
from kafka_etl_consumer_spark.functions.text import tokens_sql, word_shingles_sql
from kafka_etl_consumer_spark.operators import chunking as C
from kafka_etl_consumer_spark.plans.registry import _t, register

_TOK = tokens_sql("text")

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) > {_CHUNK_SIZE}
                      THEN range(1, len(toks) - {_CHUNK_SIZE - _CHUNK_STRIDE} + 1,
                                 {_CHUNK_STRIDE})
                      ELSE [1] END AS starts
          FROM t),
    ex AS (SELECT doc_id, toks, unnest(starts) AS start FROM s)
    SELECT doc_id,
           CAST((start - 1) // {_CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(len(toks[start : start + {_CHUNK_SIZE - 1}]) AS INTEGER) AS n_tokens,
           array_to_string(toks[start : start + {_CHUNK_SIZE - 1}], ' ') AS chunk_text
    FROM ex
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 64, stride 48) of every
    document — one row per chunk with its reconstructed text.

    Narrow map + posexplode generator, no shuffle at any scale
    (operators/chunking.chunk_documents). Chunk starts are arithmetic
    (1 + i*stride) so the oracle recovers chunk_idx without ordinality.
    """
    return C.chunk_documents(
        _t(spark, sf_dir, "documents"), size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )


_BENCH_MOD = 20  # doc_id % 20 == 0 plays the held-out benchmark corpus
_CONTAM_K = 3
_CONTAM_THRESHOLD = 8


@register(
    "decontaminate_ngrams",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    s AS (SELECT doc_id, {word_shingles_sql("toks", _CONTAM_K)} AS sh FROM t),
    ex AS (SELECT DISTINCT doc_id, {hash64_sql("g")} AS gh
           FROM (SELECT doc_id, unnest(sh) AS g FROM s)),
    bench AS (SELECT DISTINCT gh FROM ex WHERE doc_id % {_BENCH_MOD} = 0),
    train AS (SELECT * FROM ex WHERE doc_id % {_BENCH_MOD} != 0)
    SELECT t.doc_id,
           CAST(count(b.gh) AS BIGINT) AS n_shared,
           count(b.gh) >= {_CONTAM_THRESHOLD} AS contaminated
    FROM train t LEFT JOIN bench b ON t.gh = b.gh
    GROUP BY t.doc_id
    """,
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    distinct word 3-grams shared with the benchmark split (doc_id % 20
    == 0 plays the eval set) and a contaminated flag at >= 8 shared.

    Bench gram-hash set is broadcast (eval sets are small by nature), so
    the train side never shuffles for the join; grams travel as 60-bit
    md5 hashes, not strings (operators/chunking.ngram_contamination).
    """
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(_BENCH_MOD)) == 0)
    train = docs.where(F.pmod(F.col("doc_id"), F.lit(_BENCH_MOD)) != 0)
    return C.ngram_contamination(
        train, bench, k=_CONTAM_K, threshold=_CONTAM_THRESHOLD
    )


# ---------------------------------------------------------------------------
# PageRank (iterative link analysis over a deterministic synthetic graph)
# ---------------------------------------------------------------------------

_PR_ITERS = 5


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Exact power-iteration oracle: each round unrolled as one CTE."""
    pre = """
    WITH n AS (SELECT count(*) AS ni, CAST(count(*) AS DOUBLE) AS nd FROM documents),
    v AS (SELECT doc_id AS id FROM documents),
    e AS (SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src,
                   unnest([(doc_id*7+1) % ni, (doc_id*13+2) % ni,
                           (doc_id*29+3) % ni]) AS dst
            FROM documents, n)),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),
    r0 AS (SELECT id, 1.0/nd AS r FROM v, n)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f""",
    r{i} AS (SELECT v.id, 0.15/n.nd + 0.85*coalesce(sum(t.c), 0) AS r
         FROM v CROSS JOIN n
         LEFT JOIN (SELECT e.dst, r{i-1}.r / deg.outdeg AS c
                    FROM e JOIN deg USING (src)
                    JOIN r{i-1} ON r{i-1}.id = e.src) t ON t.dst = v.id
         GROUP BY v.id, n.nd)""")
    return (
        pre
        + "".join(rounds)
        + f"\n    SELECT id AS doc_id, round(r, 9) AS rank FROM r{iters}"
    )


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 damped power iterations) over a deterministic synthetic
    link graph on doc_ids (3 modular out-links per doc — reproducible in
    SQL, no self-loops for even N), via operators/graph.pagerank.

    Fully lazy plan: N is a broadcast one-row count, each round is one
    src-keyed join + one dst-keyed partial+final sum. Ranks rounded at 9
    decimals in both engines — absorbs summation-order float drift while
    still pinning every rank to ~1e-10. The exact oracle unrolls the same
    5 rounds as chained CTEs.
    """
    from kafka_etl_consumer_spark.operators.graph import pagerank

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
    ranks = pagerank(edges, docs, iterations=_PR_ITERS, id_col="doc_id")
    return ranks.select("doc_id", F.round("rank", 9).alias("rank"))


# ---------------------------------------------------------------------------
# Token-budget corpus selection (per-language training-mix knapsack)
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 3000


@register(
    "corpus_token_budget",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, text, {_TOK} AS toks FROM documents),
    raw AS (SELECT doc_id, lang, len(toks) AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                        AS DOUBLE) / length(text) AS draw,
                   CAST(len(list_filter(toks,
                            t -> t IN ('the','a','of','and','in','to','is'))) AS DOUBLE)
                        / len(toks) AS sraw
            FROM tok),
    q AS (SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
                 round(least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                       * (1 - draw) * (0.5 + 0.5 * least(1.0, sraw * 5)), 6) AS quality
          FROM raw),
    s AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang
                         ORDER BY quality DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM q)
    SELECT lang, doc_id, n_tokens, quality, cum_tokens
    FROM s WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget selection: greedily keep the highest-
    quality documents of each language until a 3000-token budget fills —
    the training-mix composition step after cleaning/dedup.

    The selection key is the ROUNDED quality score (identical across
    engines, ties broken by doc_id) so the greedy order is deterministic.
    One lang-keyed shuffle; the running total and the budget cut happen
    inside the window pass. At 100 TB the budget cut-off makes this a
    WindowGroupLimit-like early stop per language partition.
    """
    from kafka_etl_consumer_spark.operators.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs, keep_cols=("lang",))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("lang", "doc_id", "n_tokens", "quality", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test corpus split
# ---------------------------------------------------------------------------


@register(
    "split_train_val_test",
    oracle="""
    WITH b AS (SELECT lang,
                      CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)),
                                           1, 15)) AS BIGINT) % 100 AS bucket,
                      length(text) AS n_chars
               FROM documents)
    SELECT lang,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM b GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split: every document's split
    is a pure function of its id (salted md5 bucket), so the assignment
    survives reruns, retries, engine swaps, and incremental corpus
    growth — the property rand()-based splitters lack and leakage audits
    require. Output: per (lang, split) doc and char accounting.

    Narrow map + one partial-combining rollup; no shuffle before it.
    """
    from kafka_etl_consumer_spark.functions.hashing import hash64

    docs = _t(spark, sf_dir, "documents")
    bucket = hash64(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"), F.length("text").alias("n_chars"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )
