"""Corpus-statistics operators: TF-IDF term ranking and PMI collocation
mining over a document table.

Scale design (100 TB):
- Both operators shuffle on (doc_id, token) / bigram keys — high-cardinality
  keys with map-side partial aggregation, the canonical scalable shape. No
  all-pairs stage anywhere.
- Corpus-level scalars (N docs, total tokens) are 1-row aggregates crossJoin-
  broadcast back — no driver collect, no second scan of the raw text.
- The per-token document-frequency table is joined on the token key; at
  100 TB this is a plain shuffle join (vocabulary >> broadcast threshold);
  Catalyst broadcasts it automatically when it is small.
- ln() is used for idf/pmi; both engines compute IEEE doubles whose ulp
  noise is removed by round(.., 6) before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.text import tokens


def _token_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by raw-count TF × ln(N/df).

    (id, rank, token, score). Deterministic: ties broken by token asc on
    the rounded score.
    """
    toks = _token_table(df, text_col, id_col)
    # tf feeds BOTH the df-count branch and the scoring branch; without a
    # persist Spark recomputes the tokenize+shuffle twice (the two
    # subtrees differ post-optimization, so exchange reuse never fires)
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf")).persist()
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            F.round(
                F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "token", "score")
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information.

    pmi(a,b) = ln( (c_ab/T) / ((c_a/U)·(c_b/U)) ) with c_ab ≥ min_count;
    T = total bigrams, U = total tokens. (w1, w2, n_pair, pmi), ranked by
    (pmi desc, w1, w2) on the rounded score.
    """
    t = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    bigrams = t.select(
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("__toks"),
                    F.slice(F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
                lambda p: p.w2.isNotNull(),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    # uni is consumed 3× (c1 join, c2 join, total) and pair 2× (scoring,
    # total): persist both so the corpus is tokenized exactly once per
    # shape — these are vocabulary/bigram-count sized, orders of magnitude
    # smaller than the corpus, the right things to cache at 100 TB
    uni = (
        _token_table(df, text_col, id_col)
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    pair = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_pair")).persist()
    totals = pair.agg(F.sum("n_pair").alias("__t")).crossJoin(
        uni.agg(F.sum("c").alias("__u"))
    )
    scored = (
        pair.where(F.col("n_pair") >= min_count)
        .join(uni.withColumnRenamed("token", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("token", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("__t"))
                    / ((F.col("c1") / F.col("__u")) * (F.col("c2") / F.col("__u")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # global top-k: orderBy+limit compiles to TakeOrderedAndProject (per-
    # partition heaps + driver merge of k rows), not a 1-partition window
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document corpus-bigram familiarity score — the engine-native
    form of the CCNet/KenLM-style LM quality filter: documents whose word
    bigrams are common across the corpus read as fluent prose; documents of
    rare transitions (gibberish, boilerplate soup, wrong-language) score
    low and get gated before training.

    score = round(avg over the doc's bigrams of ln(corpus count), 6);
    (id, n_bigrams, lm_score), lm_score NULL when the doc has < 2 tokens.

    Scale shape (100 TB): tokenize+bigram is a narrow map over docs
    repartitioned ONCE by id; the bigram-frequency table is one hash-agg on
    the 8-byte gram hash (map-side partial collapse); the count join is
    broadcast when the vocabulary is small, else a plain shuffle join on
    the hash; the final per-doc avg reuses the id partitioning. Same
    three-exchange skeleton as ``remove_duplicate_spans``.
    """
    from kafka_etl_consumer_spark.functions.hashing import hash64
    from kafka_etl_consumer_spark.functions.text import word_shingles
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    width = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        ensure_min_parallelism(df)
        .repartition(width, id_col)
        .select(id_col, tokens(text_col).alias("__toks"))
    )
    occ = docs.select(
        F.col(id_col), F.explode(word_shingles("__toks", 2)).alias("__g")
    ).select(F.col(id_col), hash64(F.col("__g")).alias("__gh"))
    cnt = occ.groupBy("__gh").count()
    sc = (
        occ.join(cnt, "__gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log("count")), 6).alias("lm_score"),
        )
    )
    return docs.join(sc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.col("lm_score"),
    )


def vocab_oov_rate(
    df: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build the corpus top-``vocab_size`` token vocabulary (count desc,
    token asc on ties — a total order, so the cut is deterministic) and
    score every document's out-of-vocabulary rate against it. The
    tokenizer-training precursor: OOV rate against a trial vocabulary is
    the standard signal for sizing it, and high-OOV docs are quality/
    wrong-language outliers.

    Returns (id, n_tokens, n_oov, oov_rate) — rate NULL for empty docs.

    Scale shape (100 TB): token counts are ONE hash-agg on the token
    (map-side partial collapse); top-k plans as TakeOrderedAndProject
    (per-partition heaps, driver merges partitions×k rows — never a global
    sort); the k-row vocabulary broadcasts back; the per-doc agg reuses the
    id partitioning. The corpus shuffles once, as counts.
    """
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    width = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        ensure_min_parallelism(df)
        .repartition(width, id_col)
        .select(id_col, tokens(text_col).alias("__toks"))
    )
    tok = docs.select(F.col(id_col), F.explode("__toks").alias("token"))
    vocab = (
        tok.groupBy("token")
        .count()
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(vocab_size)
        .select("token", F.lit(1).alias("__in"))
    )
    pd_ = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("__in").isNull(), 1)).alias("n_oov"),
        )
    )
    return docs.join(pd_, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        F.round(F.col("n_oov") / F.col("n_tokens").cast("double"), 6).alias("oov_rate"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical retrieval: top-k documents for a bag-of-words query —
    the keyword-search complement to the embedding ANN family (Okapi BM25,
    the standard lexical ranking function; idf uses the +1 'BM25+'-style
    floor so common terms never go negative).

    Returns (id, score) with score rounded to 6 (ordering ties broken by
    id, so the cut is deterministic cross-engine).

    Scale shape: ZERO data-scale shuffles and exactly TWO corpus passes.
    The query terms are literals, so per-doc term frequencies are in-row
    higher-order functions over the token array
    (``size(filter(toks, t == term))`` — whole-stage codegen, no
    explode); every global the scorer needs (N, avgdl, per-term df) is
    ONE single-row aggregate crossJoin-broadcast back; the cut is
    TakeOrderedAndProject. The earlier explode→(doc, term) hash-agg
    form paid THREE tokenize passes (corpus scalars, hits, dl join)
    plus a hits shuffle. Docs containing none of the terms never reach
    the ranking (score would be 0), matching the tf-rows-only semantics
    of the SQL oracles.
    """
    # An empty query has no scorable docs; duplicated terms contribute
    # once (the classic bag-of-words (doc, term)-distinct semantics the
    # earlier explode form had) — dedupe order-preserving.
    query_terms = list(dict.fromkeys(query_terms))
    if not query_terms:
        return (
            df.select(F.col(id_col), F.lit(0.0).alias("score"))
            .limit(0)
        )
    docs = df.select(F.col(id_col), tokens(text_col).alias("__toks"))

    def _tf(term: str):
        # factory closure: a default-arg lambda would grow a second
        # parameter, which F.filter would read as the (element, index)
        # two-arg form and silently compare tokens against indices
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(term)))

    tf_cols = [
        _tf(term).alias(f"__tf_{i}") for i, term in enumerate(query_terms)
    ]
    per_doc = docs.select(
        F.col(id_col), F.size("__toks").alias("__dl"), *tf_cols
    )
    # ONE single-row aggregate for every global the scorer needs (N,
    # avgdl, per-term df) — the stats branch and the scorer branch are
    # then the only two corpus passes in the whole plan
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("bigint")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )

    def _idf(i: int):
        return F.log(
            (F.col("__n") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
            + 1.0
        )

    def _sat(i: int):
        return (F.col(f"__tf_{i}") * (k1 + 1)) / (
            F.col(f"__tf_{i}")
            + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        )

    contrib = [
        F.when(F.col(f"__tf_{i}") > 0, _idf(i) * _sat(i)).otherwise(F.lit(0.0))
        for i in range(len(query_terms))
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    scored = (
        per_doc.filter(
            sum(
                (F.col(f"__tf_{i}") > 0).cast("int")
                for i in range(len(query_terms))
            )
            > 0
        )
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.round(total, 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col(id_col).asc()).limit(k)


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the inverted index behind :func:`bm25_topk`: one row per term
    with document frequency, collection frequency, and the sorted posting
    list (as an array — fingerprint it for compact verification).

    Returns (token, df, cf, postings: array<id>).

    Scale shape: ONE (doc, term) shuffle keyed by the term; tf pairs
    collapse map-side first so the exchange carries distinct (doc, term)
    rows + counts. The skew risk is the stopword row — its posting list is
    ~every document. At 100 TB: drop terms above a df threshold to a
    df/cf-only sidecar (they're useless for retrieval anyway — BM25's idf
    floors them to ~0) or shard postings by hash(doc) range; here the full
    list is kept so the oracle can pin it exactly.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    per_doc = tok.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("__tf"))
    return per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("__tf").cast("bigint").alias("cf"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
    )


# ---------------------------------------------------------------------------
# Shared keyword-extraction substrate (round 9, VERDICT r8 item 6):
# RAKE (queries_pipeline42) and TextRank (queries_pipeline43) — and any
# future extractor (YAKE, position-weighted TextRank) — share one
# definition of "content token" and one positional token grid. Before
# this refactor each query re-derived its own grid CTE; a change to the
# delimiter rule now has exactly one Spark-side place to land (the
# DuckDB oracles keep their own unrolled CTEs by design — an oracle must
# stay independent of engine helpers).
# ---------------------------------------------------------------------------

# 22-word stopword list shared by every keyword extractor; a token is a
# DELIMITER when it is a stopword or contains any non-letter (digits,
# punctuation-bearing tokens) — Rose et al. 2010's candidate-phrase rule.
KEYWORD_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "with", "is", "are", "was", "be", "as", "by", "at", "it",
    "this", "that", "from",
]


def keyword_token_grid(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    case_sensitive: bool = False,
) -> DataFrame:
    """Positional token grid with the shared delimiter flag:
    ``(id_col, i, t, is_delim)`` — one posexplode per document, the
    common substrate of every keyword extractor. With
    ``case_sensitive=True`` (the YAKE variant, VERDICT r9 item 4) an
    extra ``raw`` column carries the ORIGINAL-case token while ``t``
    and ``is_delim`` stay lowercase-normalized, so casing-aware
    features see capitals without changing any other extractor's
    tokenization (the default output schema is unchanged). Scale: the
    explode is data-proportional and everything downstream partitions
    by document or by vocabulary key; no token self-join exists
    anywhere on this path."""
    if case_sensitive:
        raws = F.split(F.trim(F.col(text_col)), r"\s+")
        tk = df.select(
            F.col(id_col),
            F.posexplode(F.filter(raws, lambda t: F.length(t) > 0)).alias(
                "i", "raw"
            ),
        ).withColumn("t", F.lower(F.col("raw")))
    else:
        tk = df.select(
            F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("i", "t")
        )
    is_delim = (
        F.col("t").isin(KEYWORD_STOPWORDS) | F.col("t").rlike("[^a-z]")
    ).cast("int")
    return tk.withColumn("is_delim", is_delim)


def phrase_members(grid: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """RAKE candidate-phrase membership: maximal content-token runs
    between delimiters, identified per document by the prefix count of
    delimiters seen so far. Returns ``(id_col, p, i, t)`` where ``p``
    is the run id. The window is per-document (bounded by document
    length), never global."""
    w = (
        Window.partitionBy(id_col)
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pid = grid.withColumn("p", F.sum("is_delim").over(w))
    return pid.filter(F.col("is_delim") == 0).select(id_col, "p", "i", "t")


def adjacent_content_pairs_directed(
    grid: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """YAKE dispersion edges: DIRECTED, per-occurrence (non-distinct)
    pairs of content tokens adjacent in the original stream — ``(u, v)``
    with v immediately following u, a delimiter breaking adjacency
    exactly as in :func:`adjacent_content_pairs`. Duplicates are KEPT
    (YAKE's left/right dispersion is distinct-neighbors over TOTAL
    neighbor occurrences) and so are equal-token pairs. One lag window
    per document, no token self-join."""
    w = Window.partitionBy(id_col).orderBy("i")
    kept = F.col("is_delim") == 0
    adj = grid.select(
        "t",
        kept.alias("k"),
        F.lag("t").over(w).alias("pt"),
        F.lag(kept).over(w).alias("pk"),
    ).filter(F.col("k") & F.col("pk"))
    return adj.select(F.col("pt").alias("u"), F.col("t").alias("v"))


def adjacent_content_pairs(grid: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """TextRank co-occurrence edges: unordered distinct pairs of content
    tokens ADJACENT in the original stream — a delimiter between two
    content words breaks adjacency, exactly the boundary RAKE splits
    phrases on. Returns ``(u, v)`` with u < v, one lag window per
    document (no token self-join)."""
    w = Window.partitionBy(id_col).orderBy("i")
    kept = F.col("is_delim") == 0
    adj = grid.select(
        "t",
        kept.alias("k"),
        F.lag("t").over(w).alias("pt"),
        F.lag(kept).over(w).alias("pk"),
    ).filter(F.col("k") & F.col("pk") & (F.col("t") != F.col("pt")))
    return adj.select(
        F.least("t", "pt").alias("u"), F.greatest("t", "pt").alias("v")
    ).distinct()
