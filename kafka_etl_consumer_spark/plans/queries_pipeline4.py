"""Query surface batch 8: corpus-preparation round 4 — dedup DECISIONS
(canonical keeper per near-dup cluster), fixed-size per-stratum sampling,
and the web-scrape hygiene trio (URL parsing, HTML stripping, Unicode
normalization).

These close the loop from the batch-3 evidence operators (pair emitters)
to the verdicts a pipeline acts on, plus the text-cleaning passes that run
BEFORE quality scoring on web-scraped corpora. Every query carries an
exact DuckDB oracle; the reference has no text surface at all
(pass-through ETL, ETLTask.java:261-283 of the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64_sql
from kafka_etl_consumer_spark.operators import dedup as D
from kafka_etl_consumer_spark.operators import text as X
from kafka_etl_consumer_spark.operators.sampling import group_reservoir
from kafka_etl_consumer_spark.plans.queries_pipeline import (
    _MINHASH_COEFF_VALUES,
    _SH_CTES,
)
from kafka_etl_consumer_spark.plans.registry import _t, register
from kafka_etl_consumer_spark.functions.text import tokens_sql as _tok_sql
from kafka_etl_consumer_spark.operators.text import STOPWORDS as _STOPWORDS

# ---------------------------------------------------------------------------
# dedup decisions: pairs -> components -> one canonical keeper per cluster
# ---------------------------------------------------------------------------

# same pair-generation CTEs as the dedup_minhash oracle (same coefficients,
# same band keys), extended with the recursive-CTE component fixpoint and
# the per-component argmax pick — so Spark's 6-round pointer jumping AND
# the window pick are both hash-checked against the true answer.
_CANONICAL_ORACLE = _SH_CTES.replace("WITH ", "WITH RECURSIVE ", 1) + f""",
    hb AS (SELECT doc_id, ({hash64_sql('shingle')} % 2147483647) AS base FROM sh),
    hx AS (SELECT doc_id, hp.h AS h, min((base * hp.a + hp.b) % 2147483647) AS m
           FROM hb CROSS JOIN (VALUES {_MINHASH_COEFF_VALUES}) AS hp(h, a, b)
           GROUP BY doc_id, hp.h),
    bk AS (SELECT doc_id,
                  md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY h)
                      || ',' || CAST(h // 3 AS VARCHAR)) AS band_key
           FROM hx GROUP BY doc_id, h // 3),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bk a JOIN bk b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (SELECT id_a, id_b
              FROM (SELECT id_a, id_b, count(*) AS n_inter
                    FROM cand
                    JOIN sh a ON a.doc_id = id_a
                    JOIN sh b ON b.doc_id = id_b AND b.shingle = a.shingle
                    GROUP BY id_a, id_b) i
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS u, doc_id AS r FROM documents
        UNION
        SELECT reach.u, sym.v FROM reach JOIN sym ON sym.u = reach.r),
    lab AS (SELECT u AS doc_id, min(r) AS component_id FROM reach GROUP BY u)
    SELECT d.doc_id, lab.component_id,
           CAST(count(*) OVER (PARTITION BY lab.component_id) AS BIGINT) AS n_members,
           (row_number() OVER (PARTITION BY lab.component_id
                               ORDER BY d.n_chars DESC, d.doc_id ASC)) = 1
               AS is_canonical
    FROM documents d JOIN lab ON d.doc_id = lab.doc_id
    """


@register("dedup_canonical_pick", oracle=_CANONICAL_ORACLE)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup VERDICT: MinHash-LSH pairs (Jaccard >= 0.5)
    -> connected components -> exactly one canonical keeper per cluster
    (highest n_chars, ties to the smallest doc_id). ``is_canonical`` is
    the keep/drop decision a corpus build filters on.

    Scale: the pair stage is the bucketed LSH path (no all-pairs),
    components carry one (doc, label) row per document, and the pick is a
    WindowGroupLimit-pruned rank — see operators/dedup.canonical_pick.
    """
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, k=3, num_hashes=24, bands=8, rows_per_band=3, threshold=0.5
    )
    # Operator defaults (optimization r10): the star-contraction loop
    # stops at its exact fixpoint probe (the sf0.1 pair graph stops at
    # round 2 of the 12-round safety cap — one productive round plus the
    # confirming no-change round), and the loop's shuffle width is sized
    # from the materialized pair count instead of a hand-pinned 8 —
    # scale-adaptive at any corpus size.
    return D.canonical_pick(pairs, docs, quality_col="n_chars")


# ---------------------------------------------------------------------------
# fixed-size per-stratum sampling
# ---------------------------------------------------------------------------

_RESERVOIR_K = 20
_RES_ORDER = (
    f"{hash64_sql('CAST(event_id AS VARCHAR)')} ASC, CAST(event_id AS VARCHAR) ASC"
)


@register(
    "sample_reservoir_group",
    oracle=f"""
    SELECT event_id, event_type, value,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY {_RES_ORDER})
                AS INT) AS sample_rank
    FROM events
    QUALIFY sample_rank <= {_RESERVOIR_K}
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 events per event_type, picked by deterministic hash rank
    — the fixed-SIZE sampling a per-class eval slice or few-shot pool
    needs (vs sample_stratified's fixed-RATE keep). Same rows every
    run/engine/retry; rank<=k plans as WindowGroupLimit so map tasks
    pre-prune a hot stratum before the shuffle."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return group_reservoir(
        ev, "event_type", _RESERVOIR_K, F.col("event_id").cast("string")
    )


# ---------------------------------------------------------------------------
# web-scrape hygiene: URL parsing, HTML stripping, Unicode normalization
# ---------------------------------------------------------------------------

# Deterministic synthetic URL per event (the testdata has no URL column):
# host carries the event_type + a shard digit, path the event id, and the
# query string two parameters — enough surface for every parse_url part.
_URL_SQL = (
    "'https://' || event_type || CAST(user_id % 5 AS VARCHAR) || "
    "'.example.com/p/' || CAST(event_id AS VARCHAR) || "
    "'?u=' || CAST(user_id AS VARCHAR) || '&typ=' || event_type"
)


@register(
    "url_funcs",
    oracle=f"""
    WITH u AS (SELECT event_id, {_URL_SQL} AS url
               FROM events WHERE event_id % 10 = 0)
    SELECT event_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]u=([^&]*)', 1) AS param_u
    FROM u
    """,
)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition family (protocol/host/path/query/named param) via
    ``parse_url`` — the crawl-metadata extraction web corpora run for
    domain-level filtering and per-site accounting. JVM codegen, narrow
    map, no shuffle; the oracle recovers the identical parts with anchored
    RE2 regexes."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("event_type"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".example.com/p/"),
        F.col("event_id").cast("string"),
        F.lit("?u="),
        F.col("user_id").cast("string"),
        F.lit("&typ="),
        F.col("event_type"),
    )
    return ev.select(
        "event_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("u")).alias("param_u"),
    )


# Synthetic HTML wrapper: headline from source, body from text, plus the
# five core entities so the unescape chain is exercised.
_HTML_TAIL = " &amp; <b>more</b> &lt;tags&gt; &quot;q&#39;s&quot;</p>"


@register(
    "text_html_strip",
    oracle=f"""
    WITH h AS (SELECT doc_id,
                      '<html><body><h1>' || source || '</h1>' || chr(10) ||
                      '<p>' || text || '{_HTML_TAIL}'
                      || chr(10) || '</body></html>' AS html
               FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id,
           CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT) AS n_tags,
           trim(regexp_replace(
               replace(replace(replace(replace(replace(
                   regexp_replace(html, '<[^>]*>', ' ', 'g'),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', ''''), '&amp;', '&'),
               '\\s+', ' ', 'g')) AS plain
    FROM h
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> plain text: count + strip tags, unescape the core entities
    (&amp; decoded last — no double-unescape), collapse whitespace. The
    boilerplate-removal pass before quality scoring on web scrapes. All
    JVM regexp/replace codegen, narrow map (operators/text.html_strip)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit(_HTML_TAIL + "\n</body></html>"),
    )
    return X.html_strip(docs.withColumn("html", html), "html")


# NFC test vector: 'e' + U+0301 (combining acute) normalizes to U+00E9;
# two BEL control chars and doubled spaces exercise the strip + collapse.
_DIRTY_PREFIX = "Café  \x07bell\x07 "


@register(
    "text_unicode_clean",
    oracle=f"""
    WITH d AS (SELECT doc_id, '{_DIRTY_PREFIX}' || substr(text, 1, 40) AS dirty
               FROM documents WHERE doc_id % 5 = 1),
    c AS (SELECT doc_id, dirty,
                 trim(regexp_replace(regexp_replace(nfc_normalize(dirty),
                      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                      '\\s+', ' ', 'g')) AS clean
          FROM d)
    SELECT doc_id,
           CAST(length(dirty) AS INT) AS n_chars_raw,
           CAST(length(clean) AS INT) AS n_chars_clean,
           clean
    FROM c
    """,
)
def text_unicode_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding hygiene: NFC-normalize combining sequences (é as ONE code
    point, so fingerprints and tokenizers see canonical bytes), strip
    control characters, collapse whitespace. NFC runs in an Arrow-batched
    pandas UDF (Spark SQL has no normalization builtin); everything else
    stays JVM-side (operators/text.unicode_clean)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 1)
    dirty = F.concat(F.lit(_DIRTY_PREFIX), F.substring("text", 1, 40))
    return X.unicode_clean(docs.withColumn("dirty", dirty), "dirty")


# ---------------------------------------------------------------------------
# incremental dedup: a new batch checked against the existing corpus
# ---------------------------------------------------------------------------

_NEW_MOD = 10  # doc_id % 10 == 7 plays the arriving batch


@register(
    "dedup_incremental_minhash",
    oracle=_SH_CTES + f""",
    hb AS (SELECT doc_id, ({hash64_sql('shingle')} % 2147483647) AS base FROM sh),
    hx AS (SELECT doc_id, hp.h AS h, min((base * hp.a + hp.b) % 2147483647) AS m
           FROM hb CROSS JOIN (VALUES {_MINHASH_COEFF_VALUES}) AS hp(h, a, b)
           GROUP BY doc_id, hp.h),
    bk AS (SELECT doc_id,
                  md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY h)
                      || ',' || CAST(h // 3 AS VARCHAR)) AS band_key
           FROM hx GROUP BY doc_id, h // 3),
    cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
             FROM bk n JOIN bk o ON n.band_key = o.band_key
             WHERE n.doc_id % {_NEW_MOD} = 7 AND o.doc_id % {_NEW_MOD} != 7),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    jac AS (SELECT new_id, old_id,
                   CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
            FROM (SELECT new_id, old_id, count(*) AS n_inter
                  FROM cand
                  JOIN sh a ON a.doc_id = new_id
                  JOIN sh b ON b.doc_id = old_id AND b.shingle = a.shingle
                  GROUP BY new_id, old_id) i
            JOIN sizes sa ON sa.doc_id = new_id
            JOIN sizes sb ON sb.doc_id = old_id),
    hits AS (SELECT * FROM jac WHERE jaccard >= 0.5)
    SELECT d.doc_id,
           CAST(count(h.old_id) AS BIGINT) AS n_dups,
           round(max(h.jaccard), 6) AS max_jaccard,
           count(h.old_id) > 0 AS is_dup
    FROM (SELECT doc_id FROM documents WHERE doc_id % {_NEW_MOD} = 7) d
    LEFT JOIN hits h ON h.new_id = d.doc_id
    GROUP BY d.doc_id
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: documents with doc_id % 10 == 7 play the
    arriving batch; every one is checked against the REST of the corpus
    via LSH band-bucket matching + exact-Jaccard verify (>= 0.5), and
    flagged (n_dups, max_jaccard, is_dup). No batch×batch or corpus×corpus
    pairs are formed — only cross-set, which is what a live pipeline pays
    per batch (operators/dedup.minhash_lsh_matches_against; at 100 TB the
    corpus band index is persisted, not recomputed)."""
    docs = _t(spark, sf_dir, "documents")
    is_new = F.pmod(F.col("doc_id"), F.lit(_NEW_MOD)) == 7
    matches = D.minhash_lsh_matches_against(
        docs.filter(is_new), docs.filter(~is_new),
        k=3, num_hashes=24, bands=8, rows_per_band=3, threshold=0.5,
    )
    return (
        docs.filter(is_new)
        .select(F.col("doc_id"))
        .join(matches.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("old_id").alias("n_dups"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
            (F.count("old_id") > 0).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic corpus shuffle + sharding (training export order)
# ---------------------------------------------------------------------------

_N_SHARDS = 8


@register(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH h AS (SELECT doc_id, lang,
                      {hash64_sql("'shuf-' || CAST(doc_id AS VARCHAR)")} AS hkey
               FROM documents)
    SELECT doc_id, lang,
           CAST(hkey % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hkey % {_N_SHARDS}
                                   ORDER BY hkey, doc_id) AS INT) AS pos_in_shard
    FROM h
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: order documents by a cryptographic
    hash of their id (a fixed random-looking permutation — same on every
    run, engine, and task retry, unlike rand()) and deal them into 8
    shards with an explicit position. This is the export step before
    training: data order affects the run, so the shuffle must be
    REPRODUCIBLE. At 100 TB: shard = pmod(hash, N) is a narrow map and
    the in-shard position is one range-partitioned sort per shard —
    Spark's Window over (shard) with a hash sort key, no global sort."""
    from kafka_etl_consumer_spark.functions.hashing import hash64
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    hkey = hash64(F.concat(F.lit("shuf-"), F.col("doc_id").cast("string")))
    shard = F.pmod(hkey, F.lit(_N_SHARDS))
    w = Window.partitionBy(shard).orderBy(hkey.asc(), F.col("doc_id").asc())
    return docs.select(
        "doc_id",
        "lang",
        shard.alias("shard"),
        F.row_number().over(w).alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# LSH recall audit: the approximate path measured against exact ground truth
# ---------------------------------------------------------------------------


@register(
    "dedup_lsh_recall",
    oracle=_SH_CTES + f""",
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    exact AS (SELECT i.id_a, i.id_b
              FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                    FROM sh a JOIN sh b
                      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2) i
              JOIN sizes sa ON sa.doc_id = i.id_a
              JOIN sizes sb ON sb.doc_id = i.id_b
              WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.5),
    hb AS (SELECT doc_id, ({hash64_sql('shingle')} % 2147483647) AS base FROM sh),
    hx AS (SELECT doc_id, hp.h AS h, min((base * hp.a + hp.b) % 2147483647) AS m
           FROM hb CROSS JOIN (VALUES {_MINHASH_COEFF_VALUES}) AS hp(h, a, b)
           GROUP BY doc_id, hp.h),
    bk AS (SELECT doc_id,
                  md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY h)
                      || ',' || CAST(h // 3 AS VARCHAR)) AS band_key
           FROM hx GROUP BY doc_id, h // 3),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bk a JOIN bk b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM exact e
                 JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b) AS BIGINT)
               AS n_found,
           round(CAST((SELECT count(*) FROM exact e
                       JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b) AS DOUBLE)
                 / (SELECT count(*) FROM exact), 6) AS recall
    """,
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the scale path against ground truth: what fraction
    of TRUE near-dup pairs (exact all-pairs Jaccard >= 0.5, the quadratic
    verification path) land in an LSH band bucket together. One row:
    (n_exact, n_found, recall). With (24 hashes, 8x3 bands) the expected
    candidate probability at j=0.5 is ~0.66 and rises steeply with j —
    the audit makes the approximation error a MEASURED number, not a
    hope. Run it on a sample at 100 TB (the exact side is quadratic; the
    LSH side is the production path)."""
    docs = _t(spark, sf_dir, "documents")
    exact = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5).select("id_a", "id_b")
    sig = D.minhash_signatures(docs, k=3, num_hashes=24)
    bk = D.band_keys(sig, bands=8, rows_per_band=3)
    a = bk.select(F.col("doc_id").alias("id_a"), "band_key")
    b = bk.select(F.col("doc_id").alias("id_b"), "band_key")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    hit = exact.join(cand, ["id_a", "id_b"])
    return exact.agg(F.count("*").alias("n_exact")).crossJoin(
        hit.agg(F.count("*").alias("n_found"))
    ).select(
        "n_exact",
        "n_found",
        F.round(F.col("n_found").cast("double") / F.col("n_exact"), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# quality-weighted deterministic sampling
# ---------------------------------------------------------------------------


_TOKQ = _tok_sql("text")
_STOPLIST = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS))


@register(
    "sample_weighted_quality",
    oracle=f"""
    WITH tok AS (SELECT doc_id, text, {_TOKQ} AS toks FROM documents),
    raw AS (SELECT doc_id, len(toks) AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                        AS DOUBLE) / length(text) AS draw,
                   CAST(len(list_filter(toks, t -> t IN ({_STOPLIST}))) AS DOUBLE)
                        / len(toks) AS sraw
            FROM tok),
    q AS (SELECT doc_id,
                 round(least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                       * (1 - draw) * (0.5 + 0.5 * least(1.0, sraw * 5)), 6) AS quality
          FROM raw)
    SELECT doc_id, quality
    FROM q
    WHERE {hash64_sql("'ws-' || CAST(doc_id AS VARCHAR)")} % 1000000
          < CAST(round(quality * 1000000) AS BIGINT)
    """,
)
def sample_weighted_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-quality sampling: each document is kept
    with probability equal to its quality score, decided by a
    deterministic hash threshold (same rows every run/engine/retry — the
    retry-safety rule all sampling here follows). This is the soft
    quality gate training mixes use instead of a hard cutoff: high-quality
    docs almost surely survive, low-quality docs survive occasionally, so
    the tail stays represented. Narrow codegen filter, no shuffle."""
    from kafka_etl_consumer_spark.functions.hashing import hash64

    q = X.quality_score(_t(spark, sf_dir, "documents")).select("doc_id", "quality")
    key = F.concat(F.lit("ws-"), F.col("doc_id").cast("string"))
    thresh = F.round(F.col("quality") * 1_000_000, 0).cast("long")
    return q.filter(hash64(key) % 1_000_000 < thresh)


# ---------------------------------------------------------------------------
# audio feature extraction under the exact-oracle gate
# ---------------------------------------------------------------------------

# 48-byte deterministic "waveform" per doc: three chained md5 digests of
# the text. Both engines build the IDENTICAL bytes (md5 is the repo's
# cross-engine primitive), and the oracle re-derives the signed-int8
# samples arithmetically from the hex pairs — so the numpy decode path is
# hash-verified without DuckDB ever touching binary audio.
_AUDIO_HEX = "md5(text) || md5(text || '2') || md5(text || '3')"


@register(
    "multimodal_audio",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_AUDIO_HEX} AS hx
               FROM documents WHERE doc_id % 5 = 2),
    s AS (SELECT doc_id, j,
                 CASE WHEN b >= 128 THEN b - 256 ELSE b END AS v
          FROM (SELECT doc_id, j,
                       CAST(('0x' || substr(hx, j * 2 + 1, 2)) AS INT) AS b
                FROM h CROSS JOIN (SELECT unnest(range(48)) AS j))),
    w AS (SELECT doc_id, v,
                 lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
          FROM s)
    SELECT doc_id,
           CAST(48 AS BIGINT) AS n_samples,
           round(sqrt(avg(CAST(v AS DOUBLE) * v)), 6) AS rms,
           CAST(count(CASE WHEN v * pv < 0 THEN 1 END) AS INT)
               AS zero_crossings,
           CAST(max(abs(v)) AS INT) AS peak
    FROM w
    GROUP BY doc_id
    """,
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (RMS / zero crossings / peak over signed
    8-bit PCM) through the REAL numpy mapInPandas stage — on a
    deterministic md5-derived waveform, so the DuckDB oracle re-derives
    the exact samples arithmetically and the Python decode path itself is
    hash-verified cross-engine. A production pipeline swaps the PCM
    interpretation for soundfile/ffmpeg; batch shape and parallelism are
    identical (operators/multimodal.extract_audio_features)."""
    from kafka_etl_consumer_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 2)
    media = F.unhex(
        F.concat(
            F.md5("text"),
            F.md5(F.concat(F.col("text"), F.lit("2"))),
            F.md5(F.concat(F.col("text"), F.lit("3"))),
        )
    )
    feats = extract_audio_features(
        docs.select("doc_id", media.alias("media")), media_col="media"
    )
    return feats.select(
        "doc_id",
        F.col("n_samples").cast("bigint").alias("n_samples"),
        F.round("rms", 6).alias("rms"),
        F.col("zero_crossings").cast("int").alias("zero_crossings"),
        F.col("peak").cast("int").alias("peak"),
    )


# ---------------------------------------------------------------------------
# curriculum staging: quality deciles -> training phase assignment
# ---------------------------------------------------------------------------


@register(
    "corpus_curriculum_stage",
    oracle=f"""
    WITH tok AS (SELECT doc_id, text, {_TOKQ} AS toks FROM documents),
    raw AS (SELECT doc_id, len(toks) AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                        AS DOUBLE) / length(text) AS draw,
                   CAST(len(list_filter(toks, t -> t IN ({_STOPLIST}))) AS DOUBLE)
                        / len(toks) AS sraw
            FROM tok),
    q AS (SELECT doc_id,
                 round(least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
                       * (1 - draw) * (0.5 + 0.5 * least(1.0, sraw * 5)), 6) AS quality
          FROM raw)
    SELECT doc_id, quality,
           CAST(ntile(10) OVER (ORDER BY quality DESC, doc_id ASC) AS INT) AS stage
    FROM q
    """,
)
def corpus_curriculum_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: decile-rank every document by quality (ties
    broken by id — total order, so both engines cut identical deciles)
    into stages 1..10; curriculum training feeds stage 1 (cleanest) first.
    EXACT ntile semantics without the single-partition window (the r5
    verdict's last doc-grain global sort, retired): docs shard by a
    deterministic bucket of -quality, global rank = local row_number +
    broadcast shard offset (operators/shard.with_global_row_number), and
    the stage is ntile's own arithmetic — with n = q*10 + r, the first r
    buckets take ceil(n/10) rows, the rest floor(n/10) — replayed on
    (rank, n), bit-identical to the window ntile both engines ran
    before."""
    q = X.quality_score(_t(spark, sf_dir, "documents")).select("doc_id", "quality")
    from kafka_etl_consumer_spark.operators.shard import exact_ntile

    return exact_ntile(
        q,
        [F.col("quality").desc(), F.col("doc_id").asc()],
        10,
        out_col="stage",
        shard_key=-F.col("quality"),
    ).select("doc_id", "quality", "stage")
