"""Query surface batch 12 (round 4): evaluation splits, set-level dedup,
robust trends, distribution accounting, and privacy auditing.

- deterministic k-fold assignment with per-fold balance stats
- bag-of-words (token-SET) duplicate classes — catches word-order shuffles
  exact dedup misses
- time-weighted average value per event type (irregular sampling)
- consecutive-duplicate event suppression accounting (at-least-once feeds)
- RFM (recency/frequency/monetary) quintile segmentation of customers
- per-document character-level Shannon entropy (quality signal)
- per-label embedding centroids: norm + intra-class dispersion
- Theil-Sen robust trend of the daily event series (median of pairwise
  slopes — one outlier day cannot move it, unlike OLS)
- Gini concentration of document length per source (corpus curation:
  is one source's contribution dominated by a few giant docs?)
- k-anonymity audit over quasi-identifier columns
- cumulative-distinct-user growth accounting by day

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the training-data/analytics operators
the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql
from kafka_etl_consumer_spark.operators.ranks import tie_avg_ranks
from kafka_etl_consumer_spark.functions.text import tokens, tokens_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# deterministic k-fold assignment: fold = md5-hash(doc_id) mod K. The same
# doc lands in the same fold on every run, engine, and retry — the property
# TABLESAMPLE/rand()-based splitters lack — and the per-fold stats prove
# the hash balances both counts and covariates (chars).
# ---------------------------------------------------------------------------

_KFOLD_K = 5

_KFOLD_ORACLE = f"""
SELECT CAST({hash64_sql("'kfold|' || CAST(doc_id AS VARCHAR)")} % {_KFOLD_K} AS INT)
         AS fold,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
FROM documents
GROUP BY fold
"""


@register("split_kfold_counts", _KFOLD_ORACLE)
def split_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold assignment by deterministic hash-mod with per-fold balance
    stats. Scale: one narrow hash projection + one partial-combining
    aggregate to K rows — no sort, no sampling pass, retry-stable
    (SURVEY: the sampling/splits family; complements split_train_val_test
    and split_group_aware with the cross-validation layout)."""
    docs = _t(spark, sf_dir, "documents")
    fold = (
        hash64(F.concat(F.lit("kfold|"), F.col("doc_id").cast("string")))
        % _KFOLD_K
    ).cast("int")
    return (
        docs.select(fold.alias("fold"), "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# bag-of-words duplicate classes: documents whose DISTINCT-token SET is
# identical are near-certain duplicates even when word order differs —
# the class of rewrite/shuffle duplicate that exact text dedup misses and
# MinHash only catches probabilistically. Key = md5 of the sorted distinct
# token list; one hash-agg finds every class.
# ---------------------------------------------------------------------------

_TOKSET_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({tokens_sql("text")})), ' '))
           AS set_key
  FROM documents
)
SELECT set_key,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM t
GROUP BY set_key
HAVING count(*) > 1
"""


@register("dedup_token_set", _TOKSET_ORACLE)
def dedup_token_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set (bag-of-words) duplicate classes with a deterministic
    min-id keeper. Scale: the set key is a narrow in-row projection
    (tokenize → distinct → sort → md5), so the whole operator is ONE
    hash aggregate on a 32-byte key — same shuffle inventory as exact
    dedup (operators/dedup.py), one rung up the sensitivity ladder
    between exact-text and MinHash."""
    docs = _t(spark, sf_dir, "documents")
    set_key = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " ")
    )
    return (
        docs.select("doc_id", set_key.alias("set_key"))
        .groupBy("set_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# time-weighted average: each observation's value holds until the next
# observation, so the mean weights each value by its holding time — THE
# correct average for irregularly sampled series (sensor readings, account
# balances, queue depths), where the arithmetic mean over-weights bursts.
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id
           FROM events),
d AS (SELECT event_type, value,
             date_diff('microsecond', ts,
                       lead(ts) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id)) AS dt_us
      FROM e)
SELECT event_type,
       CAST(count(dt_us) AS BIGINT) AS n_intervals,
       round(sum(value * dt_us) / sum(dt_us), 6) AS twa_value,
       round(avg(value), 6) AS naive_mean
FROM d WHERE dt_us IS NOT NULL
GROUP BY event_type
"""


@register("time_weighted_avg_value", _TWA_ORACLE)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event type (last-observation-
    carried-forward weighting), with the naive mean alongside to expose
    the sampling bias. Scale: ONE event-type-keyed shuffle feeds both the
    lead() window and the final aggregate (same partitioning ⇒ one
    Exchange); state per row is one lead lookahead."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    dt = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    return (
        ev.withColumn("dt_us", dt)
        .filter(F.col("dt_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("dt_us").cast("bigint").alias("n_intervals"),
            F.round(F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6).alias(
                "twa_value"
            ),
            F.round(F.avg("value"), 6).alias("naive_mean"),
        )
    )


# ---------------------------------------------------------------------------
# consecutive-duplicate suppression accounting: at-least-once event feeds
# (and double-click UIs) emit runs of identical events; the standard
# cleaning rule keeps a row only when its type differs from the user's
# previous row. This reports what that rule would drop, per type.
# ---------------------------------------------------------------------------

_CONSEC_ORACLE = """
WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
m AS (SELECT event_type,
             CASE WHEN event_type = lag(event_type)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS is_dup
      FROM e)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_dup) AS BIGINT) AS n_consecutive_dups,
       round(sum(is_dup) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
FROM m GROUP BY event_type
"""


@register("events_consecutive_dedup", _CONSEC_ORACLE)
def events_consecutive_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: how many rows are consecutive same-type repeats of
    the user's previous event (the rows a keep-on-change compaction drops).
    Scale: one user-keyed window shuffle, then a partial-combining rollup
    to the type grain — the lag() state is one row per user."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_dup = F.when(
        F.col("event_type") == F.lag("event_type").over(w), 1
    ).otherwise(0)
    return (
        ev.withColumn("is_dup", is_dup)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("is_dup").cast("bigint").alias("n_consecutive_dups"),
            F.round(
                F.sum("is_dup") / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# RFM segmentation: the classic customer-value grid. Recency (days since
# last order, vs the corpus max date), Frequency (order count), Monetary
# (total spend), each cut into quintiles with a deterministic custkey
# tie-break, then counted per (r,f,m) cell.
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH mx AS (SELECT max(o_orderdate) AS max_d FROM orders),
c AS (SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT max_d FROM mx))
               AS recency_days,
             count(*) AS frequency,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey),
q AS (SELECT o_custkey,
             ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_q,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_q,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_q
      FROM c)
SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
       CAST(m_q AS INT) AS m_q,
       CAST(count(*) AS BIGINT) AS n_customers
FROM q GROUP BY 1, 2, 3
"""


@register("rfm_segments", _RFM_ORACLE)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile grid over ordering customers. Scale: one custkey
    aggregate (the only data-sized shuffle; materialized once — the r6
    pruning barrier keeps all three quantile branches canonically equal,
    so the exchange reuses), then three SHARDED exact ntiles over the
    CUSTOMER-grain table (operators/shard.exact_ntile: per-metric-bucket
    local row_number + broadcast shard offsets — the r5 "honest
    single-partition sort of customers" is retired) joined back on the
    customer key; the anchor date is a broadcast one-row aggregate,
    never a driver collect."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("max_d"))
    c = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("max_d", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from kafka_etl_consumer_spark.operators.shard import exact_ntile

    # each quantile gets its own shard pass over the full-column frame
    # (full columns keep the three branches' upstream canonically equal
    # for exchange reuse), then the quintiles join back on the key
    r_q = exact_ntile(
        c, ["recency_days", "o_custkey"], 5, "r_q", shard_key="recency_days"
    ).select("o_custkey", "r_q")
    f_q = exact_ntile(
        c, ["frequency", "o_custkey"], 5, "f_q", shard_key="frequency"
    ).select("o_custkey", "f_q")
    m_q = exact_ntile(
        c, ["monetary", "o_custkey"], 5, "m_q", shard_key="monetary"
    ).select("o_custkey", "m_q")
    q = r_q.join(f_q, "o_custkey").join(m_q, "o_custkey")
    return q.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# character-level Shannon entropy per document — the cheap quality signal
# that separates natural text (~4 bits/char) from padding, key-mashing,
# base64 blobs, and single-char floods. Complements text_quality's
# word-level ratios with a distributional measure.
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
f AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(n) AS total, count(*) AS n_distinct_chars FROM f
        GROUP BY doc_id)
SELECT f.doc_id,
       CAST(any_value(tot.n_distinct_chars) AS BIGINT) AS n_distinct_chars,
       round(-sum((n / CAST(total AS DOUBLE))
                  * ln(n / CAST(total AS DOUBLE))) / ln(2), 6) AS char_entropy_bits
FROM f JOIN tot USING (doc_id)
GROUP BY f.doc_id
"""


@register("text_char_entropy", _ENTROPY_ORACLE)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each document's character distribution.
    Scale shape: the char frequency map never leaves the row — explode to
    (doc, char) pairs, ONE hash-agg to the bounded (doc × alphabet) grain,
    and a same-key re-agg that AQE plans shuffle-free (the second groupBy
    is a prefix of the first's partitioning); no per-row UDF, no python."""
    docs = _t(spark, sf_dir, "documents")
    f = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("doc_id")
    p = F.col("n") / F.sum("n").over(tot).cast("double")
    return (
        f.withColumn("p", p)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            F.round(
                -F.sum(F.col("p") * F.log(F.col("p"))) / F.lit(float(__import__("math").log(2))),
                6,
            ).alias("char_entropy_bits"),
        )
    )


# ---------------------------------------------------------------------------
# per-label embedding centroids: class prototype norm + intra-class
# dispersion — the first diagnostic on a labeled embedding table (are
# classes tight? is one label's centroid collapsing to the origin?), and
# the building block of nearest-centroid classification and clustering QA.
# Centroid elements are rounded to 6dp in BOTH engines before the norm /
# distance pass, making the downstream floats exactly comparable.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
el AS (SELECT vec_id, label, ord, emb[ord] AS x
       FROM e, (SELECT unnest(range(1, 65)) AS ord)),
cen AS (SELECT label, ord, round(avg(x), 6) AS c FROM el GROUP BY label, ord),
dist AS (SELECT el.vec_id, el.label,
                sqrt(sum((el.x - cen.c) * (el.x - cen.c))) AS d
         FROM el JOIN cen USING (label, ord)
         GROUP BY el.vec_id, el.label)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round((SELECT sqrt(sum(c * c)) FROM cen WHERE cen.label = dist.label), 6)
         AS centroid_norm,
       round(avg(d), 6) AS avg_dist_to_centroid
FROM dist GROUP BY label
"""


@register("embedding_label_centroids", _CENTROID_ORACLE)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm and mean distance-to-centroid. Scale: the
    centroid aggregate partial-combines map-side, so the (label × dim)
    exchange is tiny regardless of row count; centroids re-assemble into
    ONE array per label and broadcast back, and each row's distance is an
    in-row zip_with fold — the corpus is scanned twice but shuffled only
    at label×dim grain (cites the fold pattern of operators/embeddings.py
    that A/B-measured 6x over unrolled getItem sums)."""
    e = _t(spark, sf_dir, "embeddings")
    el = e.select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnsRenamed({"pos": "ord", "col": "x"})
    cen = el.groupBy("label", "ord").agg(F.round(F.avg("x"), 6).alias("c"))
    cen_arr = cen.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ord", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    joined = e.join(F.broadcast(cen_arr), "label")
    d = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("cvec"),
                lambda x, c: (x - c) * (x - c),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    cnorm = F.round(
        F.sqrt(
            F.aggregate(F.col("cvec"), F.lit(0.0), lambda acc, v: acc + v * v)
        ),
        6,
    )
    return (
        joined.withColumn("d", d)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.first(cnorm).alias("centroid_norm"),
            F.round(F.avg("d"), 6).alias("avg_dist_to_centroid"),
        )
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend: the median of all pairwise slopes of the daily
# event-count series. A single outlier day moves OLS arbitrarily but
# cannot move the pairwise-slope median — the standard robust trend for
# noisy operational metrics.
# ---------------------------------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01',
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, (b.c - a.c) / (b.d - a.d) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.d > a.d
)
SELECT event_type,
       CAST((SELECT count(*) FROM daily WHERE daily.event_type = pairs.event_type)
            AS BIGINT) AS n_days,
       round(quantile_cont(slope, 0.5), 6) AS theilsen_slope
FROM pairs GROUP BY event_type
"""


@register("ts_theilsen_trend", _THEILSEN_ORACLE)
def ts_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope (events/day drift) per event type. Scale: events
    collapse to the DAY grain first (the only data-sized shuffle); the
    O(days²) pair grid and its median run on the tiny per-type series —
    ~90 days → ~4k pairs per type — so cost is independent of event
    volume. The pair join is an equi-join on event_type with a range
    predicate, never a cartesian."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date"),
                F.lit("2024-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.c") - F.col("a.c")) / (F.col("b.d") - F.col("a.d"))).alias("slope"),
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    med = pairs.groupBy("event_type").agg(
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theilsen_slope")
    )
    return n_days.join(med, "event_type").select(
        "event_type", "n_days", "theilsen_slope"
    )


# ---------------------------------------------------------------------------
# Gini concentration of document length within each source — corpus
# curation accounting: a source whose token mass is concentrated in a few
# giant documents behaves very differently under per-doc sampling than
# its doc count suggests. G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending x.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(2.0 * sum(CAST(i AS DOUBLE) * n_chars)
               / (count(*) * CAST(sum(n_chars) AS DOUBLE))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r GROUP BY source
"""


@register("gini_source_concentration", _GINI_ORACLE)
def gini_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-document length within each source (0 =
    every doc equal, →1 = one doc carries everything). Scale: the rank
    sum collapses to the per-source LENGTH GRID — a tie run of value x
    at ascending positions s..e contributes x·c·(s+e)/2 = x·c·(2·cum −
    c + 1)/2 regardless of the within-run tiebreak, so one hash agg to
    (source, length) cells + a window over the bounded length grid
    replaces the per-row rank of every document (exact integers, sums
    bit-identical to the oracle's per-row form); no pairwise
    |x_i − x_j| grid either."""
    docs = _t(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("source").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    g = cell.select(
        "source",
        "n_chars",
        "c",
        F.sum("c").over(w).alias("cum"),
    )
    contrib = (
        F.col("n_chars") * F.col("c") * (2 * F.col("cum") - F.col("c") + 1)
    ) / F.lit(2.0)
    n = F.sum("c")
    total = F.sum(F.col("n_chars") * F.col("c"))
    return g.groupBy("source").agg(
        n.cast("bigint").alias("n_docs"),
        total.cast("bigint").alias("total_chars"),
        F.round(
            F.lit(2.0) * F.sum(contrib) / (n * total.cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: how identifiable are rows under the quasi-identifier
# pair (market segment, nation)? For each k threshold: equivalence classes
# smaller than k and the rows they expose — the first check before any
# dataset release, and the shape generalizes to any QI column set.
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
WITH g AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
           FROM customer GROUP BY 1, 2),
k AS (SELECT unnest([2, 5, 10]) AS k)
SELECT CAST(k.k AS INT) AS k,
       CAST(sum(CASE WHEN g.n < k.k THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k,
       CAST(sum(CASE WHEN g.n < k.k THEN g.n ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(count(*) AS BIGINT) AS n_classes
FROM g CROSS JOIN k GROUP BY k.k
"""


@register("audit_k_anonymity", _KANON_ORACLE)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity report over (c_mktsegment, c_nationkey) at k ∈ {2,5,10}.
    Scale: ONE hash-agg to the equivalence-class grain (the only
    data-sized shuffle); the threshold sweep cross-joins the bounded class
    table against 3 literal rows — adding thresholds costs nothing."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    ks = F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    return (
        g.select("n", ks)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("classes_below_k"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        )
        .select(F.col("k").cast("int").alias("k"), "classes_below_k",
                "rows_at_risk", "n_classes")
    )


# ---------------------------------------------------------------------------
# growth accounting: cumulative distinct users by day — the "total users
# ever" curve every product dashboard opens with, computed the scalable
# way (first-seen day per user, then a running sum over the tiny day
# series) rather than a count(DISTINCT) per day over growing prefixes.
# ---------------------------------------------------------------------------

_GROWTH_ORACLE = """
WITH first_seen AS (
  SELECT user_id,
         CAST(min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS DATE) AS d0
  FROM events GROUP BY user_id
),
daily AS (SELECT d0, count(*) AS new_users FROM first_seen GROUP BY d0)
SELECT strftime(d0, '%Y-%m-%d') AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY d0
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
FROM daily
"""


@register("user_growth_accounting", _GROWTH_ORACLE)
def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New and cumulative distinct users per day. Scale: one user-grain
    min-aggregate (partial-combining — each user's first timestamp folds
    map-side), one day-grain count, and the running sum runs over the
    DAY series (bounded), never a per-day count(DISTINCT) over an
    ever-growing prefix of raw events."""
    ev = _t(spark, sf_dir, "events")
    first_seen = (
        ev.select("user_id", F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").cast("date").alias("d0"))
    )
    daily = first_seen.groupBy("d0").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("d0", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# k-core extraction: the maximal subgraph where every vertex keeps ≥ k
# neighbors — the dense-part extractor of graph curation (spam/bot rings
# and template boilerplate survive high-k cores; organic long tail peels
# away). Spark iterates the Batagelj-Zaveršnik peeling to a TRUE
# fixpoint (operators/graph.py kcore); the oracle unrolls 16 peeling
# rounds — ≥2x the deepest convergence observed on this data (8 rounds
# at sf0.01, 6 at sf0.1, 2 at sf0.001), so both sides reach the same
# fixpoint and convergence itself is hash-checked.
# ---------------------------------------------------------------------------

_KCORE_K = 4
_KCORE_ROUNDS = 16


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _COORD_EDGE_CTE

    # every symN / keepN is AS MATERIALIZED: each round references the
    # previous one 3x, so DuckDB's default CTE inlining would expand the
    # unroll to 3^rounds scans of lineitem
    parts = [
        f"WITH {_COORD_EDGE_CTE},",
        "sym0 AS MATERIALIZED (SELECT p1 AS u, p2 AS v FROM e0"
        " UNION ALL SELECT p2, p1 FROM e0)",
    ]
    for i in range(rounds):
        parts.append(
            f", keep{i} AS MATERIALIZED (SELECT u FROM sym{i} GROUP BY u"
            f" HAVING count(*) >= {k})"
            f", sym{i + 1} AS MATERIALIZED (SELECT s.u, s.v FROM sym{i} s"
            f" JOIN keep{i} a ON s.u = a.u JOIN keep{i} b ON s.v = b.u)"
        )
    parts.append(
        f" SELECT u AS part_id, CAST(count(*) AS BIGINT) AS core_degree"
        f" FROM sym{rounds} GROUP BY u"
    )
    return "\n".join(parts)


@register("graph_kcore", _kcore_oracle_sql(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the co-ordered-parts graph: (part_id, degree within the
    core). Scale: operators/graph.py kcore — per round one map-side-
    combining degree agg + two semi-joins against the shrinking keep
    set, state is the surviving edge list only, lineage truncated per
    round; the round count is data-dependent (stop-on-fixpoint), which
    is why this is the module's one EAGER loop."""
    from kafka_etl_consumer_spark.operators.graph import kcore
    from kafka_etl_consumer_spark.plans.queries_pipeline7 import _coordered_edges

    e0 = _coordered_edges(spark, sf_dir)
    return kcore(e0, _KCORE_K, src="p1", dst="p2").select(
        F.col("u").alias("part_id"), "core_degree"
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness: for every observed day, distinct users that day and
# distinct users in the trailing 7-day window — the engagement ratio every
# growth dashboard tracks. Scalable via the CONTRIBUTION trick: each
# (user, day) activity row fans out to the ≤7 anchor days it can serve,
# and one distinct+count replaces a per-day COUNT(DISTINCT) over sliding
# raw-event windows (count-distinct cannot ride a window frame).
# ---------------------------------------------------------------------------

_STICKINESS_ORACLE = """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
            FROM events),
dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
contrib AS (SELECT DISTINCT user_id,
                   CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS DATE) AS anchor
            FROM ud),
wau AS (SELECT anchor, count(*) AS wau FROM contrib GROUP BY anchor)
SELECT strftime(dau.d, '%Y-%m-%d') AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau ON wau.anchor = dau.d
"""


@register("stickiness_dau_wau", _STICKINESS_ORACLE)
def stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and their ratio per observed day. Scale:
    events collapse to the (user, day) grain first (the only data-sized
    shuffle); the ×7 anchor fan-out happens on that bounded grain, and
    the WAU distinct+count partial-combines — never a per-day
    count(DISTINCT) over a sliding window of raw events. Anchors join
    back to observed days only (inner join on dau)."""
    ev = _t(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("d"),
        )
        .distinct()
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("anchor"),
        )
        .distinct()
    )
    wau = contrib.groupBy("anchor").agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    return (
        dau.join(wau, dau.d == wau.anchor)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# join-key skew report: the pre-flight check before any big keyed join or
# aggregation — how concentrated is the key distribution, and will one
# reducer eat the job? Feeds the decision between a plain shuffle join,
# AQE skew handling, and explicit salting (join_salted_skew /
# agg_salted_hot_key are the remedies this report justifies).
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH f AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(max(cnt) AS BIGINT) AS max_key_rows,
             quantile_cont(CAST(cnt AS DOUBLE), 0.5) AS p50,
             quantile_cont(CAST(cnt AS DOUBLE), 0.99) AS p99
      FROM f)
SELECT n_keys, n_rows, max_key_rows,
       round(max_key_rows / CAST(n_rows AS DOUBLE), 6) AS max_key_share,
       round(p50, 6) AS p50_rows_per_key,
       round(p99, 6) AS p99_rows_per_key,
       round(p99 / p50, 6) AS skew_ratio_p99_p50
FROM t
"""


@register("skew_key_report", _SKEW_ORACLE)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution skew profile of lineitem.l_partkey (one row:
    cardinality, hottest-key share, p50/p99 rows-per-key and their
    ratio). Scale: ONE partial-combining count per key (the only
    data-sized shuffle); the percentile pass runs on the KEY-grain
    count table — swap percentile for approx_percentile at 100 TB if
    the key table itself outgrows a stage."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        f.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.max("cnt").cast("bigint").alias("max_key_rows"),
            F.expr("percentile(CAST(cnt AS DOUBLE), 0.5)").alias("p50"),
            F.expr("percentile(CAST(cnt AS DOUBLE), 0.99)").alias("p99"),
        )
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            F.round(F.col("max_key_rows") / F.col("n_rows").cast("double"), 6).alias(
                "max_key_share"
            ),
            F.round("p50", 6).alias("p50_rows_per_key"),
            F.round("p99", 6).alias("p99_rows_per_key"),
            F.round(F.col("p99") / F.col("p50"), 6).alias("skew_ratio_p99_p50"),
        )
    )


# ---------------------------------------------------------------------------
# tolerance-bounded as-of join: each click attaches the same user's most
# recent PURCHASE — but only if it happened within the last hour; stale
# context must not attach (the pandas merge_asof ``tolerance`` semantics:
# nearest first, then reject the gap; the as-of bound is monotone, so the
# two orders are equivalent). ~half the clicks have an in-window purchase
# on this data, so both the match and the reject paths are exercised.
# ---------------------------------------------------------------------------

_ASOF_TOL_SEC = 3600

_ASOF_TOL_ORACLE = f"""
WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS p_event_id, user_id,
             CAST(ts AS TIMESTAMP) AS p_ts, value AS p_value
      FROM events WHERE event_type = 'purchase'),
ranked AS (
    SELECT c.event_id, p.p_event_id, p.p_ts, p.p_value,
           row_number() OVER (PARTITION BY c.event_id
                              ORDER BY p.p_ts DESC, p.p_event_id DESC) AS rn
    FROM c JOIN p
      ON p.user_id = c.user_id AND p.p_ts <= c.ts
     AND p.p_ts >= c.ts - INTERVAL {_ASOF_TOL_SEC} SECOND)
SELECT c.event_id, c.user_id, c.ts, m.p_event_id, m.p_ts, m.p_value
FROM c
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m USING (event_id)
"""


@register("join_asof_tolerance", _ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour tolerance: clicks attach the user's
    most recent purchase only when it is fresh (operators/joins.py
    asof_join ``tolerance`` — seconds on the widened timestamp axis).
    Same merge shape and cost as join_asof: ONE exchange of L+R rows,
    the gap check is a narrow post-pick expression, never a second
    candidate join."""
    from kafka_etl_consumer_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="p_ts",
        tiebreakers=["p_event_id"], direction="backward", how="left",
        tolerance=float(_ASOF_TOL_SEC),
    )


# ---------------------------------------------------------------------------
# ML evaluation surface: the two reports every label-transfer / retrieval
# pipeline closes the loop with.
#
# eval_knn_confusion — the full confusion matrix (plus per-class
# precision/recall) of 5-NN majority-vote predictions for the first 100
# vectors, the multi-class generalization of knn_label_predict's
# per-query verdicts.
# ---------------------------------------------------------------------------

_CONFUSION_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
q AS (SELECT vec_id AS q_vec_id, emb AS q_emb, label AS true_label
      FROM e WHERE vec_id < 100),
c AS (SELECT vec_id, emb, label FROM e WHERE vec_id >= 100),
s AS (SELECT q_vec_id, true_label, c.vec_id, c.label,
             round(list_dot_product(q_emb, c.emb)
                   / (sqrt(list_dot_product(q_emb, q_emb))
                      * sqrt(list_dot_product(c.emb, c.emb))), 6) AS score
      FROM q CROSS JOIN c),
r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY score DESC, vec_id) AS rn
      FROM s),
votes AS (SELECT q_vec_id, true_label, label, count(*) AS cnt
          FROM r WHERE rn <= 5 GROUP BY 1, 2, 3),
pick AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                      ORDER BY cnt DESC, label) AS pr
         FROM votes),
pred AS (SELECT q_vec_id, true_label, label AS pred_label FROM pick WHERE pr = 1)
SELECT true_label, pred_label,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) / CAST(sum(count(*))
             OVER (PARTITION BY true_label) AS DOUBLE), 6) AS recall_share,
       round(count(*) / CAST(sum(count(*))
             OVER (PARTITION BY pred_label) AS DOUBLE), 6) AS precision_share
FROM pred GROUP BY true_label, pred_label
"""


@register("eval_knn_confusion", _CONFUSION_ORACLE)
def eval_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of 5-NN majority-vote predictions (first 100
    vectors as the eval split), with each cell's share of its true row
    (recall decomposition) and predicted column (precision
    decomposition). Scale: the neighbor search is the broadcast-query
    ANN surface; everything after is |q|-row arithmetic — the matrix
    itself is labels² rows."""
    from kafka_etl_consumer_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("label").alias("true_label"),
    )
    corpus = e.filter(F.col("vec_id") >= 100).select("vec_id", "embedding", "label")
    top = cosine_topk(
        corpus.select("vec_id", "embedding"), q.select("q_vec_id", "q_embedding"), k=5
    )
    votes = (
        F.broadcast(top)
        .join(corpus.select("vec_id", "label"), "vec_id")
        .groupBy("q_vec_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cnt").desc(), F.col("label"))
    pred = (
        votes.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select("q_vec_id", F.col("label").alias("pred_label"))
        .join(q.select("q_vec_id", "true_label"), "q_vec_id")
    )
    cell = pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wt = Window.partitionBy("true_label")
    wp = Window.partitionBy("pred_label")
    return cell.select(
        "true_label",
        "pred_label",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 6).alias(
            "recall_share"
        ),
        F.round(F.col("n") / F.sum("n").over(wp).cast("double"), 6).alias(
            "precision_share"
        ),
    )


# ---------------------------------------------------------------------------
# eval_auc_rank — exact ROC AUC via the Mann-Whitney rank formula:
# AUC = (Σ avg-ranks of positives − n⁺(n⁺+1)/2) / (n⁺ n⁻), with average
# ranks for score ties (sklearn's roc_auc_score semantics). Scorer:
# cosine to class-0's (rounded) centroid; positives = label 0 — a
# self-contained "does the prototype separate its class" probe.
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                  CAST(label = 0 AS INT) AS pos FROM embeddings),
el AS (SELECT vec_id, ord, emb[ord] AS x
       FROM e, (SELECT unnest(range(1, 65)) AS ord)),
cen AS (SELECT ord, round(avg(x), 6) AS c
        FROM el JOIN e USING (vec_id) WHERE e.pos = 1 GROUP BY ord),
cn AS (SELECT sqrt(sum(c * c)) AS nrm, array_agg(c ORDER BY ord) AS cvec FROM cen),
s AS (SELECT e.vec_id, e.pos,
             round(list_dot_product(e.emb, cn.cvec)
                   / (sqrt(list_dot_product(e.emb, e.emb)) * cn.nrm), 6) AS score
      FROM e CROSS JOIN cn),
rk AS (SELECT pos,
              rank() OVER (ORDER BY score) + (count(*) OVER (PARTITION BY score) - 1) / 2.0
                AS avg_rank
       FROM s)
SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(1 - pos) AS BIGINT) AS n_neg,
       round((sum(CASE WHEN pos = 1 THEN avg_rank ELSE 0 END)
              - sum(pos) * (sum(pos) + 1) / 2.0)
             / (sum(pos) * CAST(sum(1 - pos) AS DOUBLE)), 6) AS auc
FROM rk
"""


@register("eval_auc_rank", _AUC_ORACLE)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC (Mann-Whitney, tie-averaged ranks) of the
    cosine-to-class-0-centroid scorer against the label-0 indicator.
    Scale: the centroid is a (dim)-row broadcast aggregate and the score
    a narrow in-row fold; ranks come from per-(score, pos) COUNTS (hash
    agg at full parallelism), so the one single-partition sort runs over
    the distinct-score grid, not the rows — and at 100 TB
    eval_auc_rank_binned bounds that grid to 512 fixed buckets with the
    same count-rank formula. Scores round to 6dp in BOTH engines so tie
    structure is cross-engine identical."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        (F.col("label") == 0).cast("int").alias("pos"),
    )
    el = e.filter(F.col("pos") == 1).select(F.posexplode("emb")).withColumnsRenamed(
        {"pos": "ord", "col": "x"}
    )
    cen = el.groupBy("ord").agg(F.round(F.avg("x"), 6).alias("c"))
    cn = cen.agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ord", "c"))), lambda s: s["c"]
        ).alias("cvec"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("emb"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    self_norm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    s = e.crossJoin(F.broadcast(cn)).select(
        "pos", F.round(dot / (self_norm * F.col("nrm")), 6).alias("score")
    )
    rk = tie_avg_ranks(s, [], "score", cohort_cols=["pos"])
    n_pos = F.sum(F.when(F.col("pos") == 1, F.col("cnt")).otherwise(F.lit(0)))
    n_neg = F.sum(F.when(F.col("pos") == 0, F.col("cnt")).otherwise(F.lit(0)))
    return rk.agg(
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        F.round(
            (
                F.sum(
                    F.when(
                        F.col("pos") == 1, F.col("cnt") * F.col("avg_rank")
                    ).otherwise(0.0)
                )
                - n_pos * (n_pos + 1) / 2.0
            )
            / (n_pos * n_neg.cast("double")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# retrieval evaluation: precision@k / recall@k of the BM25 ranking against
# an exact-containment relevance set (docs containing ALL query terms) —
# closes the loop on the search surface the way eval_knn_confusion does
# for label transfer. Deterministic end to end: the ranking inherits
# BM25's (score DESC, doc_id) total order, relevance is set algebra.
# ---------------------------------------------------------------------------

_PR_TERMS = ["vector", "hash", "join"]
_PR_K1, _PR_B = 1.2, 0.75

_PR_ORACLE = f"""
WITH docs AS (SELECT doc_id, {tokens_sql("text")} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS d FROM docs),
corpus AS (SELECT count(*) AS n, avg(d) AS avgdl FROM dl),
hits AS (SELECT doc_id, t FROM (SELECT doc_id, unnest(toks) AS t FROM docs)
         WHERE t IN ('vector', 'hash', 'join')),
tf AS (SELECT doc_id, t, count(*) AS tf FROM hits GROUP BY doc_id, t),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.doc_id,
         sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * ({_PR_K1} + 1))
             / (tf + {_PR_K1} * (1 - {_PR_B} + {_PR_B} * d / avgdl))) AS s
  FROM tf JOIN dfreq USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
),
ranked AS (SELECT doc_id,
                  row_number() OVER (ORDER BY s DESC, doc_id) AS rn
           FROM scored),
rel AS (SELECT doc_id FROM docs
        WHERE list_has_all(toks, ['vector', 'hash', 'join'])),
n_rel AS (SELECT count(*) AS nr FROM rel),
ks AS (SELECT unnest([1, 5, 10]) AS k)
SELECT CAST(ks.k AS INT) AS k,
       CAST(count(rel.doc_id) AS BIGINT) AS hits,
       round(count(rel.doc_id) / CAST(ks.k AS DOUBLE), 6) AS precision_at_k,
       round(count(rel.doc_id) / CAST(any_value(nr) AS DOUBLE), 6) AS recall_at_k
FROM ks
JOIN ranked ON ranked.rn <= ks.k
LEFT JOIN rel ON rel.doc_id = ranked.doc_id
CROSS JOIN n_rel
GROUP BY ks.k
"""


@register("eval_retrieval_pr", _PR_ORACLE)
def eval_retrieval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@{1,5,10} and recall@{1,5,10} of the BM25 top-10 against
    exact all-terms containment relevance. Scale: BM25's query-term-
    filtered shuffle + TakeOrdered produce the 10-row ranking; the
    relevance flag is a narrow in-row containment check on those 10
    docs' rows; the k sweep fans 10 rows × 3 — everything after the
    search is constant-size."""
    from kafka_etl_consumer_spark.operators.nlp import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    ranked = bm25_topk(docs, _PR_TERMS).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("rn"),
    )
    toks = tokens(F.col("text"))
    rel_flag = docs.select(
        "doc_id",
        F.forall(
            F.array(*[F.lit(t) for t in _PR_TERMS]),
            lambda t: F.array_contains(toks, t),
        ).alias("is_rel"),
    )
    n_rel = rel_flag.agg(
        F.sum(F.col("is_rel").cast("int")).alias("nr")
    )
    ks = F.explode(F.array(F.lit(1), F.lit(5), F.lit(10))).alias("k")
    hits = (
        ranked.join(rel_flag, "doc_id")
        .select("rn", "is_rel", ks)
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("is_rel").cast("int")).cast("bigint").alias("hits"))
        .crossJoin(F.broadcast(n_rel))
    )
    return hits.select(
        F.col("k").cast("int").alias("k"),
        "hits",
        F.round(F.col("hits") / F.col("k").cast("double"), 6).alias("precision_at_k"),
        F.round(F.col("hits") / F.col("nr").cast("double"), 6).alias("recall_at_k"),
    )
