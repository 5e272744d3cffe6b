"""Query surface batch 7: event analytics round 2 (gap sessionization,
rolling z-score anomalies) and SQL-surface widening (ordered string
aggregation, edit-distance pairs, calendar arithmetic).

All exact DuckDB oracles; the only floats are aggregate-level and rounded
in both engines (per-row floats are never round()ed — see driver_sim
HALF_UP note).

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these are the downstream workloads its parquet
layout exists to serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to TIMESTAMP (micros, UTC session tz)."""
    return _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )


@register(
    "sessionize_gap",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    m AS (SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('microsecond', lag(ts) OVER w, ts) > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                      AS session_seq
          FROM m)
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           date_diff('microsecond', min(ts), max(ts)) AS duration_us
    FROM s GROUP BY 1, 2
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a user's events split into sessions
    wherever the inter-event gap exceeds 30 minutes; one row per session
    with bounds, size, and exact duration.

    More general than session_window (win_session) — the session id is a
    running sum of boundary flags, so downstream ops can join back to raw
    events on (user_id, session_seq). One user-keyed shuffle feeds both
    the lag and the running sum (same window spec ⇒ one Exchange + two
    Window passes, no second shuffle); the final rollup partial-combines.
    """
    ev = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@register(
    "anomaly_zscore",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    r AS (SELECT user_id, value,
                 avg(value) OVER w AS mu,
                 stddev_samp(value) OVER w AS sd,
                 count(value) OVER w AS n_prior
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN abs((value - mu) / sd) > 3 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_anomalies,
           round(max(abs((value - mu) / sd)), 6) AS max_abs_z
    FROM r WHERE n_prior >= 10 AND sd > 0
    GROUP BY 1
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value scored
    against the trailing 20 events of the same user (needs >= 10 prior
    observations); per-user count of |z| > 3 outliers and the rounded
    max |z|.

    One user-keyed shuffle; avg/stddev/count share a single window frame
    (one Window operator, streaming frame evaluation). Per-row z values
    stay unrounded internally — only the aggregate max is rounded, so
    cross-engine float repr differences can't bite.
    """
    ev = _events_ts(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    scored = (
        ev.withColumn("mu", F.avg("value").over(w))
        .withColumn("sd", F.stddev_samp("value").over(w))
        .withColumn("n_prior", F.count("value").over(w))
        .where((F.col("n_prior") >= 10) & (F.col("sd") > 0))
        .withColumn("z", (F.col("value") - F.col("mu")) / F.col("sd"))
    )
    return scored.groupBy("user_id").agg(
        F.count("*").alias("n_scored"),
        F.sum(F.when(F.abs("z") > 3, 1).otherwise(0)).alias("n_anomalies"),
        F.round(F.max(F.abs("z")), 6).alias("max_abs_z"),
    )


@register(
    "agg_listagg",
    oracle="""
    WITH d AS (SELECT DISTINCT n.n_name, c.c_mktsegment
               FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_segments,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments_csv
    FROM d GROUP BY 1
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per nation, the sorted CSV of
    distinct customer market segments present.

    collect_list is non-deterministic in order at scale, so the engine
    sorts the collected array before joining — the only way an
    order-sensitive string agg is reproducible on a cluster. Nation dim
    broadcasts; the distinct pre-aggregates map-side.
    """
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    pairs = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_mktsegment")
        .distinct()
    )
    return pairs.groupBy("n_name").agg(
        F.count("*").alias("n_segments"),
        F.array_join(F.array_sort(F.collect_list("c_mktsegment")), ",").alias(
            "segments_csv"
        ),
    )


@register(
    "str_levenshtein_pairs",
    oracle="""
    WITH b AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(levenshtein(a.p_brand, b.p_brand) AS INTEGER) AS dist
    FROM b a JOIN b b ON a.p_brand < b.p_brand
    WHERE levenshtein(a.p_brand, b.p_brand) <= 2
    """,
)
def str_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match pairs over the distinct brand vocabulary
    (levenshtein <= 2, ordered pairs only).

    The distinct vocab is tiny at any scale (bounded domain), so one side
    broadcasts and the quadratic comparison never leaves a single stage.
    For unbounded vocabularies the scale path is blocked comparison
    (dedup_minhash / dedup_ngram_jaccard), not this exact operator.
    """
    b = _t(spark, sf_dir, "part").select("p_brand").distinct()
    a2, b2 = b.alias("a"), b.alias("b")
    dist = F.levenshtein(F.col("a.p_brand"), F.col("b.p_brand"))
    return (
        a2.join(
            F.broadcast(b2),
            (F.col("a.p_brand") < F.col("b.p_brand")) & (dist <= 2),
        )
        .select(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
            dist.alias("dist"),
        )
    )


@register(
    "date_arith_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE),
                    '%Y-%m-%d') AS plus_3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE),
                    '%Y-%m-%d') AS month_start,
           strftime(CAST(CAST(o_orderdate AS DATE) + 90 AS DATE), '%Y-%m-%d')
                    AS plus_90d,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS INTEGER) AS days_to_eoy
    FROM orders
    """,
)
def date_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic widening: add_months (end-of-month clamping),
    last_day, month truncation, day offsets, quarter / ISO week / day-of-
    week extraction, and day deltas to a fixed anchor.

    Pure narrow projection — codegen, pushdown-friendly, no shuffle.
    DuckDB numbers dayofweek 0=Sunday vs Spark 1=Sunday; the oracle
    offsets by one so the engines agree on the same calendar fact.
    Date-valued outputs travel as ISO strings: pandas has no date dtype,
    so DuckDB DATE surfaces as midnight datetime while Spark yields
    datetime.date — same fact, different repr, hash mismatch.
    """
    d = F.to_date(F.col("o_orderdate"))
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        iso(F.add_months(d, 3)).alias("plus_3m"),
        iso(F.last_day(d)).alias("month_end"),
        iso(F.trunc(d, "month")).alias("month_start"),
        iso(F.date_add(d, 90)).alias("plus_90d"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.datediff(F.to_date(F.lit("1998-12-31")), d).alias("days_to_eoy"),
    )


# ---------------------------------------------------------------------------
# Table profiling (data-quality first step over any landed table)
# ---------------------------------------------------------------------------

def _profile_oracle() -> str:
    """UNION ALL oracle mirroring operators/profiling.profile over orders."""
    cols = {
        "o_orderkey": "num",
        "o_custkey": "num",
        "o_orderstatus": "str",
        "o_totalprice": "num",
        "o_orderdate": "ts",
        "o_orderpriority": "str",
    }
    parts = []
    for name, kind in cols.items():
        if kind == "num":
            mn = f"round(CAST(min({name}) AS DOUBLE), 6)"
            mx = f"round(CAST(max({name}) AS DOUBLE), 6)"
            sn = sx = "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            mn = mx = "CAST(NULL AS DOUBLE)"
            sn = f"strftime(min({name}), '%Y-%m-%d %H:%M:%S')"
            sx = f"strftime(max({name}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            sn, sx = f"min({name})", f"max({name})"
        parts.append(
            f"SELECT '{name}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, {sn} AS min_str, {sx} AS max_str "
            f"FROM orders"
        )
    return " UNION ALL ".join(parts)


@register("profile_table", oracle=_profile_oracle())
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table: nulls, exact distincts, typed
    extrema — one row per column from ONE scan + ONE reduce
    (operators/profiling.profile; stack unpivots the wide aggregate).

    Exact multi-column distincts cost one Expand of the input (rows x
    n_cols before partial aggregation) — the documented exactness price;
    approx_count_distinct drops it at 100 TB."""
    from kafka_etl_consumer_spark.operators.profiling import profile

    return profile(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Generic type-1 MERGE (upsert + delete) over a landed table
# ---------------------------------------------------------------------------


@register(
    "merge_upsert_customers",
    oracle="""
    WITH changes AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100 AS c_acctbal, c_mktsegment,
               (c_custkey % 10 = 7) AS is_delete
        FROM customer WHERE c_custkey % 10 IN (3, 7)
        UNION ALL
        SELECT c_custkey + 1000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
               c_nationkey, 0.0, 'NEW', false
        FROM customer WHERE c_custkey % 10 = 1
    ),
    survivors AS (SELECT c.* FROM customer c
                  LEFT JOIN (SELECT DISTINCT c_custkey FROM changes) ch
                  USING (c_custkey)
                  WHERE ch.c_custkey IS NULL)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM survivors
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM changes WHERE NOT is_delete
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 MERGE INTO (no history): a deterministic change batch —
    balance bumps for keys ending in 3, deletes for keys ending in 7,
    brand-new keys from keys ending in 1 — applied to the customer table
    via operators/scd.merge_type1.

    One broadcast anti join + union: the table never shuffles when the
    change batch is small (the MERGE common case); the output is a full
    overwritable snapshot.
    """
    from kafka_etl_consumer_spark.operators.scd import merge_type1

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    updates = cust.where(k % 10 == 3).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(False).alias("is_delete"),
    )
    deletes = cust.where(k % 10 == 7).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(True).alias("is_delete"),
    )
    inserts = cust.where(k % 10 == 1).select(
        (k + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), k.cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(False).alias("is_delete"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return merge_type1(
        cust, changes, ["c_custkey"], delete_col="is_delete", broadcast_changes=True
    )


@register(
    "recursive_ancestors",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT doc_id AS start_id, doc_id AS node, 0 AS depth
        FROM documents WHERE doc_id % 97 = 0
        UNION ALL
        SELECT start_id, node // 2, depth + 1 FROM anc WHERE node > 0
    )
    SELECT start_id, node, depth FROM anc
    """,
)
def recursive_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark >= 4.0 `WITH RECURSIVE`): walk each seed
    document's implicit binary-tree ancestry (parent(n) = n div 2) to the
    root — the hierarchy/BOM-walk SQL surface, exercised through
    ``spark.sql`` rather than a DataFrame composition.

    Scale shape: each recursion round is a NARROW map over the previous
    frontier (no join, no shuffle), and depth is bounded by log2(max id)
    (~17 rounds at 100k docs, ~47 at 100 TB of 64-bit ids) — recursion
    depth grows with the LOG of the data, never linearly. For unbounded
    graph recursion use operators/graph.py (pointer jumping) instead;
    this surface is for hierarchy walks where SQL is the natural idiom.
    """
    from kafka_etl_consumer_spark.sources.tables import load_table

    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_rec")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT doc_id AS start_id, doc_id AS node, 0 AS depth
            FROM __docs_rec WHERE doc_id % 97 = 0
            UNION ALL
            SELECT start_id, node DIV 2, depth + 1 FROM anc WHERE node > 0
        )
        SELECT start_id, node, depth FROM anc
        """
    )


@register(
    "agg_salted_hot_key",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_uid,
           round(avg(value), 6) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage SALTED aggregation over the low-cardinality event_type
    keys (a handful of groups carrying the whole table — the hot-GROUP-BY
    shape AQE cannot split). Semantically identical to a plain GROUP BY —
    which is exactly what the oracle runs, so the salt/partial/final
    decomposition itself is hash-verified. Physically: stage-1 shuffle on
    (key, salt) so no reducer sees more than ~1/32 of any key, stage-2
    collapses 32 partial rows per key (operators/skew.salted_agg)."""
    from kafka_etl_consumer_spark.operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        specs=[
            ("count", "event_id", "n"),
            ("sum", "user_id", "sum_uid"),
            ("avg", "value", "avg_value"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value"),
        ],
        salt_src="event_id",
        buckets=32,
    )
    return out.select(
        "event_type", "n", "sum_uid",
        F.round("avg_value", 6).alias("avg_value"),
        "min_value", "max_value",
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN (SELECT o_orderkey, o_orderpriority FROM orders
          WHERE o_orderkey % 3 = 0) o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED equi-join (fact=lineitem salted on l_linenumber-independent
    row hash, dim=filtered orders replicated ×8) — the AQE-less skew-join
    shape for a dim too big to broadcast whole but fine ×8. The oracle is
    the PLAIN join + rollup, so replicate-and-salt is verified to change
    the physical plan only (operators/skew.salted_join)."""
    from kafka_etl_consumer_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, on="l_orderkey", salt_src="l_orderkey", buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# reconciliation: order-insensitive checksum + keyed table diff
# ---------------------------------------------------------------------------

# orders row canonicalization shared by Spark and the oracle: doubles via
# printf (raw double->varchar casts differ between engines), timestamps
# via an explicit format
_CK_COLS_SQL = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "printf('%.2f', o_totalprice)",
    "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
    "o_orderpriority",
]


from kafka_etl_consumer_spark.operators.reconcile import row_fingerprint_sql

_CK_FP_SQL = row_fingerprint_sql(_CK_COLS_SQL)


@register(
    "table_checksum_orders",
    oracle=f"""
    SELECT count(*) AS n_rows,
           CAST(sum(h) % 2305843009213693951 AS BIGINT) AS checksum_sum,
           bit_xor(h) AS checksum_xor
    FROM (SELECT {_CK_FP_SQL} AS h
          FROM orders)
    """,
)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum of the orders table — the
    "is the replica identical?" primitive for a 100 TB copy: one narrow
    row->hash map, one single-row aggregate (partial sums collapse
    map-side, bytes cross the wire, not rows), answer independent of
    partitioning and task order (operators/reconcile.table_checksum)."""
    from kafka_etl_consumer_spark.operators.reconcile import table_checksum

    o = _t(spark, sf_dir, "orders")
    return table_checksum(
        o,
        [
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.format_string("%.2f", F.col("o_totalprice")),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            F.col("o_orderpriority"),
        ],
    )


@register(
    "table_diff_customers",
    oracle="""
    WITH old AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer),
    new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50 ELSE c_acctbal END
                   AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 13 != 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, 0.0, 'NEW'
        FROM customer WHERE c_custkey % 11 = 0
    ),
    j AS (
        SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'added'
                    WHEN n.c_custkey IS NULL THEN 'removed'
                    WHEN o.c_acctbal = n.c_acctbal THEN 'same'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    )
    SELECT status, count(*) AS n FROM j GROUP BY status
    """,
)
def table_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff between two versions of the customer table (synthetic
    v2: +50 acctbal on key%7, key%13 deleted, key%11 re-inserted shifted)
    — one full-outer join on the key comparing 60-bit row fingerprints,
    rolled up to per-status counts. The change-data-capture primitive for
    landed tables; co-located (no shuffle) when both sides are bucketed by
    the key (operators/reconcile.table_diff)."""
    from kafka_etl_consumer_spark.operators.reconcile import table_diff

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    old = cust.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    new = (
        old.filter(k % 13 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(k % 7 == 0, F.col("c_acctbal") + 50).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(
            old.filter(k % 11 == 0).select(
                (k + 1000000).alias("c_custkey"),
                "c_name",
                F.lit(0.0).alias("c_acctbal"),
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
    )
    diff = table_diff(
        old, new, ["c_custkey"],
        ["c_name", F.format_string("%.2f", F.col("c_acctbal")), "c_mktsegment"],
    )
    return diff.groupBy("status").agg(F.count("*").alias("n"))
