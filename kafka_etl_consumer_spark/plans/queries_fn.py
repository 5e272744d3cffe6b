"""Query surface batch 2: scalar-function coverage + event-time windows
(SURVEY.md §2.2 rows: string/date/math/array/JSON functions, explode,
tumbling/sliding/session windows).

Window queries run the SAME ``window()``/``session_window()`` expressions
batch-mode here (oracle-checkable) and streaming-mode in
streaming/windows.py — Spark's unified API means one implementation serves
both; tests/test_streaming.py proves the streaming side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INT) AS name_len,
           concat_ws('|', c_name, c_mktsegment) AS name_seg,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           CAST(c_name LIKE 'Customer#00000000%' AS BOOLEAN) AS is_low_key
    FROM customer
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over a single scan — pure narrow projection."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("name_short"),
        F.col("c_name").like("Customer#00000000%").alias("is_low_key"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(o_orderdate, '%Y-%m-%d/%H/%M') AS dir_path,
           CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01') AS INT) AS days_to_98
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. ``dir_path`` reproduces the reference's
    CONF_DATE_FORMAT directory string 'yyyy-MM-dd/HH/mm'
    (KafkaETLParquetConsumerTestSkip.java:57 of the reference) as a column."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd/HH/mm").alias("dir_path"),
        F.datediff(F.lit("1998-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_98"
        ),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           l_discount * l_discount AS disc_sq,
           abs(l_discount - l_tax) AS disc_tax_gap,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           l_linenumber % 3 AS line_mod3,
           greatest(l_discount, l_tax) AS max_rate
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-correctly-rounded in both engines; ln can
    differ by 1 ulp (JVM vs libm) so it is round(6)ed; squares use
    multiplication, not pow (pow is not correctly rounded anywhere)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        (F.col("l_linenumber") % 3).alias("line_mod3"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props) + aggregation. At scale:
    get_json_object is codegen'd JSON path evaluation — no UDF; for hot
    columns, materialize once with from_json into a struct column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           round(sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                                  (a, b) -> a + b)), 6) AS l2_norm,
           round(list_reduce(embedding::DOUBLE[], (a, b) -> a + b)
                 / len(embedding), 6) AS avg_val
    FROM embeddings
    WHERE vec_id % 10 = 0
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order family over the embedding column — all inside
    whole-stage codegen (functions/vectors.py)."""
    from kafka_etl_consumer_spark.functions.vectors import as_double, l2_norm

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    emb = as_double("embedding")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.round(l2_norm("embedding"), 6).alias("l2_norm"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6
        ).alias("avg_val"),
    )


@register(
    "explode_tokens",
    oracle="""
    SELECT t AS token, count(*) AS n
    FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                    t -> len(t) > 0)) AS t
          FROM documents)
    GROUP BY t
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + agg + top-k: the canonical token-count pipeline. At scale
    the explode multiplies rows ~tokens-per-doc ×; partial aggregation
    collapses them map-side before the single shuffle."""
    from kafka_etl_consumer_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# event-time windows (batch mode of the streaming operators)
# ---------------------------------------------------------------------------


@register(
    "win_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS ws,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window — identical expression works on a stream
    with withWatermark (streaming/windows.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "n_events", "sum_value")
    )


@register(
    "win_sliding",
    oracle="""
    -- every event belongs to exactly two 30min/15min-slide windows:
    -- the one starting at its 15-min bucket and the one 15 min earlier
    SELECT ws, count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS ws, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - INTERVAL '15 minutes' AS ws, value FROM events)
    GROUP BY ws
    """,
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "n_events", "sum_value")
    )


@register(
    "win_session",
    oracle="""
    -- gaps-and-islands replica of session_window(ts, 30 min): a new session
    -- starts when the gap is >= 30 min (Spark sessions cover [ts, ts+gap))
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked)
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-min gap) per user — batch mode of the streaming
    session operator; the oracle is the classic gaps-and-islands SQL."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value"
        )
    )


@register(
    "win_range_frame",
    oracle="""
    -- floor(epoch) to WHOLE seconds: Spark's unix_timestamp truncates
    -- sub-second precision, while DuckDB's epoch() is a fractional
    -- DOUBLE — an event sitting 900.x s back flips frame membership
    -- (surfaced by the r10 full-sweep at sf0.1; invisible below it)
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           round(sum(value) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               RANGE BETWEEN 900 PRECEDING AND CURRENT ROW), 4) AS trailing_15m,
           CAST(count(*) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
               RANGE BETWEEN 900 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_15m
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed by TIME, not row count: each event's trailing
    15-minute sum/count per user. Unlike a rows-frame, co-timestamped
    events share one frame and gaps shrink it — the semantics monitoring
    queries actually want. One shuffle on user_id serves both exprs; the
    frame is evaluated with a sliding two-pointer over the sorted
    partition (no per-row rescan)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-900, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("trailing_15m"),
        F.count("*").over(w).alias("n_15m"),
    )


@register(
    "null_semantics",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n,
           count(nullif(l_returnflag, 'N')) AS n_flagged,
           CAST(sum(CASE WHEN nullif(l_returnflag, 'N')
                              IS NOT DISTINCT FROM nullif(l_linestatus, 'O')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
           coalesce(max(nullif(l_returnflag, 'N')), 'none') AS max_flag
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling corner: nullif manufactures NULLs, count() skips them,
    eqNullSafe (IS NOT DISTINCT FROM) treats NULL=NULL as true where plain
    `=` yields NULL, coalesce restores a default. Same single-shuffle hash
    agg as any groupBy — null semantics are free, getting them identical
    across engines is the point."""
    li = _t(spark, sf_dir, "lineitem")
    nf = F.nullif(F.col("l_returnflag"), F.lit("N"))
    nl = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.count(nf).alias("n_flagged"),
        F.sum(F.when(nf.eqNullSafe(nl), 1).otherwise(0)).cast("bigint").alias(
            "n_nullsafe_eq"
        ),
        F.coalesce(F.max(nf), F.lit("none")).alias("max_flag"),
    )


@register(
    "width_bucket_hist",
    oracle="""
    -- width_bucket replica (DuckDB lacks it): floor((x-lo)/((hi-lo)/n))+1,
    -- clamped to 0 / n+1 — the exact double arithmetic Spark's WidthBucket
    -- evaluates, so boundary rounding agrees bit-for-bit
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 13
                     ELSE floor((o_totalprice - 0) / ((600000.0 - 0.0) / 12)) + 1
                END AS INT) AS bucket,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY bucket
    """,
)
def width_bucket_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — the single-pass binning
    primitive (vs ntile's rank-based quartiles, which need a sort). One
    hash-agg on the bucket id; at 100 TB this is the cheapest histogram
    there is: no sort, no sampling, partial counts collapse map-side."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).cast("int").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           m['t'][1] AS type_from_map,
           CAST(cardinality(m) AS INT) AS map_size,
           array_to_string(map_keys(m), ',') AS keys_csv
    FROM (SELECT event_id,
                 MAP {'t': event_type, 'u': CAST(user_id AS VARCHAR)} AS m
          FROM events
          WHERE event_id % 25 = 0)
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function family: construct, extract by key, size, key listing —
    all codegen. Output columns are scalars (not the map itself) so the
    cross-engine hash compares values, not engine-specific map encodings.
    Insertion order is preserved by both engines' map constructors, making
    keys_csv deterministic."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    m = F.create_map(
        F.lit("t"), F.col("event_type"), F.lit("u"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "t").alias("type_from_map"),
        F.size(m).alias("map_size"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


@register(
    "json_struct_parse",
    oracle="""
    SELECT user_id % 50 AS user_bucket,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY user_bucket
    """,
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct (vs json_funcs' per-path
    get_json_object): ONE parse per row serves every field — materialize
    the struct once when several fields are read; per-path extraction
    re-parses the document per path at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT").alias("p")
    return (
        ev.select((F.col("user_id") % 50).alias("user_bucket"), parsed)
        .groupBy("user_bucket")
        .agg(F.sum("p.k").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "str_pad_trim",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           rpad(c_mktsegment, 12, '.') AS seg_padded,
           trim('  ' || c_name || '  ') AS name_trim,
           ltrim('xxx' || c_name, 'x') AS name_ltrim,
           rtrim(c_name || 'zz', 'z') AS name_rtrim
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
)
def str_pad_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding/trimming family — fixed-width key formatting (lpad '0' is
    the classic sortable zero-pad) and character-set trims."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.ltrim(F.concat(F.lit("xxx"), F.col("c_name")), F.lit("x")).alias("name_ltrim"),
        F.rtrim(F.concat(F.col("c_name"), F.lit("zz")), F.lit("z")).alias("name_rtrim"),
    )


@register(
    "bit_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS key_low_byte,
           l_orderkey | 7 AS key_or7,
           xor(l_orderkey, l_linenumber) AS key_xor_line,
           l_orderkey << 2 AS key_shl2,
           l_orderkey >> 4 AS key_shr4,
           CAST(bit_count(l_orderkey) AS INT) AS key_popcount
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    """,
)
def bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (the primitives behind the engine's own simhash/band
    operators, exposed as a query surface)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("key_low_byte"),
        (F.col("l_orderkey").bitwiseOR(F.lit(7))).alias("key_or7"),
        (F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("bigint"))).alias(
            "key_xor_line"
        ),
        F.shiftleft(F.col("l_orderkey"), 2).alias("key_shl2"),
        F.shiftright(F.col("l_orderkey"), 4).alias("key_shr4"),
        F.bit_count("l_orderkey").alias("key_popcount"),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT event_id, nullif(event_type, 'error') AS k, user_id
               FROM events WHERE event_id % 20 = 0),
         r AS (SELECT nullif(event_type, 'error') AS k,
                      count(*) AS n_type
               FROM events
               GROUP BY 1)
    SELECT l.event_id, coalesce(l.k, '<null>') AS join_key, l.user_id, r.n_type
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of silently dropping — the semantics dedup and SCD
    merges need on nullable business keys (a plain `=` join loses every
    null-keyed row without an error). Spark plans eqNullSafe as a HASH
    join on the null-wrapped key, same single shuffle as `=` — null
    safety costs nothing; knowing which semantics you asked for is the
    point."""
    ev = _t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error"))
    l = ev.filter(F.col("event_id") % 20 == 0).select(
        "event_id", k.alias("k"), "user_id"
    )
    r = ev.groupBy(k.alias("k")).agg(F.count("*").alias("n_type"))
    return (
        l.join(r, l.k.eqNullSafe(r.k))
        .select(
            l.event_id,
            F.coalesce(l.k, F.lit("<null>")).alias("join_key"),
            l.user_id,
            r.n_type,
        )
    )
