"""Query surface batch 30 (round 4): video shot boundaries, sketch set
algebra.

- shot-boundary detection over per-document frame sequences — the
  video-curation primitive (split footage at cuts before sampling
  training frames); frame decode is a REAL byte-buffer numpy path on
  deterministic synthetic frames (no video codec in this container —
  the mapInPandas stage is exactly where a ffmpeg/pyav decode drops in)
- theta-sketch union / intersection / Jaccard between two user sets —
  the KMV sketch's killer feature over HLL: set ALGEBRA, not just
  cardinality, reported beside the exact answers

The reference has no analytics surface (pass-through ETL,
ETLTask.java:261-283); these extend the driver-verified operator
families the brief requires. Every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.functions.hashing import hash64, hash64_sql
from kafka_etl_consumer_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# multimodal_shot_bounds — 12 frames x 64 bytes per doc, planted cut at
# frame (doc_id % 11 + 1): mean-luma jump > 16 marks a boundary. Pixel
# (d, f, j) = ((d%80) + f + j + 100*[f >= cut]) % 256 — the base stays
# under 80 so the byte values never wrap and the cut is the only jump.
# ---------------------------------------------------------------------------

_SHOT_ORACLE = """
WITH px AS (
  SELECT d.doc_id, t.f,
         ((d.doc_id % 80) + t.f + j.j +
          CASE WHEN t.f >= d.doc_id % 11 + 1 THEN 100 ELSE 0 END) % 256 AS v
  FROM documents d, range(0, 12) t(f), range(0, 64) j(j)
),
fr AS (SELECT doc_id, f, avg(v) AS m FROM px GROUP BY doc_id, f),
df AS (SELECT doc_id, f, m,
              m - lag(m) OVER (PARTITION BY doc_id ORDER BY f) AS dm
       FROM fr)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN abs(dm) > 16 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boundaries,
       CAST(min(CASE WHEN abs(dm) > 16 THEN f END) AS BIGINT)
         AS first_boundary_frame
FROM df GROUP BY doc_id
"""


@register("multimodal_shot_bounds", _SHOT_ORACLE)
def multimodal_shot_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot boundaries per synthetic 12-frame clip: frame means decoded
    from REAL byte buffers (numpy frombuffer over synthesized frames —
    swap the generator for a video-decode call and nothing downstream
    changes), then a per-doc lag window flags mean-luma jumps > 16.
    Scale: the decode is an Arrow-batched narrow map (one output row
    per frame, never materializing pixels in the plan); the boundary
    logic runs JVM-side on the |docs| x 12 frame table."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("f", T.IntegerType()),
            T.StructField("m", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "f": [], "m": []}
            for d in pdf["doc_id"]:
                d = int(d)
                cut, base = d % 11 + 1, d % 80
                for f in range(12):
                    shift = 100 if f >= cut else 0
                    buf = bytes((base + f + j + shift) % 256 for j in range(64))
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    out["doc_id"].append(d)
                    out["f"].append(f)
                    out["m"].append(float(arr.mean()))
            yield pd.DataFrame(out)

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    fr = docs.mapInPandas(gen, schema)
    w = Window.partitionBy("doc_id").orderBy("f")
    df = fr.withColumn("dm", F.col("m") - F.lag("m").over(w))
    hit = F.abs(F.col("dm")) > 16
    return df.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_boundaries"),
        F.min(F.when(hit, F.col("f"))).cast("bigint").alias(
            "first_boundary_frame"
        ),
    )


# ---------------------------------------------------------------------------
# sketch_theta_set_ops — KMV/theta set algebra between viewer and
# purchaser user sets: keep users whose hash < 2^60/256, estimate
# |A u B| and |A n B| as kept-counts x 256, beside the exact values.
# ---------------------------------------------------------------------------

_THETA_T = 4503599627370496  # 2^60 / 256

_TSO_ORACLE = f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
ka AS (SELECT user_id FROM a
       WHERE {hash64_sql("CAST(user_id AS VARCHAR)")} < {_THETA_T}),
kb AS (SELECT user_id FROM b
       WHERE {hash64_sql("CAST(user_id AS VARCHAR)")} < {_THETA_T}),
m AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM
       (SELECT user_id FROM ka UNION SELECT user_id FROM kb)) AS ku,
    (SELECT CAST(count(*) AS BIGINT) FROM ka
       WHERE user_id IN (SELECT user_id FROM kb)) AS ki,
    (SELECT CAST(count(*) AS BIGINT) FROM
       (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS xu,
    (SELECT CAST(count(*) AS BIGINT) FROM a
       WHERE user_id IN (SELECT user_id FROM b)) AS xi
)
SELECT ku * 256 AS est_union, xu AS exact_union,
       ki * 256 AS est_intersect, xi AS exact_intersect,
       round(ki / CAST(nullif(ku, 0) AS DOUBLE), 6) AS est_jaccard,
       round(xi / CAST(xu AS DOUBLE), 6) AS exact_jaccard
FROM m
"""


@register("sketch_theta_set_ops", _TSO_ORACLE)
def sketch_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch union/intersection/Jaccard of viewer vs purchaser
    user sets, beside the exact values. Scale: the sketch branch
    filters to ~1/256 of distinct users BEFORE any shuffle (the whole
    point — sketch set algebra runs on kept-sample tables that fit in
    one task at any corpus size), and the same kept sets serve union,
    intersection, and Jaccard. The exact branch is the audit
    comparison, not the scale path."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    a = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    keep = hash64(F.col("user_id").cast("string")) < F.lit(_THETA_T)
    ka, kb = a.filter(keep), b.filter(keep)
    ku = ka.unionAll(kb).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("ku")
    )
    ki = ka.join(kb, "user_id", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("ki")
    )
    xu = a.unionAll(b).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("xu")
    )
    xi = a.join(b, "user_id", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("xi")
    )
    m = (
        ku.crossJoin(F.broadcast(ki))
        .crossJoin(F.broadcast(xu))
        .crossJoin(F.broadcast(xi))
    )
    return m.select(
        (F.col("ku") * 256).alias("est_union"),
        F.col("xu").alias("exact_union"),
        (F.col("ki") * 256).alias("est_intersect"),
        F.col("xi").alias("exact_intersect"),
        F.round(
            F.col("ki") / F.nullif(F.col("ku"), F.lit(0)).cast("double"), 6
        ).alias("est_jaccard"),
        F.round(F.col("xi") / F.col("xu").cast("double"), 6).alias(
            "exact_jaccard"
        ),
    )
