"""Stream-static enrichment and parquet schema evolution.

- A streaming fact enriched with a static dimension (the broadcast-state
  pattern: the dim re-resolves per micro-batch, so dimension updates are
  picked up without restarting the query).
- Reading a parquet directory whose files were written under EVOLVING
  schemas (mergeSchema): old files surface the new column as NULL — the
  posture a long-lived ingest directory needs when producers add fields.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

FACT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_stream_static_join_enriches_each_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    dim_path = str(tmp_path / "dim")

    spark.createDataFrame(
        [Row(user_id=1, segment="gold"), Row(user_id=2, segment="base")]
    ).write.parquet(dim_path)

    spark.createDataFrame(
        [Row(user_id=1, amount=10.0), Row(user_id=2, amount=5.0), Row(user_id=3, amount=1.0)],
        FACT,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(FACT).parquet(src)
    dim = spark.read.parquet(dim_path)
    enriched = stream.join(F.broadcast(dim), "user_id", "left").select(
        "user_id", "amount", F.coalesce("segment", F.lit("unknown")).alias("segment")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: r.segment for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == {1: "gold", 2: "base", 3: "unknown"}


def test_parquet_merge_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    # v1 files: (id, a)
    spark.createDataFrame([Row(id=1, a="x")]).write.mode("append").parquet(path)
    # v2 files add a column: (id, a, b)
    spark.createDataFrame([Row(id=2, a="y", b=42)]).write.mode("append").parquet(path)

    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", 42)}

    # pruning still works on the merged schema: selecting only old columns
    # must not fail on old files
    assert spark.read.option("mergeSchema", "true").parquet(path).select(
        "id", "a"
    ).count() == 2
