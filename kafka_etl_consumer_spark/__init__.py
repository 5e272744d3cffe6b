"""kafka_etl_consumer_spark — a PySpark-native analytics + ingest engine.

A from-scratch, idiomatic-Spark re-expression of the capabilities of the
reference ETL daemon ``mykidong/kafka-etl-consumer`` (Kafka → Avro-decode →
time-partitioned Snappy Parquet; reference entry point
``KafkaETLParquetConsumer.run()``, KafkaETLParquetConsumer.java:58-69),
plus the batch analytics surface those landed Parquet tables exist to serve
(SURVEY.md §2.2) and large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout:
- ``session``       — SparkSession builder with the 100-TB-posture configs
- ``avro_codec``    — pure-Python Avro binary codec + avsc↔StructType
- ``schema``        — per-topic schema registry SPI (classpath / Consul / dict)
- ``sources``       — table loaders and source builders (parquet/kafka/file)
- ``streaming``     — the ingest pipeline (reference parity) + event-time ops
- ``functions``     — cross-engine-deterministic column builders
- ``operators``     — joins (as-of/range), dedup, similarity, text, multimodal
- ``plans``         — the registered query surface verified against DuckDB
"""

from kafka_etl_consumer_spark.session import get_spark


def __getattr__(name: str):
    # lazy: the facade pulls in streaming/ingest; keep bare import light
    if name == "KafkaETLParquetConsumer":
        from kafka_etl_consumer_spark.api import KafkaETLParquetConsumer

        return KafkaETLParquetConsumer
    raise AttributeError(name)


__all__ = ["get_spark", "KafkaETLParquetConsumer"]
__version__ = "0.1.0"
