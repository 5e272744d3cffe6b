"""Kafka streaming-source builder (S1: ETLTask.java:236,247 equivalent).

Production path only — requires the ``spark-sql-kafka-0-10`` package on the
classpath (not present in this test container, so tests exercise the rest
of the pipeline through file/memory sources projected to the same shape;
see streaming/ingest.py ``ingest`` docstring).

Mapping from the reference's consumer config (KafkaETLParquetConsumer.java):
- topic list + consumer group  → ``subscribe`` / ``kafka.group.id``
- poll timeout (ctor arg)      → internal to the micro-batch planner
- enable.auto.commit=false (forced, :49) → Spark never uses Kafka
  auto-commit; progress lives in the checkpoint
- session.timeout.ms etc.      → passed through with the ``kafka.`` prefix
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_source_options(
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
    max_offsets_per_trigger: int | None = None,
    consumer_options: dict[str, str] | None = None,
) -> dict[str, str]:
    """The exact option map ``kafka_source`` passes to the Kafka reader —
    split out so the reference-config translation (group id, prefixing,
    backpressure, offset-range splitting) is unit-testable in a container
    with no Kafka jar (the ``.load()`` call is the only part that needs
    the classpath)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true",
    }
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in (consumer_options or {}).items():
        key = k if k.startswith("kafka.") else f"kafka.{k}"
        opts[key] = v
    return opts


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
    max_offsets_per_trigger: int | None = None,
    consumer_options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming DataFrame with Kafka-source columns
    (key, value, topic, partition, offset, timestamp, timestampType).

    ``min_partitions``: at high throughput set this above the topic's
    partition count — Spark then splits offset ranges so ingest parallelism
    is no longer capped at #Kafka-partitions (the reference's hard limit,
    README.md:10 of the reference).

    ``max_offsets_per_trigger``: backpressure — caps records per
    micro-batch so a restart after downtime catches up in bounded batches
    instead of one giant batch (the reference has no equivalent: its poll
    loop takes whatever poll() returns and write latency grows unbounded).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers,
        topics,
        starting_offsets,
        min_partitions,
        max_offsets_per_trigger,
        consumer_options,
    ).items():
        reader = reader.option(k, v)
    return reader.load()
