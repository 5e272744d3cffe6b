"""Tests for the Kafka source builder (S1, ETLTask.java:236-247).

The container has no Kafka jar or broker, so the option-map translation —
the part of S1 this engine actually owns — is unit-tested directly, and a
live end-to-end read is env-gated behind SPARK_GRAFT_KAFKA_BOOTSTRAP for
environments that have both."""

from __future__ import annotations

import os

import pytest

from kafka_etl_consumer_spark.sources.kafka import (
    kafka_source,
    kafka_source_options,
)


def test_option_map_basics():
    opts = kafka_source_options("broker:9092", ["item-view-event", "cart-event"])
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "item-view-event,cart-event"
    assert opts["startingOffsets"] == "earliest"
    # the reference forces enable.auto.commit=false
    # (KafkaETLParquetConsumer.java:49); Spark's source never uses Kafka
    # auto-commit at all, so there must be no such option to get wrong
    assert "kafka.enable.auto.commit" not in opts
    assert opts["failOnDataLoss"] == "true"


def test_consumer_options_get_kafka_prefix():
    # reference config keys (session.timeout.ms etc.) pass through with
    # the kafka. prefix, already-prefixed keys aren't double-prefixed
    opts = kafka_source_options(
        "b:9092",
        ["t"],
        consumer_options={
            "group.id": "etl-group",
            "session.timeout.ms": "30000",
            "kafka.max.poll.records": "500",
        },
    )
    assert opts["kafka.group.id"] == "etl-group"
    assert opts["kafka.session.timeout.ms"] == "30000"
    assert opts["kafka.max.poll.records"] == "500"
    assert "kafka.kafka.max.poll.records" not in opts


def test_backpressure_and_split_options():
    opts = kafka_source_options(
        "b:9092", ["t"], min_partitions=64, max_offsets_per_trigger=100_000
    )
    assert opts["minPartitions"] == "64"
    assert opts["maxOffsetsPerTrigger"] == "100000"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason="no live Kafka broker configured (set SPARK_GRAFT_KAFKA_BOOTSTRAP)",
)
def test_live_kafka_read(spark):
    df = kafka_source(
        spark,
        os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"],
        os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "item-view-event").split(","),
    )
    assert set(["key", "value", "topic", "partition", "offset"]) <= set(df.columns)
