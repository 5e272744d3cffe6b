from kafka_etl_consumer_spark.streaming.drift import page_hinkley_monitor
from kafka_etl_consumer_spark.streaming.ingest import (
    IntervalUnit,
    decode_avro,
    encode_avro,
    ingest,
    rolling_trigger,
)

__all__ = [
    "IntervalUnit",
    "decode_avro",
    "encode_avro",
    "ingest",
    "page_hinkley_monitor",
    "rolling_trigger",
]
