from kafka_etl_consumer_spark.streaming.drift import (
    cusum_monitor,
    page_hinkley_monitor,
)
from kafka_etl_consumer_spark.streaming.heavy_hitters import misra_gries_monitor
from kafka_etl_consumer_spark.streaming.ingest import (
    IntervalUnit,
    decode_avro,
    encode_avro,
    ingest,
    rolling_trigger,
)

__all__ = [
    "IntervalUnit",
    "cusum_monitor",
    "decode_avro",
    "encode_avro",
    "ingest",
    "misra_gries_monitor",
    "page_hinkley_monitor",
    "rolling_trigger",
]
