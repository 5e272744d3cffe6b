from kafka_etl_consumer_spark.streaming.ingest import (
    IntervalUnit,
    decode_avro,
    encode_avro,
    ingest,
    rolling_trigger,
)

__all__ = ["IntervalUnit", "decode_avro", "encode_avro", "ingest", "rolling_trigger"]
