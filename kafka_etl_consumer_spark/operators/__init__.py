from kafka_etl_consumer_spark.operators.joins import asof_join, range_join

__all__ = ["asof_join", "range_join"]
