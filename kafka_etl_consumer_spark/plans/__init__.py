from kafka_etl_consumer_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
