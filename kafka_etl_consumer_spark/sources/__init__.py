from kafka_etl_consumer_spark.sources.tables import TABLES, load_table, load_tables
from kafka_etl_consumer_spark.sources.scan import (
    scan_avro,
    scan_csv,
    scan_json,
    scan_parquet,
    write_csv,
    write_json,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "scan_avro",
    "scan_csv",
    "scan_json",
    "scan_parquet",
    "write_csv",
    "write_json",
    "write_parquet",
]
