from kafka_etl_consumer_spark.schema.registry import (
    ConsulSchemaRegistry,
    DictSchemaRegistry,
    FileSchemaRegistry,
    SchemaRegistry,
)

__all__ = [
    "SchemaRegistry",
    "DictSchemaRegistry",
    "FileSchemaRegistry",
    "ConsulSchemaRegistry",
]
