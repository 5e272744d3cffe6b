"""Run the reference-shaped ingest facade end-to-end without Kafka.

Constructs KafkaETLParquetConsumer with the reference's five arguments and
parquetProps keys, feeds it a file-stream of binary-Avro events (the test
seam; production passes bootstrap servers and omits source_df), and lands
date-partitioned snappy parquet in the reference's directory layout.

    python examples/ingest_example.py
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import types as T

from kafka_etl_consumer_spark.api import KafkaETLParquetConsumer
from kafka_etl_consumer_spark.avro_codec import encode_record, parse_schema
from kafka_etl_consumer_spark.fixtures import (
    ITEM_VIEW_EVENT_AVSC,
    ITEM_VIEW_EVENT_TOPIC,
    item_view_events,
)
from kafka_etl_consumer_spark.schema.registry import DictSchemaRegistry
from kafka_etl_consumer_spark.session import get_spark

ENVELOPE = T.StructType(
    [T.StructField("topic", T.StringType()), T.StructField("value", T.BinaryType())]
)


def main() -> None:
    spark = get_spark(app_name="ingest-example")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest-example-")

    schema = parse_schema(ITEM_VIEW_EVENT_AVSC)
    rows = [
        Row(topic=ITEM_VIEW_EVENT_TOPIC, value=bytearray(encode_record(schema, r)))
        for r in item_view_events(100)
    ]
    src = f"{work}/src"
    spark.createDataFrame(rows, ENVELOPE).write.parquet(src)

    consumer = KafkaETLParquetConsumer(
        {"bootstrap.servers": "localhost:9092", "group.id": "example"},
        [ITEM_VIEW_EVENT_TOPIC],
        1000,
        {
            "output": f"{work}/out",
            "date.format": "yyyy-MM-dd/HH/mm",
            "interval.unit": "MINUTE",
            "interval": "1",
        },
        DictSchemaRegistry({ITEM_VIEW_EVENT_TOPIC: ITEM_VIEW_EVENT_AVSC}),
        spark=spark,
        source_df=spark.readStream.schema(ENVELOPE).parquet(src),
    )
    for q in consumer.run():
        q.processAllAvailable()
    consumer.stop()

    landed = glob.glob(f"{work}/out/{ITEM_VIEW_EVENT_TOPIC}/**/*.parquet", recursive=True)
    print(f"landed {len(landed)} parquet file(s) under {work}/out/{ITEM_VIEW_EVENT_TOPIC}/")
    back = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{work}/out/{ITEM_VIEW_EVENT_TOPIC}"
    )
    back.select("itemId", "price", "baseProperties.deviceType").show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
