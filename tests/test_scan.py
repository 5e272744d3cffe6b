"""Round-trip tests for the non-Parquet batch formats (sources/scan.py):
parquet → csv/json → scan back with explicit schema → row equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.sources.scan import (
    scan_csv,
    scan_json,
    scan_parquet,
    write_csv,
    write_json,
    write_parquet,
)

SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return scan_parquet(spark, f"{sf_dir}/nation.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = scan_csv(spark, out, schema=SCHEMA)
    assert back.schema == SCHEMA
    assert _rows(back) == _rows(nation)


def test_json_round_trip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_json")
    write_json(nation, out)
    back = scan_json(spark, out, schema=SCHEMA)
    assert _rows(back) == _rows(nation)


def test_parquet_partitioned_write(spark, nation, tmp_path):
    out = str(tmp_path / "nation_part")
    write_parquet(nation, out, partition_by=["n_regionkey"])
    back = spark.read.parquet(out)
    # partition pruning: one directory read, filter reaches no data files
    one = back.filter(F.col("n_regionkey") == 2)
    assert one.count() == nation.filter(F.col("n_regionkey") == 2).count()
    assert _rows(back.select(*SCHEMA.fieldNames())) == _rows(nation)


def test_schema_required(spark, tmp_path):
    with pytest.raises(ValueError):
        scan_csv(spark, str(tmp_path), schema=None)
    with pytest.raises(ValueError):
        scan_json(spark, str(tmp_path), schema=None)
