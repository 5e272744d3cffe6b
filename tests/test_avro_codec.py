"""Codec unit tests: binary round-trip across the full type lattice, plus
avsc↔StructType translation (SURVEY.md §1.2 mapping table)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from kafka_etl_consumer_spark.avro_codec import (
    decode_record,
    encode_record,
    from_spark_struct,
    parse_schema,
    to_spark_struct,
)
from kafka_etl_consumer_spark.fixtures import ITEM_VIEW_EVENT_AVSC, item_view_events

FULL_AVSC = {
    "type": "record",
    "name": "Everything",
    "namespace": "t",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "ns", "type": ["null", "string"]},
        {"name": "nl", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
        {"name": "e", "type": {"type": "enum", "name": "Color", "symbols": ["RED", "BLUE"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "Four", "size": 4}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "long"}, {"name": "again", "type": ["null", "Inner"]}],
            },
        },
    ],
}

FULL_ROW = {
    "b": True,
    "i": -42,
    "l": 2**60,
    "f": 1.5,
    "d": -3.25,
    "s": "héllo",
    "by": b"\x00\x01\xff",
    "ns": None,
    "nl": 7,
    "arr": [1, -2, 3],
    "m": {"a": 0.5, "b": -1.0},
    "e": "BLUE",
    "fx": b"ABCD",
    "nested": {"x": 9, "again": {"x": 10, "again": None}},
}


def test_roundtrip_full_lattice():
    schema = parse_schema(json.dumps(FULL_AVSC))
    assert decode_record(schema, encode_record(schema, FULL_ROW)) == FULL_ROW


def test_roundtrip_item_view_event():
    schema = parse_schema(ITEM_VIEW_EVENT_AVSC)
    for row in item_view_events(10):
        assert decode_record(schema, encode_record(schema, row)) == row


def test_zigzag_edges():
    schema = parse_schema(json.dumps({
        "type": "record", "name": "R", "fields": [{"name": "v", "type": "long"}]
    }))
    for v in (0, -1, 1, 63, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert decode_record(schema, encode_record(schema, {"v": v})) == {"v": v}


def test_to_spark_struct_item_view_event():
    st = to_spark_struct(ITEM_VIEW_EVENT_AVSC)
    base = st["baseProperties"].dataType
    assert isinstance(base, T.StructType)
    assert base["eventType"].dataType == T.StringType()
    assert base["eventType"].nullable is False  # the one required field
    assert base["timestamp"].dataType == T.LongType()
    assert base["timestamp"].nullable is True
    assert st["price"].dataType == T.LongType()
    assert st["price"].nullable is True


def test_to_spark_struct_full_lattice():
    nonrec = json.loads(json.dumps(FULL_AVSC))
    nonrec["fields"][-1]["type"]["fields"] = [{"name": "x", "type": "long"}]
    st = to_spark_struct(json.dumps(nonrec))
    assert st["arr"].dataType == T.ArrayType(T.LongType(), False)
    assert st["m"].dataType == T.MapType(T.StringType(), T.DoubleType(), False)
    assert st["e"].dataType == T.StringType()
    assert st["fx"].dataType == T.BinaryType()
    assert isinstance(st["nested"].dataType, T.StructType)


def test_recursive_record_fails_fast_for_spark_but_decodes():
    # Recursive Avro is decodable (data terminates the recursion) but has no
    # Spark type — translation must raise, codec must round-trip.
    schema = parse_schema(json.dumps(FULL_AVSC))
    assert decode_record(schema, encode_record(schema, FULL_ROW)) == FULL_ROW
    with pytest.raises(ValueError, match="recursive"):
        to_spark_struct(json.dumps(FULL_AVSC))


def test_multibranch_union_fails_fast():
    avsc = json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "u", "type": ["string", "long"]}],
    })
    with pytest.raises(ValueError, match="multi-branch"):
        to_spark_struct(avsc)


def test_spark_to_avro_roundtrip():
    st = T.StructType([
        T.StructField("a", T.LongType(), True),
        T.StructField("s", T.StructType([T.StructField("x", T.StringType(), False)]), False),
        T.StructField("arr", T.ArrayType(T.DoubleType(), False), False),
    ])
    avsc = from_spark_struct(st)
    assert to_spark_struct(json.dumps(avsc)) == st
