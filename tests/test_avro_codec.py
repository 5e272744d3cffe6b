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


def test_multibranch_union_member_struct():
    # spark-avro SchemaConverters semantics: a non-null multi-branch union
    # becomes struct<member0, member1, ...>, exactly one member set per value
    avsc = {
        "type": "record", "name": "R",
        "fields": [{"name": "u", "type": ["string", "long", "null"]}],
    }
    st = to_spark_struct(json.dumps(avsc))
    assert st["u"].dataType == T.StructType([
        T.StructField("member0", T.StringType(), True),
        T.StructField("member1", T.LongType(), True),
    ])
    assert st["u"].nullable  # "null" is a branch
    tree = parse_schema(json.dumps(avsc))
    for row in (
        {"u": {"member0": "s", "member1": None}},
        {"u": {"member0": None, "member1": 99}},
        {"u": None},
    ):
        assert decode_record(tree, encode_record(tree, row)) == row


def test_union_numeric_widening():
    # [int,long] → LongType, [float,double] → DoubleType (spark-avro parity)
    avsc = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "il", "type": ["int", "long"]},
            {"name": "fd", "type": ["null", "float", "double"]},
        ],
    }
    st = to_spark_struct(json.dumps(avsc))
    assert st["il"].dataType == T.LongType() and not st["il"].nullable
    assert st["fd"].dataType == T.DoubleType() and st["fd"].nullable
    tree = parse_schema(json.dumps(avsc))
    row = {"il": 5, "fd": 2.5}
    assert decode_record(tree, encode_record(tree, row)) == row
    assert decode_record(tree, encode_record(tree, {"il": 2**50, "fd": None})) == {
        "il": 2**50, "fd": None,
    }


LOGICAL_AVSC = {
    "type": "record", "name": "L",
    "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts_ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "ts_us", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "lts", "type": {"type": "long", "logicalType": "local-timestamp-micros"}},
        {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}},
        {"name": "fdec", "type": {"type": "fixed", "name": "F8", "size": 8,
                                  "logicalType": "decimal", "precision": 18, "scale": 4}},
        {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "tm", "type": {"type": "int", "logicalType": "time-millis"}},
    ],
}


def test_logical_types_spark_mapping():
    st = to_spark_struct(json.dumps(LOGICAL_AVSC))
    assert st["d"].dataType == T.DateType()
    assert st["ts_ms"].dataType == T.TimestampType()
    assert st["ts_us"].dataType == T.TimestampType() and st["ts_us"].nullable
    assert st["lts"].dataType == T.TimestampNTZType()
    assert st["dec"].dataType == T.DecimalType(10, 2)
    assert st["fdec"].dataType == T.DecimalType(18, 4)
    assert st["uid"].dataType == T.StringType()  # uuid passes through
    assert st["tm"].dataType == T.IntegerType()  # time-millis passes through


def test_logical_types_roundtrip():
    import datetime as dt
    import decimal

    tree = parse_schema(json.dumps(LOGICAL_AVSC))
    row = {
        "d": dt.date(2024, 2, 29),
        "ts_ms": dt.datetime(2024, 2, 29, 23, 59, 59, 123000),
        "ts_us": dt.datetime(1969, 7, 20, 20, 17, 0, 1),  # pre-epoch-ish, µs
        "lts": dt.datetime(2024, 1, 1, 0, 0, 0, 42),
        "dec": decimal.Decimal("-12345678.90"),
        "fdec": decimal.Decimal("99999999999999.9999"),
        "uid": "123e4567-e89b-12d3-a456-426614174000",
        "tm": 86_399_999,
    }
    assert decode_record(tree, encode_record(tree, row)) == row
    # raw base values (epoch units) encode too — the fixture-producer path
    raw = dict(row, d=19_782, ts_ms=0, ts_us=None)
    out = decode_record(tree, encode_record(tree, raw))
    import datetime as dt2
    assert out["d"] == dt2.date(1970, 1, 1) + dt2.timedelta(days=19_782)
    assert out["ts_ms"] == dt2.datetime(1970, 1, 1)
    assert out["ts_us"] is None


def test_spark_to_avro_roundtrip():
    st = T.StructType([
        T.StructField("a", T.LongType(), True),
        T.StructField("s", T.StructType([T.StructField("x", T.StringType(), False)]), False),
        T.StructField("arr", T.ArrayType(T.DoubleType(), False), False),
    ])
    avsc = from_spark_struct(st)
    assert to_spark_struct(json.dumps(avsc)) == st


def test_schema_resolution_promotions_unions_enums_skip():
    """Codec-level Avro schema resolution (round 4): promotions
    (int->long, int->double-in-union, string->bytes, bytes->string),
    writer-only field skip (including a nested record), reader defaults
    (primitive, record, array), union branch re-matching, and enum
    fallback to the reader's default symbol."""
    from kafka_etl_consumer_spark.avro_codec import (
        decode_record_resolved,
        encode_record,
        parse_schema,
    )

    writer = parse_schema("""{
      "type": "record", "name": "Evt", "fields": [
        {"name": "id", "type": "int"},
        {"name": "price", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "blob", "type": "bytes"},
        {"name": "tag", "type": {"type": "enum", "name": "Tag",
                                 "symbols": ["A", "B", "LEGACY"]}},
        {"name": "nested", "type": {"type": "record", "name": "Sub",
          "fields": [{"name": "x", "type": "long"},
                     {"name": "ys", "type": {"type": "array", "items": "int"}}]}},
        {"name": "maybe", "type": ["null", "int"]}]}""")
    reader = parse_schema("""{
      "type": "record", "name": "Evt", "fields": [
        {"name": "id", "type": "long"},
        {"name": "price", "type": ["null", "double"]},
        {"name": "name", "type": "bytes"},
        {"name": "blob", "type": "string"},
        {"name": "tag", "type": {"type": "enum", "name": "Tag",
                                 "symbols": ["A", "B", "C"], "default": "C"}},
        {"name": "maybe", "type": ["null", "long"]},
        {"name": "channel", "type": "string", "default": "web"},
        {"name": "weights", "type": {"type": "array", "items": "double"},
         "default": [1.0, 2.0]},
        {"name": "meta", "type": {"type": "record", "name": "Meta",
          "fields": [{"name": "v", "type": "int", "default": 7}]},
         "default": {}}]}""")

    payload = encode_record(writer, {
        "id": 5, "price": 42, "name": "abc", "blob": b"\x01\x02",
        "tag": "LEGACY",
        "nested": {"x": 9, "ys": [1, 2, 3]},   # dropped by the reader
        "maybe": 17,
    })
    got = decode_record_resolved(writer, reader, payload)
    assert got == {
        "id": 5,                      # int -> long
        "price": 42.0,                # int -> double via reader union
        "name": b"abc",               # string -> bytes
        "blob": "\x01\x02",           # bytes -> string (utf-8)
        "tag": "C",                   # unknown symbol -> reader default
        "maybe": 17,                  # union int branch -> reader long
        "channel": "web",             # reader-added primitive default
        "weights": [1.0, 2.0],        # reader-added array default
        "meta": {"v": 7},             # reader-added record: field defaults
    }
    assert isinstance(got["price"], float) and isinstance(got["id"], int)

    # a reader field with neither writer presence nor a default is an error
    import pytest as _pytest

    bad_reader = parse_schema("""{
      "type": "record", "name": "Evt", "fields": [
        {"name": "id", "type": "long"},
        {"name": "missing", "type": "string"}]}""")
    with _pytest.raises(ValueError, match="no default"):
        decode_record_resolved(writer, bad_reader, payload)

    # illegal promotion (string -> int) is an error, not a silent null
    bad_promo = parse_schema("""{
      "type": "record", "name": "Evt", "fields": [
        {"name": "name", "type": "int"}]}""")
    with _pytest.raises(ValueError, match="promote"):
        decode_record_resolved(writer, bad_promo, payload)
