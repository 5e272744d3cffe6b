"""Property-based round-trips for the pure-Python Avro codec and OCF
container (hypothesis): encode∘decode == identity over randomized records —
nullable unions, nested records, arrays, maps, unicode, int64 extremes.
These are pure-Python (no Spark session), so hundreds of examples are cheap."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_etl_consumer_spark.avro_codec import decode_record, encode_record, parse_schema
from kafka_etl_consumer_spark.avro_ocf import read_ocf, write_ocf

AVSC = json.dumps(
    {
        "type": "record",
        "name": "PropRec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": ["null", "double"]},
            {"name": "flag", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {
                "name": "nested",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "Inner",
                        "fields": [
                            {"name": "a", "type": "int"},
                            {"name": "b", "type": ["null", "string"]},
                        ],
                    },
                ],
            },
        ],
    }
)
SCHEMA = parse_schema(AVSC)

int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
int32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
# finite doubles only: NaN breaks equality; Avro stores exact IEEE bits
finite_double = st.floats(allow_nan=False, allow_infinity=False)
text = st.text(max_size=40)

records = st.fixed_dictionaries(
    {
        "id": int64,
        "name": st.none() | text,
        "score": st.none() | finite_double,
        "flag": st.booleans(),
        "tags": st.lists(text, max_size=5),
        "props": st.dictionaries(text, int64, max_size=5),
        "nested": st.none()
        | st.fixed_dictionaries({"a": int32, "b": st.none() | text}),
    }
)


@given(records)
@settings(max_examples=200, deadline=None)
def test_binary_round_trip(rec):
    assert decode_record(SCHEMA, encode_record(SCHEMA, rec)) == rec


@given(st.lists(records, max_size=20), st.sampled_from(["null", "deflate"]))
@settings(max_examples=50, deadline=None)
def test_ocf_round_trip(recs, codec):
    _, back = read_ocf(write_ocf(AVSC, recs, codec=codec, block_records=7))
    assert back == recs
