"""Pure-Python Avro binary codec + Avro⇄Spark schema translation.

Why this exists: the reference decodes raw binary-Avro Kafka payloads (no
Confluent magic byte — a bare ``binaryDecoder`` over the whole message,
AbstractAvroDeserializeService.java:46-60 in the reference). Spark's own
``from_avro`` lives in the external ``spark-avro`` jar, which is not part of
a stock PySpark install; this module provides the same semantics with zero
JVM dependencies. ``spark_integration.decode_avro`` (streaming/ingest.py)
prefers the JVM path when the jar is present and falls back to this codec
via an Arrow-batched ``mapInPandas`` otherwise.

Supported: the full Avro 1.x type lattice the reference's registry can feed
it — null, boolean, int, long, float, double, bytes, string, record (incl.
nested + named references), enum, array, map, union, fixed — plus the
standard logical types with the same Spark mapping the JVM ``from_avro``
uses (SchemaConverters semantics): ``date`` → DateType,
``timestamp-millis``/``timestamp-micros`` → TimestampType (session-tz;
this repo pins ``spark.sql.session.timeZone=UTC``, session.py),
``local-timestamp-*`` → TimestampNTZType, ``decimal`` on bytes/fixed →
DecimalType(precision, scale); ``uuid``/``time-*`` pass through as their
base type. (The reference itself carries epoch-millis as plain long —
item-view-event.avsc:18-23; FIXTURES.md §A — so logical types only appear
when users bring richer schemas.)

Multi-branch non-null unions follow spark-avro: ``[int, long]`` widens to
LongType, ``[float, double]`` to DoubleType, and any other non-null
multi-branch union becomes a struct of nullable ``member0..memberN-1``
fields (one per non-null branch, exactly one set per value). The reference
would throw on any schema it didn't expect
(AbstractAvroDeserializeService.java:56-59); we keep fail-fast only for
shapes Spark itself cannot type (recursive records).
"""

from __future__ import annotations

import datetime as dt
import decimal
import io
import json
import struct
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

# logical types we materialize (anything else passes through as base type)
_LOGICALS = {
    "date",
    "timestamp-millis",
    "timestamp-micros",
    "local-timestamp-millis",
    "local-timestamp-micros",
    "decimal",
}
_EPOCH_DATE = dt.date(1970, 1, 1)
_EPOCH_DT = dt.datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# Schema parsing (avsc JSON → resolved dict tree with named-type references)
# ---------------------------------------------------------------------------


def parse_schema(avsc: str | dict) -> dict:
    """Parse an .avsc JSON string into a resolved schema tree.

    Named types (record/enum/fixed) referenced by name are replaced with
    their definitions so the codec never needs a registry at decode time.
    """
    raw = json.loads(avsc) if isinstance(avsc, str) else avsc
    named: dict[str, dict] = {}

    def resolve(node: Any, namespace: str | None) -> Any:
        if isinstance(node, str):
            if node in _PRIMITIVES:
                return node
            full = node if "." in node else (f"{namespace}.{node}" if namespace else node)
            if full in named:
                return named[full]
            if node in named:
                return named[node]
            raise ValueError(f"unknown Avro type reference: {node!r}")
        if isinstance(node, list):  # union
            return [resolve(b, namespace) for b in node]
        if not isinstance(node, dict):
            raise ValueError(f"malformed Avro schema node: {node!r}")
        t = node.get("type")
        if t in ("record", "error"):
            ns = node.get("namespace", namespace)
            full = f"{ns}.{node['name']}" if ns else node["name"]
            out = {"type": "record", "name": full, "fields": []}
            named[full] = out
            named.setdefault(node["name"], out)
            for f in node["fields"]:
                rf = {"name": f["name"], "type": resolve(f["type"], ns)}
                if "default" in f:  # kept for reader-side schema resolution
                    rf["default"] = f["default"]
                out["fields"].append(rf)
            return out
        if t == "enum":
            ns = node.get("namespace", namespace)
            full = f"{ns}.{node['name']}" if ns else node["name"]
            out = {"type": "enum", "name": full, "symbols": list(node["symbols"])}
            if "default" in node:  # Avro 1.9+ enum fallback symbol
                out["default"] = node["default"]
            named[full] = out
            named.setdefault(node["name"], out)
            return out
        if t == "fixed":
            ns = node.get("namespace", namespace)
            full = f"{ns}.{node['name']}" if ns else node["name"]
            out = {"type": "fixed", "name": full, "size": int(node["size"])}
            if node.get("logicalType") == "decimal":
                out["logicalType"] = "decimal"
                out["precision"] = int(node["precision"])
                out["scale"] = int(node.get("scale", 0))
            named[full] = out
            named.setdefault(node["name"], out)
            return out
        if t == "array":
            return {"type": "array", "items": resolve(node["items"], namespace)}
        if t == "map":
            return {"type": "map", "values": resolve(node["values"], namespace)}
        if t in _PRIMITIVES:
            lt = node.get("logicalType")
            if lt in _LOGICALS:  # keep the annotation; else → base type
                out = {"type": t, "logicalType": lt}
                if lt == "decimal":
                    out["precision"] = int(node["precision"])
                    out["scale"] = int(node.get("scale", 0))
                return out
            return t
        return resolve(t, namespace)

    return resolve(raw, None)


def _type_name(schema: Any) -> str:
    return schema if isinstance(schema, str) else ("union" if isinstance(schema, list) else schema["type"])


# ---------------------------------------------------------------------------
# Avro → Spark schema
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def to_spark_type(schema: Any, _visiting: frozenset[str] = frozenset()) -> tuple[T.DataType, bool]:
    """Resolved Avro schema → (Spark DataType, nullable).

    ``["null", X]`` unions become nullable X — exactly what the JVM
    ``from_avro`` does for the reference's all-nullable-fields schema
    (FIXTURES.md §A). Multi-branch unions follow spark-avro
    SchemaConverters: [int,long]→LongType, [float,double]→DoubleType,
    anything else → struct of nullable member0..memberN-1. Recursive
    records are legal Avro but have no Spark representation → ValueError
    (fail fast)."""
    if isinstance(schema, str):
        return _AVRO_TO_SPARK[schema], schema == "null"
    if isinstance(schema, list):
        non_null = [b for b in schema if b != "null"]
        nullable = len(non_null) < len(schema)
        if len(non_null) == 1:
            dtype, _ = to_spark_type(non_null[0], _visiting)
            return dtype, nullable
        names = {_type_name(b) for b in non_null}
        if names == {"int", "long"}:
            return T.LongType(), nullable
        if names == {"float", "double"}:
            return T.DoubleType(), nullable
        fields = [
            T.StructField(f"member{i}", to_spark_type(b, _visiting)[0], True)
            for i, b in enumerate(non_null)
        ]
        return T.StructType(fields), nullable
    t = schema["type"]
    if t == "record":
        if schema["name"] in _visiting:
            raise ValueError(
                f"recursive Avro record {schema['name']!r} has no Spark equivalent"
            )
        inner = _visiting | {schema["name"]}
        fields = []
        for f in schema["fields"]:
            dt, nullable = to_spark_type(f["type"], inner)
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        if schema.get("logicalType") == "decimal":
            return T.DecimalType(schema["precision"], schema["scale"]), False
        return T.BinaryType(), False
    if t in _PRIMITIVES:  # logical-typed primitive node
        lt = schema.get("logicalType")
        if lt == "date":
            return T.DateType(), False
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType(), False
        if lt in ("local-timestamp-millis", "local-timestamp-micros"):
            return T.TimestampNTZType(), False
        if lt == "decimal":
            return T.DecimalType(schema["precision"], schema["scale"]), False
        return _AVRO_TO_SPARK[t], t == "null"
    if t == "array":
        dt, nullable = to_spark_type(schema["items"], _visiting)
        return T.ArrayType(dt, containsNull=nullable), False
    if t == "map":
        dt, nullable = to_spark_type(schema["values"], _visiting)
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
    raise ValueError(f"unsupported Avro type: {t!r}")


def to_spark_struct(avsc: str | dict) -> T.StructType:
    dt, _ = to_spark_type(parse_schema(avsc))
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level Avro schema must be a record")
    return dt


# ---------------------------------------------------------------------------
# Spark → Avro schema (for the to_avro test-fixture path, reference P1)
# ---------------------------------------------------------------------------


def from_spark_struct(st: T.StructType, name: str = "Record", namespace: str = "engine") -> dict:
    def conv(dt: T.DataType, nullable: bool, path: str) -> Any:
        base: Any
        if isinstance(dt, T.BooleanType):
            base = "boolean"
        elif isinstance(dt, T.IntegerType):
            base = "int"
        elif isinstance(dt, T.LongType):
            base = "long"
        elif isinstance(dt, T.FloatType):
            base = "float"
        elif isinstance(dt, T.DoubleType):
            base = "double"
        elif isinstance(dt, T.BinaryType):
            base = "bytes"
        elif isinstance(dt, T.StringType):
            base = "string"
        elif isinstance(dt, T.ArrayType):
            base = {"type": "array", "items": conv(dt.elementType, dt.containsNull, path)}
        elif isinstance(dt, T.MapType):
            base = {"type": "map", "values": conv(dt.valueType, dt.valueContainsNull, path)}
        elif isinstance(dt, T.StructType):
            base = {
                "type": "record",
                "name": f"{path}_rec",
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable, f"{path}_{f.name}")}
                    for f in dt.fields
                ],
            }
        else:
            raise ValueError(f"unsupported Spark type for Avro: {dt}")
        return ["null", base] if nullable else base

    return {
        "type": "record",
        "name": name,
        "namespace": namespace,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, f.name)} for f in st.fields
        ],
    }


# ---------------------------------------------------------------------------
# Binary decode (Avro spec: zigzag varints, length-prefixed, block arrays)
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read_long(self) -> int:
        b = self.buf
        pos = self.pos
        shift = 0
        acc = 0
        while True:
            byte = b[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_fixed(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


def _from_logical(node: dict, v: Any) -> Any:
    """Base-decoded value → Python value for a logical-typed primitive.
    Timestamps come back tz-naive in UTC (the session tz this repo pins)."""
    lt = node["logicalType"]
    if lt == "date":
        return _EPOCH_DATE + dt.timedelta(days=v)
    if lt in ("timestamp-millis", "local-timestamp-millis"):
        return _EPOCH_DT + dt.timedelta(milliseconds=v)
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        return _EPOCH_DT + dt.timedelta(microseconds=v)
    if lt == "decimal":  # bytes: two's-complement big-endian unscaled
        return decimal.Decimal(int.from_bytes(v, "big", signed=True)).scaleb(
            -node["scale"]
        )
    return v


def _to_base(node: dict, v: Any) -> Any:
    """Python value → base-typed value for encoding a logical primitive.
    Accepts either the logical Python type or an already-base value."""
    lt = node["logicalType"]
    if lt == "date":
        return (v - _EPOCH_DATE).days if isinstance(v, dt.date) else int(v)
    if lt in ("timestamp-millis", "local-timestamp-millis"):
        if isinstance(v, dt.datetime):
            return (v.replace(tzinfo=None) - _EPOCH_DT) // dt.timedelta(milliseconds=1)
        return int(v)
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        if isinstance(v, dt.datetime):
            return (v.replace(tzinfo=None) - _EPOCH_DT) // dt.timedelta(microseconds=1)
        return int(v)
    if lt == "decimal":
        unscaled = int(decimal.Decimal(v).scaleb(node["scale"]).to_integral_value())
        size = node.get("size") or max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(size, "big", signed=True)
    return v


def _decode(schema: Any, r: _Reader) -> Any:
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            v = r.buf[r.pos] != 0
            r.pos += 1
            return v
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            (v,) = struct.unpack_from("<f", r.buf, r.pos)
            r.pos += 4
            return v
        if schema == "double":
            (v,) = struct.unpack_from("<d", r.buf, r.pos)
            r.pos += 8
            return v
        if schema == "bytes":
            return r.read_bytes()
        if schema == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"unknown primitive {schema!r}")
    if isinstance(schema, list):  # union: varint branch index, then value
        idx = r.read_long()
        branch = schema[idx]
        if branch == "null":
            return None
        if len(schema) <= 2:  # ["null", X] / [X] — the hot path (every
            return _decode(branch, r)  # nullable field) stays allocation-free
        non_null = [b for b in schema if b != "null"]
        if len(non_null) == 1:
            return _decode(branch, r)
        names = {_type_name(b) for b in non_null}
        if names == {"int", "long"} or names == {"float", "double"}:
            return _decode(branch, r)  # widened scalar (spark-avro semantics)
        mi = non_null.index(branch)
        v = _decode(branch, r)
        return {f"member{i}": (v if i == mi else None) for i in range(len(non_null))}
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        raw = r.read_fixed(schema["size"])
        if schema.get("logicalType") == "decimal":
            return decimal.Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(
                -schema["scale"]
            )
        return raw
    if t in _PRIMITIVES:  # logical-typed primitive node
        return _from_logical(schema, _decode(t, r))
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(schema["items"], r))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], r)
        return out
    raise ValueError(f"unsupported Avro type: {t!r}")


def decode_record(schema: Any, payload: bytes) -> dict:
    """Decode one binary-Avro payload (whole message, no magic byte) —
    the reference's ``deserializeAvro`` semantics."""
    return _decode(schema, _Reader(payload))


# ---------------------------------------------------------------------------
# Schema resolution (Avro spec §"Schema Resolution"): decode a payload
# written with WRITER schema W under READER schema R — the rolling-upgrade
# contract. The reference pins one schema per topic forever
# (AbstractAvroDeserializeService.java:28-34) and crashes on any change;
# this implements the spec rules: match record fields by name (writer
# order drives the byte stream), skip writer-only fields, fill
# reader-only fields from their defaults, apply the promotion lattice
# (int→long/float/double, long→float/double, float→double,
# string⇄bytes), resolve union branches writer-side then match the
# reader union, and accept enum symbols present in the reader (falling
# back to the reader's enum ``default`` per Avro 1.9+).
# ---------------------------------------------------------------------------

_PROMOTABLE = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _promote(v: Any, w_t: str, r_t: str) -> Any:
    if w_t == r_t or v is None:
        return v
    if r_t in ("float", "double"):
        return float(v)
    if r_t == "long":
        return int(v)
    if r_t == "bytes":
        return v.encode("utf-8") if isinstance(v, str) else v
    if r_t == "string":
        return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else v
    return v


def _match(w: Any, rd: Any) -> bool:
    """Can a writer-branch value resolve against reader node ``rd``?"""
    wt, rt = _type_name(w), _type_name(rd)
    if wt in _PROMOTABLE:
        return rt in _PROMOTABLE[wt]
    if wt in ("record", "enum", "fixed"):
        return rt == wt and (
            not (isinstance(w, dict) and isinstance(rd, dict))
            or w.get("name") == rd.get("name")
        )
    return wt == rt  # array/map/union by shape


def _default_value(rd: Any, d: Any) -> Any:
    """A reader field's JSON default → the decoded-value representation."""
    if isinstance(rd, list):  # union default applies to the FIRST branch
        return _default_value(rd[0], d)
    if isinstance(rd, str):
        if rd == "null":
            return None
        if rd in ("float", "double"):
            return float(d)
        if rd in ("int", "long"):
            return int(d)
        if rd == "bytes":
            return d.encode("latin-1") if isinstance(d, str) else d
        return d
    t = rd["type"]
    if t == "record":
        return {
            f["name"]: _default_value(
                f["type"], (d or {}).get(f["name"], f.get("default"))
            )
            for f in rd["fields"]
        }
    if t == "array":
        return [_default_value(rd["items"], x) for x in (d or [])]
    if t == "map":
        return {k: _default_value(rd["values"], x) for k, x in (d or {}).items()}
    if t == "fixed":
        return d.encode("latin-1") if isinstance(d, str) else d
    if t in _PRIMITIVES:  # logical-typed primitive: defaults are base-typed
        return _from_logical(rd, _default_value(t, d))
    return d  # enum: the symbol string


def _decode_resolved(w: Any, rd: Any, r: _Reader) -> Any:
    # unions first: the writer union picks the branch from the byte
    # stream; the branch then resolves against the reader node
    if isinstance(w, list):
        branch = w[r.read_long()]
        return _resolve_value(branch, rd, r)
    return _resolve_value(w, rd, r)


def _resolve_value(w: Any, rd: Any, r: _Reader) -> Any:
    if isinstance(rd, list):  # reader union: first matching branch wins
        for b in rd:
            if _match(w, b):
                return _resolve_value(w, b, r)
        raise ValueError(
            f"schema resolution: writer {_type_name(w)!r} matches no reader "
            f"union branch {[_type_name(b) for b in rd]!r}"
        )
    wt, rt = _type_name(w), _type_name(rd)
    if wt in _PROMOTABLE:
        if rt not in _PROMOTABLE[wt]:
            raise ValueError(f"schema resolution: cannot promote {wt!r} to {rt!r}")
        v = _decode(w, r)
        base = _promote(v, wt, rt)
        # the reader's logical annotation applies only when the writer had
        # none — a logical writer node already converted inside _decode,
        # and converting twice would corrupt the value
        if isinstance(rd, dict) and not isinstance(w, dict):
            return _from_logical(rd, base)
        return base
    if wt == "record":
        if rt != "record" or w.get("name") != rd.get("name"):
            raise ValueError(
                f"schema resolution: record {w.get('name')!r} vs reader {rt!r}"
            )
        r_fields = {f["name"]: f for f in rd["fields"]}
        out: dict = {}
        for f in w["fields"]:
            if f["name"] in r_fields:
                out[f["name"]] = _decode_resolved(
                    f["type"], r_fields[f["name"]]["type"], r
                )
            else:
                _decode(f["type"], r)  # writer-only: decode and discard
        for f in rd["fields"]:
            if f["name"] not in out:
                if "default" not in f and not (
                    isinstance(f["type"], list) and f["type"][0] == "null"
                ):
                    raise ValueError(
                        f"schema resolution: reader field {f['name']!r} absent "
                        "from writer and has no default"
                    )
                out[f["name"]] = _default_value(f["type"], f.get("default"))
        return out
    if wt == "enum":
        sym = w["symbols"][r.read_long()]
        if sym in rd["symbols"]:
            return sym
        if "default" in rd:
            return rd["default"]
        raise ValueError(f"schema resolution: enum symbol {sym!r} not in reader")
    if wt == "array":
        if rt != "array":
            raise ValueError("schema resolution: array vs non-array reader")
        out_l: list = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                out_l.append(_decode_resolved(w["items"], rd["items"], r))
        return out_l
    if wt == "map":
        if rt != "map":
            raise ValueError("schema resolution: map vs non-map reader")
        out_m: dict = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out_m[k] = _decode_resolved(w["values"], rd["values"], r)
        return out_m
    if wt == "fixed":
        if rt != "fixed" or w["size"] != rd["size"]:
            raise ValueError("schema resolution: fixed name/size mismatch")
        return _decode(rd, r)  # reader's logical annotation applies
    raise ValueError(f"schema resolution: unsupported writer type {wt!r}")


def decode_record_resolved(writer: Any, reader: Any, payload: bytes) -> dict:
    """Decode one binary payload written with ``writer`` under ``reader``
    (both parse_schema trees) per Avro schema resolution."""
    return _decode_resolved(writer, reader, _Reader(payload))


# ---------------------------------------------------------------------------
# Binary encode (test fixtures + Kafka-producer parity, reference P1)
# ---------------------------------------------------------------------------


class _Writer:
    __slots__ = ("out",)

    def __init__(self):
        self.out = io.BytesIO()

    def write_long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63)  # zigzag (arbitrary-precision-safe for int64)
        v &= (1 << 64) - 1
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes((b | 0x80,)))
            else:
                self.out.write(bytes((b,)))
                break

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.out.write(b)


def _encode(schema: Any, v: Any, w: _Writer) -> None:
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            w.out.write(b"\x01" if v else b"\x00")
        elif schema in ("int", "long"):
            w.write_long(int(v))
        elif schema == "float":
            w.out.write(struct.pack("<f", float(v)))
        elif schema == "double":
            w.out.write(struct.pack("<d", float(v)))
        elif schema == "bytes":
            w.write_bytes(bytes(v))
        elif schema == "string":
            w.write_bytes(str(v).encode("utf-8"))
        else:
            raise ValueError(f"unknown primitive {schema!r}")
        return
    if isinstance(schema, list):
        if v is None and "null" in schema:
            idx = schema.index("null")
            w.write_long(idx)
            return
        non_null = [(i, b) for i, b in enumerate(schema) if b != "null"]
        if not non_null:
            raise ValueError("union has no non-null branch for value")
        if len(non_null) > 1:
            names = {_type_name(b) for _, b in non_null}
            if names == {"int", "long"} or names == {"float", "double"}:
                # widened scalar: encode into the widest branch
                wide = "long" if "long" in names else "double"
                idx, branch = next((i, b) for i, b in non_null if _type_name(b) == wide)
                w.write_long(idx)
                _encode(branch, v, w)
                return
            if isinstance(v, dict) and any(k.startswith("member") for k in v):
                set_members = [
                    k for k, mv in v.items() if k.startswith("member") and mv is not None
                ]
                if len(set_members) != 1:
                    raise ValueError(
                        f"member-struct union value must set exactly one member, got {set_members}"
                    )
                mi = int(set_members[0][len("member") :])
                idx, branch = non_null[mi]
                w.write_long(idx)
                _encode(branch, v[set_members[0]], w)
                return
            raise ValueError(
                f"cannot pick a union branch for {type(v).__name__} among {sorted(names)}"
            )
        idx, branch = non_null[0]
        w.write_long(idx)
        _encode(branch, v, w)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v[f["name"]], w)
    elif t == "enum":
        w.write_long(schema["symbols"].index(v))
    elif t == "fixed":
        if schema.get("logicalType") == "decimal" and not isinstance(v, (bytes, bytearray)):
            v = _to_base(schema, v)
        w.out.write(bytes(v))
    elif t in _PRIMITIVES:  # logical-typed primitive node
        _encode(t, _to_base(schema, v), w)
    elif t == "array":
        if v:
            w.write_long(len(v))
            for item in v:
                _encode(schema["items"], item, w)
        w.write_long(0)
    elif t == "map":
        if v:
            w.write_long(len(v))
            for k, val in v.items():
                w.write_bytes(str(k).encode("utf-8"))
                _encode(schema["values"], val, w)
        w.write_long(0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def encode_record(schema: Any, record: dict) -> bytes:
    w = _Writer()
    _encode(schema, record, w)
    return w.out.getvalue()
