"""Minimal pure-Python Avro *binary* codec — the jar-free S4 fallback.

Implements the public Avro 1.x binary encoding (zigzag-varint ints/longs,
little-endian IEEE float/double, length-prefixed bytes/utf8 strings,
union-index-prefixed nullable unions) for FLAT record schemas of
primitive fields. That is exactly the payload shape the reference's
consumers carry (registry-validated flat records,
reference src/kafka_source.py:129-151).

Scale position: with the spark-avro jar present, ``from_avro`` is the
JVM fast path (`sources/kafka.py` ``avro_payload``); this codec is the
Arrow-batched Python fallback (and the test harness's encoder — the
reference likewise decodes Avro in Python via DatumReader, so even the
fallback matches the reference's per-row cost model while batching I/O
through Arrow).

Supported field types: "null", "boolean", "int", "long", "float",
"double", "bytes", "string", and the nullable union ["null", T].
"""

from __future__ import annotations

import json
import struct as _struct
from typing import Any, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _field_types(schema: dict) -> list[tuple[str, Any]]:
    assert schema.get("type") == "record", "only record schemas supported"
    return [(f["name"], f["type"]) for f in schema["fields"]]


def _encode_value(ftype: Any, value: Any) -> bytes:
    if isinstance(ftype, list):  # nullable union ["null", T]
        if value is None:
            return _zigzag_encode(ftype.index("null"))
        other = next(t for t in ftype if t != "null")
        return _zigzag_encode(ftype.index(other)) + _encode_value(other, value)
    if isinstance(ftype, dict):
        t = ftype["type"]
        if t == "record":  # nested record: fields in declaration order
            out = bytearray()
            for f in ftype["fields"]:
                out += _encode_value(f["type"], (value or {}).get(f["name"]))
            return bytes(out)
        if t == "array":  # one block + end marker (spec block encoding)
            items = list(value or [])
            out = bytearray()
            if items:
                out += _zigzag_encode(len(items))
                for it in items:
                    out += _encode_value(ftype["items"], it)
            out += _zigzag_encode(0)
            return bytes(out)
        if t == "map":
            entries = dict(value or {})
            out = bytearray()
            if entries:
                out += _zigzag_encode(len(entries))
                for k, v in entries.items():
                    out += _encode_value("string", k)
                    out += _encode_value(ftype["values"], v)
            out += _zigzag_encode(0)
            return bytes(out)
        if t == "enum":
            return _zigzag_encode(ftype["symbols"].index(value))
        if t == "fixed":
            raw = bytes(value)
            if len(raw) != ftype["size"]:
                raise ValueError(
                    f"fixed({ftype['size']}) got {len(raw)} bytes"
                )
            return raw
        # {"type": "long", "logicalType": "timestamp-millis"} etc.:
        # logical types are annotations — encode the underlying primitive
        return _encode_value(t, value)
    if ftype == "null":
        return b""
    if ftype == "boolean":
        return b"\x01" if value else b"\x00"
    if ftype in ("int", "long"):
        return _zigzag_encode(int(value))
    if ftype == "float":
        return _struct.pack("<f", float(value))
    if ftype == "double":
        return _struct.pack("<d", float(value))
    if ftype in ("bytes", "string"):
        raw = value.encode("utf-8") if ftype == "string" else bytes(value)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported avro type: {ftype!r}")


def _decode_value(ftype: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(ftype, list):
        idx, pos = _zigzag_decode(buf, pos)
        branch = ftype[idx]
        if branch == "null":
            return None, pos
        return _decode_value(branch, buf, pos)
    if isinstance(ftype, dict):
        t = ftype["type"]
        if t == "record":
            rec: dict[str, Any] = {}
            for f in ftype["fields"]:
                rec[f["name"]], pos = _decode_value(f["type"], buf, pos)
            return rec, pos
        if t == "array":
            items = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:  # size-prefixed block form (spec-legal)
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    it, pos = _decode_value(ftype["items"], buf, pos)
                    items.append(it)
            return items, pos
        if t == "map":
            entries: dict[str, Any] = {}
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    k, pos = _decode_value("string", buf, pos)
                    entries[k], pos = _decode_value(ftype["values"], buf, pos)
            return entries, pos
        if t == "enum":
            idx, pos = _zigzag_decode(buf, pos)
            return ftype["symbols"][idx], pos
        if t == "fixed":
            size = ftype["size"]
            return buf[pos : pos + size], pos + size
        return _decode_value(t, buf, pos)  # logical-type annotation
    if ftype == "null":
        return None, pos
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    if ftype in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if ftype == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if ftype == "string" else raw), pos + n
    raise ValueError(f"unsupported avro type: {ftype!r}")


def encode_record(schema: dict, record: dict) -> bytes:
    """Record dict -> Avro binary body (no Confluent header — compose
    with ``sources.kafka.confluent_frame`` for the wire format)."""
    out = bytearray()
    for name, ftype in _field_types(schema):
        out += _encode_value(ftype, record.get(name))
    return bytes(out)


def decode_record(schema: dict, data: bytes) -> dict:
    """Avro binary body -> record dict."""
    rec: dict[str, Any] = {}
    pos = 0
    for name, ftype in _field_types(schema):
        rec[name], pos = _decode_value(ftype, data, pos)
    return rec


def avro_decode_to_json_udf(schema_json: str):
    """Pandas UDF: Avro body bytes -> canonical JSON string of the record
    (the dynamic-payload contract the JSON mode also uses, so the rest of
    the envelope/transform spine is format-agnostic). Arrow-batched; the
    parsed schema lives in the closure."""
    schema = json.loads(schema_json)

    @F.pandas_udf(T.StringType())
    def decode(vals: pd.Series) -> pd.Series:
        def one(v) -> Optional[str]:
            if v is None:
                return None
            return json.dumps(decode_record(schema, bytes(v)), ensure_ascii=False)

        return vals.map(one)

    return decode


def avro_encode_from_json_udf(schema_json: str):
    """Pandas UDF: JSON record string -> Avro body bytes (the test-side
    encoder; the reference's producer path uses a registry-backed
    serializer, src/kafka_target.py:32-63)."""
    schema = json.loads(schema_json)

    @F.pandas_udf(T.BinaryType())
    def encode(vals: pd.Series) -> pd.Series:
        def one(v) -> Optional[bytes]:
            if v is None:
                return None
            return encode_record(schema, json.loads(v))

        return vals.map(one)

    return encode


def avro_decode_multi_to_json_udf(schemas_by_id: dict):
    """Pandas UDF: FULL Confluent-framed value -> canonical JSON string,
    the writer schema resolved PER ROW from the frame's embedded schema
    id — ONE corpus scan decodes a mixed-schema topic no matter how many
    writer-schema versions it carries.

    This is the scale path behind the runner's per-id branching: a
    filtered branch per distinct id (``run_pipeline``) keeps decode in
    separate whole-stage spans and is right for the handful of versions
    a topic normally carries, but a thousand-id topic would pay N
    re-scans and an N-way union. Here the id→parsed-schema map lives in
    the closure (bounded: one entry per schema VERSION, never per
    message) and the scan stays single.

    Mirrors the runner's malformed-frame strictness: a non-NULL value
    shorter than the 5-byte Confluent frame, or an id with no registered
    schema, raises rather than vanishing (reference
    src/kafka_source.py:129-137 raises on the first malformed frame)."""
    parsed = {int(k): json.loads(v) for k, v in schemas_by_id.items()}

    @F.pandas_udf(T.StringType())
    def decode(vals: pd.Series) -> pd.Series:
        def one(v) -> Optional[str]:
            if v is None:
                return None
            b = bytes(v)
            if len(b) < 5:
                raise ValueError(
                    f"not a Confluent-framed Avro value ({len(b)} bytes < 5)"
                )
            sid = int.from_bytes(b[1:5], "big")
            schema = parsed.get(sid)
            if schema is None:
                raise KeyError(
                    f"no registered writer schema for id {sid} "
                    f"(known: {sorted(parsed)})"
                )
            return json.dumps(decode_record(schema, b[5:]), ensure_ascii=False)

        return vals.map(one)

    return decode
