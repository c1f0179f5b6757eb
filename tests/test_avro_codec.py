"""Avro binary codec (sources/avro_codec.py) against the PUBLIC Avro
1.x spec: known zigzag-varint byte vectors, record round-trips (plain +
hypothesis), and the Confluent-framed Spark path."""

from __future__ import annotations

import json
import struct

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.sources.avro_codec import (
    _zigzag_decode,
    _zigzag_encode,
    decode_record,
    encode_record,
)

SCHEMA = {
    "type": "record",
    "name": "T",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": ["null", "double"]},
    ],
}


def test_zigzag_spec_vectors():
    # Avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04; 64 -> 80 01
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(2) == b"\x04"
    assert _zigzag_encode(64) == b"\x80\x01"
    assert _zigzag_encode(-65) == b"\x81\x01"
    for v in (0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        got, pos = _zigzag_decode(_zigzag_encode(v), 0)
        assert got == v and pos == len(_zigzag_encode(v))


def test_known_record_encoding():
    # "ab" -> len 2 (zigzag 04) + bytes; 3 -> 06; true -> 01;
    # null branch of ["null","double"] -> union index 0 -> 00
    body = encode_record(SCHEMA, {"s": "ab", "n": 3, "b": True, "d": None})
    assert body == b"\x04ab\x06\x01\x00"
    # non-null double: union index 1 (02) + 8 LE bytes
    body2 = encode_record(SCHEMA, {"s": "", "n": 0, "b": False, "d": 1.5})
    assert body2 == b"\x00\x00\x00\x02" + struct.pack("<d", 1.5)


@settings(max_examples=50, deadline=None)
@given(
    st.text(max_size=30),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.booleans(),
    st.none() | st.floats(allow_nan=False, allow_infinity=False),
)
def test_record_round_trip_property(s, n, b, d):
    rec = {"s": s, "n": n, "b": b, "d": d}
    assert decode_record(SCHEMA, encode_record(SCHEMA, rec)) == rec


def test_spark_confluent_framed_decode(spark):
    """Full S4 path on a DataFrame: encode → frame → schema id + decode."""
    from dvh_airflow_kafka_spark.sources.kafka import (
        avro_payload_json,
        confluent_frame,
        confluent_schema_id,
    )

    rows = [
        {"s": "hello", "n": 1, "b": True, "d": 2.25},
        {"s": "blåbær", "n": -42, "b": False, "d": None},
    ]
    df = spark.createDataFrame(
        [(i, encode_record(SCHEMA, r)) for i, r in enumerate(rows)],
        "i long, body binary",
    ).select("i", confluent_frame(F.lit(9), F.col("body")).alias("value"))
    out = df.select(
        "i",
        confluent_schema_id(F.col("value")).alias("sid"),
        avro_payload_json(F.col("value"), json.dumps(SCHEMA)).alias("j"),
    ).collect()
    for r in out:
        assert r.sid == 9
        assert json.loads(r.j) == rows[r.i]


def test_complex_types_roundtrip():
    """Nested record / array / map / enum / fixed / logical-type
    annotations survive encode->decode."""
    from dvh_airflow_kafka_spark.sources.avro_codec import (
        decode_record,
        encode_record,
    )

    schema = {
        "type": "record",
        "name": "Complex",
        "fields": [
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "color", "type": {"type": "enum", "name": "C",
                                       "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "fp", "type": {"type": "fixed", "name": "F", "size": 4}},
            {"name": "inner", "type": {"type": "record", "name": "I",
                                       "fields": [
                                           {"name": "a", "type": "int"},
                                           {"name": "b",
                                            "type": ["null", "string"]},
                                       ]}},
            {"name": "maybe_list",
             "type": ["null", {"type": "array", "items": "int"}]},
        ],
    }
    rec = {
        "ts": 1700000000123,
        "tags": ["x", "y", ""],
        "props": {"k1": 7, "k2": -3},
        "color": "GREEN",
        "fp": b"\x01\x02\x03\x04",
        "inner": {"a": -17, "b": None},
        "maybe_list": [1, 2, 3],
    }
    assert decode_record(schema, encode_record(schema, rec)) == rec
    rec2 = dict(rec, tags=[], props={}, maybe_list=None,
                inner={"a": 0, "b": "æøå"})
    assert decode_record(schema, encode_record(schema, rec2)) == rec2


def test_complex_encoding_matches_spec_bytes():
    """Byte-level spec pin: array block encoding, enum index, zigzag
    longs — so the codec speaks Avro, not merely its own dialect."""
    from dvh_airflow_kafka_spark.sources.avro_codec import encode_record

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "int"}},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["A", "B"]}},
        ],
    }
    # xs=[3]: block count 1 (zigzag 0x02), item 3 (zigzag 0x06), end 0x00
    # e="B": index 1 (zigzag 0x02)
    assert encode_record(schema, {"xs": [3], "e": "B"}) == bytes(
        [0x02, 0x06, 0x00, 0x02]
    )


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=8),
    st.dictionaries(st.text(alphabet=list("abcø"), max_size=5),
                    st.integers(min_value=-100, max_value=100), max_size=5),
    st.sampled_from(["RED", "GREEN", "BLUE"]),
)
def test_complex_roundtrip_property(xs, mp, color):
    from dvh_airflow_kafka_spark.sources.avro_codec import (
        decode_record,
        encode_record,
    )

    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "mp", "type": {"type": "map", "values": "int"}},
            {"name": "c", "type": {"type": "enum", "name": "E",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        ],
    }
    rec = {"xs": xs, "mp": mp, "c": color}
    assert decode_record(schema, encode_record(schema, rec)) == rec
