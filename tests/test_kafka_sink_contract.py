"""S8 Kafka producer sink — jar-independent contract tests.

The sandbox has no kafka connector jar, so ``write_kafka_avro``'s final
``save()`` cannot run here. These tests pin everything BEFORE the save —
the writer option dict and the (key, value) payload plan — exactly like
tests/test_jdbc_sink.py pinned S7's option contract before Derby. The
reference behavior being pinned is src/kafka_target.py:32-90: topic +
bootstrap config, SSL env indirection, uuid4 utf-8 keys, and Confluent
wire-format Avro values (magic 0x00 + 4-byte big-endian schema id +
Avro body, i.e. what AvroSerializer emits)."""

from __future__ import annotations

import json
import struct
import uuid

import pytest

from dvh_airflow_kafka_spark.sinks.writers import (
    kafka_payload_confluent,
    kafka_writer_options,
    write_kafka_avro,
)
from dvh_airflow_kafka_spark.sources.avro_codec import decode_record

SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "kind", "type": ["null", "string"], "default": None},
    ],
}


def test_writer_options_plain():
    opts = kafka_writer_options("broker1:9092,broker2:9092", "team.topic.v1")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "topic": "team.topic.v1",
    }


def test_writer_options_ssl_contract():
    """Off-localhost the reference flips to SSL with PEM paths from env
    (src/kafka_target.py:62-78); our mapping is the JVM PEM-store form."""
    opts = kafka_writer_options(
        "b:9092", "t", ca_path="/var/run/ca.pem", cert_key_path="/var/run/client.pem"
    )
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "/var/run/ca.pem"
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.location"] == "/var/run/client.pem"
    # plain config must never carry SSL keys (reference's isNotLocal gate)
    assert "kafka.security.protocol" not in kafka_writer_options("b:9092", "t")


def test_payload_schema_and_framing(spark):
    """(key, value) both binary; value = magic 0x00 + >L schema id + Avro
    body our own decoder inverts to the input record."""
    rows = [(1, "click"), (2, None), (3, "blåbær")]
    df = spark.createDataFrame(rows, "event_id long, kind string")
    payload = kafka_payload_confluent(df, json.dumps(SCHEMA), schema_id=42)
    assert [f.name for f in payload.schema.fields] == ["key", "value"]
    assert {f.dataType.simpleString() for f in payload.schema.fields} == {"binary"}

    got = payload.collect()
    assert len(got) == len(rows)
    decoded = []
    for r in got:
        value = bytes(r.value)
        magic, sid = struct.unpack(">bL", value[:5])
        assert magic == 0
        assert sid == 42
        decoded.append(decode_record(SCHEMA, value[5:]))
    assert sorted(decoded, key=lambda d: d["event_id"]) == [
        {"event_id": 1, "kind": "click"},
        {"event_id": 2, "kind": None},
        {"event_id": 3, "kind": "blåbær"},
    ]


def test_payload_keys_are_uuid4_utf8(spark):
    """Keys are the utf-8 bytes of a uuid string, unique per record
    (reference key_serializer(str(uuid4())), src/kafka_target.py:86)."""
    df = spark.range(200).selectExpr("id as event_id", "cast(null as string) as kind")
    keys = [bytes(r.key) for r in kafka_payload_confluent(df, json.dumps(SCHEMA), 1).collect()]
    assert len(set(keys)) == len(keys) == 200
    for k in keys:
        parsed = uuid.UUID(k.decode("utf-8"))
        assert parsed.version == 4


def test_payload_roundtrip_property(spark):
    """Property (driver-side batches through the SAME Arrow UDF kernel):
    for arbitrary records and schema ids, decode(strip_frame(value))
    inverts the payload encode exactly."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.none() | st.text(max_size=12),
            ),
            min_size=1,
            max_size=6,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(rows, sid):
        df = spark.createDataFrame(rows, "event_id long, kind string")
        got = kafka_payload_confluent(df, json.dumps(SCHEMA), sid).collect()
        decoded = []
        for r in got:
            v = bytes(r.value)
            magic, got_sid = struct.unpack(">bL", v[:5])
            assert (magic, got_sid) == (0, sid)
            decoded.append(decode_record(SCHEMA, v[5:]))
        assert sorted(
            (d["event_id"], d["kind"]) for d in decoded
        ) == sorted(rows)

    check()


def test_write_kafka_avro_emits_pinned_options(spark, monkeypatch):
    """End-to-end drift pin: intercept DataFrameWriter at the boundary and
    assert write_kafka_avro wires format/options/payload exactly as the
    contract says, without needing the kafka jar for save()."""
    captured = {}

    from pyspark.sql import readwriter

    def fake_save(self, path=None, **kw):
        captured["format"] = self._format  # set by .format("kafka")
        captured["options"] = dict(self._options)
        captured["plan_columns"] = list(self._df.columns)
        captured["rows"] = self._df.collect()

    monkeypatch.setattr(readwriter.DataFrameWriter, "save", fake_save, raising=True)
    # the classic writer keeps format/options privately; expose them for
    # the assert via wrappers
    orig_format = readwriter.DataFrameWriter.format
    orig_option = readwriter.DataFrameWriter.option

    def spy_format(self, source):
        self._format = source
        return orig_format(self, source)

    def spy_option(self, key, value):
        self._options = {**getattr(self, "_options", {}), key: value}
        return orig_option(self, key, value)

    monkeypatch.setattr(readwriter.DataFrameWriter, "format", spy_format)
    monkeypatch.setattr(readwriter.DataFrameWriter, "option", spy_option)

    df = spark.createDataFrame([(7, "x")], "event_id long, kind string")
    write_kafka_avro(df, "broker:9092", "out.topic", json.dumps(SCHEMA), schema_id=9)

    assert captured["format"] == "kafka"
    assert captured["options"] == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "out.topic",
    }
    assert captured["plan_columns"] == ["key", "value"]
    (row,) = captured["rows"]
    value = bytes(row.value)
    assert struct.unpack(">bL", value[:5]) == (0, 9)
    assert decode_record(SCHEMA, value[5:]) == {"event_id": 7, "kind": "x"}
