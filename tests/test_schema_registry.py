"""Schema-registry client (S4 driver side): per-id cache, basic auth,
injectable transport (reference src/kafka_source.py:153-161)."""

from __future__ import annotations

import base64

from dvh_airflow_kafka_spark.sources.schema_registry import SchemaRegistryClient

_SCHEMA = '{"type": "record", "name": "E", "fields": []}'


class FakeTransport:
    def __init__(self):
        self.calls: list[tuple[str, str | None]] = []

    def __call__(self, url: str, auth_header: str | None) -> dict:
        self.calls.append((url, auth_header))
        return {"schema": _SCHEMA, "id": int(url.rsplit("/", 1)[1])}


def test_fetch_url_and_basic_auth():
    t = FakeTransport()
    c = SchemaRegistryClient(
        "https://registry.example/", username="user", password="pw", transport=t
    )
    assert c.schema_for_id(42) == _SCHEMA
    url, auth = t.calls[0]
    # trailing slash normalised; path matches the reference's REST shape
    assert url == "https://registry.example/schemas/ids/42"
    expect = "Basic " + base64.b64encode(b"user:pw").decode()
    assert auth == expect


def test_per_id_cache_hits():
    """The reference caches per schema id for the run
    (src/kafka_source.py:131-133) — repeat lookups must not re-fetch."""
    t = FakeTransport()
    c = SchemaRegistryClient("http://r", transport=t)
    for _ in range(5):
        c.schema_for_id(7)
    c.schema_for_id(8)
    c.schemas_for_ids([7, 8, 7, 9])
    assert [u for u, _ in t.calls] == [
        "http://r/schemas/ids/7",
        "http://r/schemas/ids/8",
        "http://r/schemas/ids/9",
    ]


def test_no_auth_header_without_credentials():
    t = FakeTransport()
    SchemaRegistryClient("http://r", transport=t).schema_for_id(1)
    assert t.calls[0][1] is None


def test_envelope_carries_schema_id(spark, sf_dir):
    """Avro-mode envelope parity: kafka_schema_id decoded from the frame
    (reference adds it to every Avro row, src/kafka_source.py:149)."""
    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.sources.envelope import (
        events_as_kafka_frame,
        with_envelope,
    )
    from dvh_airflow_kafka_spark.sources.kafka import (
        confluent_frame,
        confluent_schema_id,
    )

    events = load_table(spark, sf_dir, "events").limit(50)
    framed = events_as_kafka_frame(events).withColumn(
        "value", confluent_frame(F.col("offset") % 100, F.col("value"))
    )
    env = with_envelope(framed, schema_id=confluent_schema_id(F.col("value")))
    assert "kafka_schema_id" in env.columns
    for r in env.collect():
        assert r.kafka_schema_id == r.kafka_offset % 100
    # JSON/string modes stay schema-id-free (the reference only adds the
    # column in the Avro deserializer)
    assert "kafka_schema_id" not in with_envelope(framed).columns
