"""Kafka source builders (S1/S2/S4).

The reference implements two consumption strategies in an imperative poll
loop (reference src/kafka_source.py:281-414). Spark subsumes both:

- **assign** (timestamp-bounded batch read, S1): Spark's Kafka batch source
  resolves ``startingOffsetsByTimestamp`` / ``endingOffsetsByTimestamp``
  per partition exactly like the reference's ``offsets_for_times``
  (src/kafka_source.py:182-191, 220-265) — offset pushdown into the log,
  one Spark task per partition-range, exhausted partitions simply end
  their task (the reference's incremental unassign, :330-338).
- **subscribe** (consumer-group incremental, S2): Structured Streaming
  Kafka source with ``trigger(availableNow=True)``; checkpointed offsets
  replace group commits and preserve the write-then-commit at-least-once
  ordering (src/kafka_source.py:393, 416-423).

Requires the spark-sql-kafka connector jar on the classpath; the test
environment has no broker, so these builders are exercised through the
file-backed simulation (``sources.envelope.events_as_kafka_frame``) which
yields the identical column contract.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.config import SourceSpec


def _offsets_by_timestamp(topic: str, ts_ms: int) -> str:
    # -1 partition wildcard is not supported by the option; callers that
    # know the partition count can build an explicit map — the global
    # timestamp form covers the common case.
    return json.dumps({topic: {"*": ts_ms}})


def _apply_kafka_options(reader, spec: SourceSpec):
    """Thread the spec's broker/security options onto a reader — the
    reference's SSL/SASL consumer config block (src/kafka_source.py:
    163-180). Consumer config names get the connector's ``kafka.``
    prefix; keys already carrying it pass through unchanged."""
    for key, val in (spec.kafka_options or {}).items():
        opt = key if key.startswith("kafka.") else f"kafka.{key}"
        reader = reader.option(opt, val)
    return reader


def kafka_batch_read(
    spark: SparkSession,
    spec: SourceSpec,
    bootstrap_servers: str,
) -> DataFrame:
    """S1 'assign': bounded batch read of ``[start_ts, end_ts)`` by broker
    timestamp — the exact analogue of the reference's
    DATA_INTERVAL_START/END envs (src/kafka_source.py:68-72)."""
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", spec.topic)
        .option("includeHeaders", "false")
    )
    reader = _apply_kafka_options(reader, spec)
    if spec.starting_timestamp_ms is not None:
        reader = reader.option(
            "startingTimestamp", str(spec.starting_timestamp_ms)
        )
    else:
        reader = reader.option("startingOffsets", "earliest")
    if spec.ending_timestamp_ms is not None:
        reader = reader.option("endingTimestamp", str(spec.ending_timestamp_ms))
    else:
        reader = reader.option("endingOffsets", "latest")
    return reader.load()


def kafka_stream_read(
    spark: SparkSession,
    spec: SourceSpec,
    bootstrap_servers: str,
) -> DataFrame:
    """S2 'subscribe': incremental micro-batch stream. ``maxOffsetsPerTrigger``
    plays the reference's ``batch-size`` (src/config.py:77) — it bounds
    each micro-batch, and ``trigger(availableNow=True)`` drains the log
    then stops (the reference's first-None-poll exit,
    src/kafka_source.py:372-374)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", spec.topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", str(spec.batch_size))
        .option("failOnDataLoss", "false")
    )
    return _apply_kafka_options(reader, spec).load()


def strip_confluent_header(value: F.Column) -> F.Column:
    """S4 Avro: Confluent wire format = 1 magic byte + 4-byte big-endian
    schema id + payload (reference src/kafka_source.py:129-135). Returns
    the bare Avro payload for ``from_avro``; the schema id is
    ``confluent_schema_id`` below."""
    return F.substring(value, 6, F.length(value) - F.lit(5))


def confluent_schema_id(value: F.Column) -> F.Column:
    """Big-endian uint32 at bytes 2-5 -> ``kafka_schema_id``
    (reference src/kafka_source.py:130: ``struct.unpack(">L", msg[1:5])``),
    decoded JVM-side via hex/conv."""
    return F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("long")


def confluent_frame(schema_id: F.Column, payload: F.Column) -> F.Column:
    """The encoder half of the wire format (what the reference's producer
    side emits via AvroSerializer, src/kafka_target.py:32-63): magic 0x00
    + 4-byte big-endian schema id + payload bytes. Used by tests/queries
    to round-trip the framing without a live registry."""
    id_bytes = F.unhex(F.lpad(F.hex(schema_id.cast("int")), 8, "0"))
    return F.concat(F.lit(b"\x00"), id_bytes, payload.cast("binary"))


def avro_payload(
    value: F.Column, schema_json: str, registry_cache: Optional[dict] = None
) -> F.Column:
    """Decode a registry-framed Avro value to a typed struct. The schema
    JSON is fetched once in the driver (the reference keeps a
    per-schema-id cache, src/kafka_source.py:132-133) and distributed as
    a plan literal. Requires the spark-avro jar (the JVM fast path);
    without it use :func:`avro_payload_json`."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover - needs spark-avro jar
        raise NotImplementedError("spark-avro not on classpath") from e
    return from_avro(strip_confluent_header(value), schema_json)


def avro_payload_json(value: F.Column, schema_json: str) -> F.Column:
    """Jar-free S4 decode: registry-framed Avro value -> canonical JSON
    string of the record (the same dynamic-payload contract as JSON mode,
    so the envelope/transform spine downstream is format-agnostic).
    Arrow-batched pure-Python codec (sources/avro_codec.py) — mirrors the
    reference's Python DatumReader cost model (src/kafka_source.py:136-151)
    while batching transfer through Arrow."""
    from dvh_airflow_kafka_spark.sources.avro_codec import avro_decode_to_json_udf

    return avro_decode_to_json_udf(schema_json)(strip_confluent_header(value))
