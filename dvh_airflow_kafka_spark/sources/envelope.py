"""Kafka envelope construction (S3/S5/S6 + F9/F10).

A Kafka DataFrame — from the real ``format("kafka")`` source or any
simulated log — carries the standard columns ``key value topic partition
offset timestamp``. This module turns it into the reference's envelope
(reference src/kafka_source.py:197-218):

    kafka_key, kafka_timestamp (epoch ms), kafka_offset, kafka_partition,
    kafka_topic, kafka_hash (sha256 of raw value), kafka_message
    (canonical JSON of the filtered payload).

All of it is a single narrow projection: no UDFs, no shuffle — at 100 TB
this fuses with the scan into one codegen stage, and the sha256 runs
vectorized in the JVM.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.config import AllowRule, KeyCodec


def decode_key(key: Column, codec: KeyCodec | str = KeyCodec.UTF_8) -> Column:
    """Key deserializer (S6, reference src/kafka_source.py:74-82):
    bytes -> utf-8 string, or big-endian **unsigned** int-64 rendered as a
    decimal string — the reference does ``int.from_bytes(x,
    byteorder="big")`` with no sign (src/kafka_source.py:78), so an
    MSB-set 8-byte key like 0x80…00 decodes to 9223372036854775808, not a
    negative long. NULL -> ''.

    Unsigned reinterpretation without a UDF: ``conv(hex(key), 16, 10)``
    parses the hex rendering as an unsigned 64-bit value and formats the
    full 0..2^64-1 range as decimal — pure codegen, no Python. Empty
    (0-byte) keys decode to '0' exactly as ``int.from_bytes(b"", "big")``
    does."""
    codec = KeyCodec(codec)
    if codec == KeyCodec.INT_64:
        hexs = F.hex(key.cast("binary"))
        decoded = F.when(hexs == "", F.lit("0")).otherwise(F.conv(hexs, 16, 10))
    else:
        decoded = key.cast("string")
    return F.coalesce(decoded, F.lit(""))


def json_quote(text: Column) -> Column:
    """S5 string schema: the reference stores ``kafka_message =
    json.dumps(text)`` — a JSON-quoted, escape-correct string (reference
    src/kafka_source.py:121-127). JVM-side: serialize a 1-element array and
    strip the brackets, so escaping is ``to_json``'s, not a regex."""
    arr = F.to_json(F.array(text))
    quoted = F.substring(arr, 2, F.length(arr) - F.lit(2))
    return F.when(text.isNull(), F.lit(None)).otherwise(quoted)


def allow_filter_condition(
    payload: Column, rules: Sequence[AllowRule], typed: bool = False
) -> Column:
    """P3 message allow-filter (reference src/kafka_source.py:207-218):
    OR over ``{key, allowed_value}`` equality tests on *top-level* payload
    fields. Returns the keep-condition; the caller NULLs ``kafka_message``
    when it is false — rows are never dropped."""
    conds = []
    for rule in rules:
        field = payload[rule.key] if typed else F.get_json_object(payload, f"$.{rule.key}")
        value = rule.allowed_value if typed else str(rule.allowed_value)
        conds.append(field.isNotNull() & (field == F.lit(value)))
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def with_envelope(
    kafka_df: DataFrame,
    key_codec: KeyCodec | str = KeyCodec.UTF_8,
    message_filters: Optional[Sequence[AllowRule]] = None,
    canonical_message: Optional[Column] = None,
    schema_id: Optional[Column] = None,
    hash_bytes: Optional[Column] = None,
    filter_payload: Optional[Column] = None,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """S3/S5 + F9/F10: standard Kafka columns -> reference envelope.

    - ``kafka_hash`` is sha256 of the raw value bytes — computed before
      any payload filtering (law 2, reference src/kafka_source.py:114;
      test_integration.py:167). Avro mode hashes the header-STRIPPED
      payload (``msg[5:]``, reference :150) — pass ``hash_bytes``.
    - ``kafka_message`` defaults to the raw value decoded as string; pass
      ``canonical_message`` (e.g. a filtered-payload ``to_json``) to
      override — it is stored *post-filter* while the hash stays
      pre-filter.
    - ``message_filters`` NULLs the message (never drops the row). The
      filter evaluates against ``filter_payload`` when given (the
      reference probes the deserialized-and-FILTERED dict,
      src/kafka_source.py:207-218 — pass the decoded JSON for Avro, the
      filtered payload when drop/flag ops ran); defaults to the raw
      value string.
    - ``schema_id`` (Avro mode) appends ``kafka_schema_id`` — the
      reference adds it to every Avro row (src/kafka_source.py:149);
      pass ``kafka.confluent_schema_id(F.col("value"))``.
    - ``passthrough`` carries extra input columns (by name) beside the
      envelope — downstream stages (k6 scrub on the person id, monitor
      projections) need them without a re-join; still one narrow
      projection.
    """
    emitted = {
        "kafka_key",
        "kafka_timestamp",
        "kafka_offset",
        "kafka_partition",
        "kafka_topic",
        "kafka_hash",
        "kafka_message",
    } | ({"kafka_schema_id"} if schema_id is not None else set())
    clash = sorted(emitted & set(passthrough))
    if clash:
        raise ValueError(
            f"passthrough columns {clash} collide with envelope output "
            "columns — the duplicate names would be silently ambiguous "
            "downstream; rename them on the input frame first"
        )
    message = (
        canonical_message if canonical_message is not None else F.col("value").cast("string")
    )
    if message_filters:
        probe = (
            filter_payload
            if filter_payload is not None
            else F.col("value").cast("string")
        )
        keep = allow_filter_condition(probe, message_filters)
        message = F.when(keep, message).otherwise(F.lit(None))
    cols = [
        decode_key(F.col("key"), key_codec).alias("kafka_key"),
        F.unix_millis(F.col("timestamp").cast("timestamp")).alias("kafka_timestamp"),
        F.col("offset").alias("kafka_offset"),
        F.col("partition").alias("kafka_partition"),
        F.col("topic").alias("kafka_topic"),
        F.sha2(
            (hash_bytes if hash_bytes is not None else F.col("value")).cast("binary"),
            256,
        ).alias("kafka_hash"),
        message.alias("kafka_message"),
    ]
    if schema_id is not None:
        cols.append(schema_id.cast("long").alias("kafka_schema_id"))
    cols.extend(F.col(c) for c in passthrough)
    return kafka_df.select(*cols)


def events_as_kafka_frame(
    events: DataFrame,
    topic: str | Column = "events",
    n_partitions: int = 2,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """Map the driver's ``events`` table onto the standard Kafka column
    set (FIXTURES.md F-1 mapping): ``event_id -> offset``, ``ts ->
    timestamp``, ``user_id -> key``, ``props -> value``. Partition id is
    derived deterministically as ``user_id % n_partitions`` (the reference
    tests produce with ``partition=i % 2``, test_integration.py:110-117).
    ``topic`` may be a Column for multi-topic fan-in (one subscribe over
    several topics, S2) — the reference runs one Mapping per topic
    (src/mapping.py:10-47); a column-valued topic lets ONE conformed
    pipeline carry them all, keyed apart by the composite
    (topic, partition, offset) identity.
    ``passthrough`` keeps extra source columns beside the Kafka set (for
    ``with_envelope(..., passthrough=...)`` to carry further).
    """
    clash = sorted(
        {"key", "value", "topic", "partition", "offset", "timestamp"}
        & set(passthrough)
    )
    if clash:
        raise ValueError(
            f"passthrough columns {clash} collide with the standard "
            "Kafka column set — the duplicate names would be silently "
            "ambiguous downstream (ingest_transform renames the events "
            "measure value -> event_value for exactly this reason); "
            "rename them on the input frame first"
        )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
        (F.lit(topic) if isinstance(topic, str) else topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        *[F.col(c) for c in passthrough],
    )
