"""Sinks S7/S8/S9 re-expressed on Spark writers.

- S7 Oracle batch insert (reference src/oracle_target.py:83-123): the
  reference array-binds one INSERT per batch with an inline NOT-EXISTS
  dedup. Spark: dedup is an explicit anti-join (operators.dedup) *before*
  the write — the write itself is a plain JDBC append with
  ``batchsize`` doing the array-bind (reference's ``executemany``,
  src/oracle_target.py:113). ``setinputsizes``-style type hints become the
  whitelisted ``createTableColumnTypes``/``sessionInitStatement`` options
  — never ``eval`` (the reference evaluated config strings,
  src/base.py:35-42).
- S8 Kafka producer (reference src/kafka_target.py:32-90): ``to_avro``
  payload + ``format("kafka")``; uuid keys via ``uuid()`` expression.
- S9 console (reference src/console_target.py:5-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet_append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Lake sink used by tests and the streaming pipeline. Partitioning by
    a date/bucket column keeps 100 TB appends prunable on read."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
    batchsize: int = 5000,
) -> None:
    """S7: JDBC append. ``batchsize`` defaults to the reference's
    recommended 5000 (README.md:79-80)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def kafka_writer_options(
    bootstrap_servers: str,
    topic: str,
    ca_path: str | None = None,
    cert_key_path: str | None = None,
) -> dict[str, str]:
    """S8 writer-option contract (reference src/kafka_target.py:57-78):
    the reference's producer config is ``bootstrap.servers`` plus, off
    localhost, SSL via PEM file paths from env. Spark's kafka sink takes
    the same client config under a ``kafka.`` prefix; the PEM paths map
    to the JVM client's PEM-typed stores (``ssl.truststore.location`` =
    the reference's KAFKA_CA_PATH; ``ssl.keystore.location`` = one PEM
    holding certificate + private key, the JVM merge of the reference's
    separate KAFKA_CERTIFICATE_PATH / KAFKA_PRIVATE_KEY_PATH). Pinned by
    tests/test_kafka_sink_contract.py — change shape there first."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    if ca_path or cert_key_path:
        opts["kafka.security.protocol"] = "SSL"
        if ca_path:
            opts["kafka.ssl.truststore.type"] = "PEM"
            opts["kafka.ssl.truststore.location"] = ca_path
        if cert_key_path:
            opts["kafka.ssl.keystore.type"] = "PEM"
            opts["kafka.ssl.keystore.location"] = cert_key_path
    return opts


def kafka_payload_confluent(
    df: DataFrame,
    value_schema_json: str,
    schema_id: int,
    key=None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """S8 payload contract, jar-free: (key, value) binary columns exactly
    as the reference produces them (src/kafka_target.py:80-90) — key =
    uuid4 string serialized utf-8 (StringSerializer("utf_8") over
    str(uuid4())), value = Confluent wire format (magic 0x00 + 4-byte
    big-endian schema id + Avro body, what AvroSerializer emits). Avro
    encoding runs in our Arrow-batched codec (sources/avro_codec.py), so
    the payload plan needs no spark-avro jar; only the final
    ``format("kafka").save()`` needs the kafka connector jar.

    ``key`` (a binary Column) overrides the reference's random uuid4 key
    — the idempotent-produce mode: a deterministic key (e.g. the source
    log position) makes a crash-replayed epoch emit byte-identical
    records, so a compacted topic or any keyed consumer dedups the
    replay and at-least-once delivery becomes exactly-once effects (the
    producer-side twin of the J1 sink anti-join). The reference cannot
    do this: its uuid4 keys make every replay a new record."""
    from ..sources.avro_codec import avro_encode_from_json_udf
    from ..sources.kafka import confluent_frame

    value_cols = value_cols if value_cols is not None else df.columns
    body = avro_encode_from_json_udf(value_schema_json)(
        F.to_json(F.struct(*value_cols))
    )
    key_col = F.encode(F.expr("uuid()"), "UTF-8") if key is None else key
    return df.select(
        key_col.alias("key"),
        confluent_frame(F.lit(schema_id), body).alias("value"),
    )


def write_kafka_avro(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    value_schema_json: str,
    schema_id: int = 1,
    ca_path: str | None = None,
    cert_key_path: str | None = None,
) -> None:
    """S8: Confluent-framed Avro producer with uuid4 string keys
    (reference src/kafka_target.py:32-90). Payload build + options are
    jar-free (contract-tested); the save itself requires the kafka
    connector jar. Delivery semantics: Spark's kafka sink acks every
    record per task before committing (the reference's per-batch
    ``flush``, src/kafka_target.py:90); a failed task retries whole, so
    downstream must tolerate at-least-once just as the reference's
    console consumers do."""
    payload = kafka_payload_confluent(df, value_schema_json, schema_id)
    writer = payload.write.format("kafka")
    for k, v in kafka_writer_options(
        bootstrap_servers, topic, ca_path=ca_path, cert_key_path=cert_key_path
    ).items():
        writer = writer.option(k, v)
    writer.save()


def write_console(df: DataFrame, n: int = 20) -> None:
    """S9: debug sink (reference src/console_target.py:5-15)."""
    df.show(n=n, truncate=False)
