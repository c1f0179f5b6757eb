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


def write_kafka_avro(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    value_schema_json: str,
) -> None:
    """S8: Avro-encoded producer with uuid4 string keys (reference
    src/kafka_target.py:55-63). Requires the spark-avro + kafka jars."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-avro not on classpath") from e
    payload = df.select(
        F.expr("uuid()").cast("binary").alias("key"),
        to_avro(F.struct(*df.columns), value_schema_json).alias("value"),
    )
    (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def write_console(df: DataFrame, n: int = 20) -> None:
    """S9: debug sink (reference src/console_target.py:5-15)."""
    df.show(n=n, truncate=False)
