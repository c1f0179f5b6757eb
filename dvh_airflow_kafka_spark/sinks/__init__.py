from dvh_airflow_kafka_spark.sinks.writers import (
    write_console,
    write_jdbc,
    write_kafka_avro,
    write_parquet_append,
)

__all__ = [
    "write_parquet_append",
    "write_jdbc",
    "write_kafka_avro",
    "write_console",
]
