from dvh_airflow_kafka_spark.sources.envelope import (
    decode_key,
    events_as_kafka_frame,
    with_envelope,
)
from dvh_airflow_kafka_spark.sources.schema_registry import SchemaRegistryClient

__all__ = [
    "with_envelope",
    "decode_key",
    "events_as_kafka_frame",
    "SchemaRegistryClient",
]
