from dvh_airflow_kafka_spark.functions.registry import (
    TRANSFORMS,
    bool_to_int,
    canonical_json,
    content_hash,
    epoch_ms_to_oslo,
    epoch_s_to_oslo,
    identity,
    str_to_code,
    str_to_oslo_datetime,
    to_oslo_wall_clock,
)

__all__ = [
    "TRANSFORMS",
    "identity",
    "str_to_code",
    "str_to_oslo_datetime",
    "epoch_s_to_oslo",
    "epoch_ms_to_oslo",
    "bool_to_int",
    "to_oslo_wall_clock",
    "content_hash",
    "canonical_json",
]
