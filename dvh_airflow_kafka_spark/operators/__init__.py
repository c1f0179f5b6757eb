from dvh_airflow_kafka_spark.operators.dedup import dedup_against_existing
from dvh_airflow_kafka_spark.operators.payload import (
    drop_fields,
    flag_fields,
    filter_json_payload,
    python_canonical_json,
)
from dvh_airflow_kafka_spark.operators.privacy import scrub_flagged_persons
from dvh_airflow_kafka_spark.operators.summary import (
    ProcessSummary,
    full_summary_frame,
    observe_summary,
    summary_frame,
)
from dvh_airflow_kafka_spark.operators.watermark import delta_watermark

__all__ = [
    "drop_fields",
    "flag_fields",
    "filter_json_payload",
    "python_canonical_json",
    "scrub_flagged_persons",
    "dedup_against_existing",
    "delta_watermark",
    "observe_summary",
    "summary_frame",
    "full_summary_frame",
    "ProcessSummary",
]
