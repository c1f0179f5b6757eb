from dvh_airflow_kafka_spark.streaming.keyindex import SinkKeyIndex
from dvh_airflow_kafka_spark.streaming.pipeline import (
    StreamingRun,
    run_streaming_pipeline,
    run_streaming_produce,
)

__all__ = [
    "run_streaming_pipeline",
    "run_streaming_produce",
    "StreamingRun",
    "SinkKeyIndex",
]
