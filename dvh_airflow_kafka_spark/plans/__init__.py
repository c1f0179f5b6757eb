from dvh_airflow_kafka_spark.plans.corpus_dsl import (
    CorpusPipelineSpec,
    parse_corpus_config,
    run_corpus_pipeline,
)
from dvh_airflow_kafka_spark.plans.transform_dsl import Transform

__all__ = [
    "CorpusPipelineSpec",
    "Transform",
    "parse_corpus_config",
    "run_corpus_pipeline",
]
