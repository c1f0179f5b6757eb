from dvh_airflow_kafka_spark.plans.transform_dsl import Transform

__all__ = ["Transform"]
