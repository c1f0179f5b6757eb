"""dvh_airflow_kafka_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of navikt/dvh-airflow-kafka.

This is NOT a port: the reference is a single-threaded Python ETL loop
(reference src/mapping.py:49-57); this engine re-expresses the same
semantics — Kafka envelope ingestion, a declarative transform DSL,
nested-payload projection/flag/filter, privacy semi-join scrub, idempotent
dedup-on-insert sinks — as Spark DataFrame / SQL / Structured Streaming
plans that Catalyst can optimize and that scale horizontally.

Layout
------
- ``session``    SparkSession factory with scale-tuned defaults
- ``config``     pydantic models mirroring the reference's YAML surface
- ``functions``  scalar-function registry (transform DSL ``fun`` names)
- ``plans``      transform-DSL compiler: config -> Column projection
- ``sources``    Kafka / parquet envelope sources
- ``operators``  payload ops, privacy scrub, dedup, watermark, summary
- ``sinks``      jdbc / kafka / console / files sinks
- ``streaming``  structured-streaming micro-batch pipeline
- ``ext``        large-scale training-data ops: dedup, similarity, text
"""

__version__ = "0.1.0"
