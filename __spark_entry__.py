"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All definitions live in ``dvh_airflow_kafka_spark.catalog`` — one
(Spark query, DuckDB oracle) pair per implemented operator from
SURVEY.md §2 (+ the [EXT] training-data operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's whole ETL
    spine (envelope → allow-filter → transform DSL) as one Spark plan."""
    from dvh_airflow_kafka_spark.catalog import flagship_etl_pipeline

    return flagship_etl_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dvh_airflow_kafka_spark.catalog import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    seeded-LSH ops → driver records a rows-only check)."""
    from dvh_airflow_kafka_spark.catalog import oracle_sqls

    return oracle_sqls()
