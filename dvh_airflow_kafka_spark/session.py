"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM; production targets a
multi-executor cluster. All knobs that matter at 100 TB (AQE, shuffle
partitioning, skew-join handling, broadcast threshold) are set here once
so every entry point — tests, bench, driver contract — gets the same
execution profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dvh_airflow_kafka_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for correctness-vs-oracle and 100 TB readiness:

    - ``spark.sql.session.timeZone=UTC``: naive timestamps collect as UTC
      wall clock, matching DuckDB's UTC-naive TIMESTAMP; all Europe/Oslo
      handling is explicit via ``from_utc_timestamp`` (reference
      semantics: transform.py:8-21 normalises to Oslo wall clock).
    - AQE on with coalescing + skew-join: at 100 TB the static
      shuffle-partition count is always wrong for some stage; AQE
      re-plans from runtime stats.
    - shuffle partitions default to core count locally; on a real
      cluster this is overridden to ~2-3x total cores.
    - Arrow enabled: every pandas_udf / mapInPandas boundary is
      Arrow-batched, never per-row pickled.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        # Single-JVM local mode: every task is process-local by definition,
        # but delay scheduling still waits spark.locality.wait (3s default)
        # per stage for cached-block locality — a pure stall. On a real
        # cluster the default stays (rack/node locality is worth 3s there).
        builder = builder.master(f"local[{n}]").config("spark.locality.wait", "0")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
