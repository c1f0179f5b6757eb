#!/usr/bin/env python
"""Scaling probe: replicate the sf0.1 events table N× on disk and push it
through the flagship ETL spine end-to-end (noop sink), reporting rows/s
at each scale. The point is the SHAPE of the curve — a scan-fused
pipeline should scale ~linearly in rows on a fixed-core box — plus a
single-node throughput number to hold against the reference's
single-threaded dict-at-a-time loop (recommended batch: 5k msgs).

Usage: PYTHONPATH=. python tools/scaling_probe.py [max_factor]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    from dvh_airflow_kafka_spark.catalog import (
        _FLAGSHIP_FILTERS,
        _FLAGSHIP_RULES,
        BATCH_TIME,
    )
    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.plans import Transform
    from dvh_airflow_kafka_spark.session import get_spark
    from dvh_airflow_kafka_spark.sources import (
        events_as_kafka_frame,
        with_envelope,
    )

    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scaling_probe")
    base = load_table(spark, "/root/testdata/sf0.1", "events")
    n_base = base.count()
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    results = []
    factors = sorted({f for f in (1, 2, 4, max_factor) if f <= max_factor})
    for factor in factors:
        path = f"{tmp}/events_x{factor}"
        scaled = base
        # re-key replicas so dedup semantics stay meaningful
        for i in range(1, factor):
            scaled = scaled.unionByName(
                base.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 10_000_000)
                )
            )
        scaled.write.mode("overwrite").parquet(path)
        events = spark.read.parquet(path)

        def run_once() -> float:
            t0 = time.time()
            env = with_envelope(
                events_as_kafka_frame(events),
                message_filters=_FLAGSHIP_FILTERS,
            )
            out = Transform(_FLAGSHIP_RULES, batch_time=BATCH_TIME).apply(env)
            out.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run_once()  # warm
        sec = min(run_once() for _ in range(2))
        rows = n_base * factor
        results.append(
            {
                "factor": factor,
                "rows": rows,
                "sec": round(sec, 3),
                "rows_per_sec": int(rows / sec),
            }
        )
        print(f"# x{factor}: {rows} rows in {sec:.2f}s", file=sys.stderr)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "flagship_etl_rows_per_sec", "runs": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
