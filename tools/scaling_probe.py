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




def probe_dedup(max_factor: int = 4) -> None:
    """Scaling curve for the dedup family: exact fingerprint dedup and
    banded MinHash-LSH over the documents table replicated N× (each
    replica textually distinct, so the work scales with rows)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.ext.dedup import (
        exact_dedup_survivors,
        minhash_near_duplicates,
    )
    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.session import get_spark

    spark = get_spark("scaling_probe_dedup")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()
    tmp = tempfile.mkdtemp(prefix="scale_dedup_")
    out = []
    for factor in sorted({f for f in (1, 2, max_factor) if f <= max_factor}):
        pool = base.select("doc_id", "text")
        for i in range(1, factor):
            pool = pool.unionByName(
                base.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" r{i}")).alias("text"),
                )
            )
        path = f"{tmp}/docs_x{factor}"
        pool.write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)

        t0 = time.time()
        exact_dedup_survivors(docs, ["text"], "doc_id").write.format(
            "noop"
        ).mode("overwrite").save()
        exact_s = time.time() - t0

        t0 = time.time()
        minhash_near_duplicates(docs, "doc_id", "text").write.format(
            "noop"
        ).mode("overwrite").save()
        mh_s = time.time() - t0

        rows = n_base * factor
        out.append(
            {
                "factor": factor,
                "rows": rows,
                "exact_sec": round(exact_s, 2),
                "minhash_sec": round(mh_s, 2),
            }
        )
        print(f"# dedup x{factor}: exact {exact_s:.2f}s minhash {mh_s:.2f}s",
              file=sys.stderr)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "dedup_scaling", "runs": out}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dedup":
        probe_dedup(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
        raise SystemExit(0)
    raise SystemExit(main())
