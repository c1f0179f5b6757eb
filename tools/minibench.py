"""Dedicated re-measurement of specific queries: best of 3 noop-sink runs."""
import json, os, sys, time, gc

names = sys.argv[1:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from dvh_airflow_kafka_spark.catalog import REGISTRY
from dvh_airflow_kafka_spark.session import get_spark

spark = get_spark("minibench")
REGISTRY["flagship_etl_pipeline"].fn(spark, SF).write.format("noop").mode("overwrite").save()

out = {}
for name in names:
    fn = REGISTRY[name].fn
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    out[name] = runs
    print(f"# {name}: min {min(runs)} runs {runs}", flush=True)
print(json.dumps({"queries_min": {k: min(v) for k, v in out.items()}, "runs": out}))
spark.stop()
