"""Structural per-query profile: build time (plan construction in
driver Python), execution time (noop sink), and deterministic job /
stage / task counts from the status tracker.

The counts separate overhead-dominated queries (many tiny jobs /
32-task stages on KB inputs) from compute-dominated ones — guide §1's
"decide whether the time is going to ... scheduler delay" for a
270-query catalog, without the UI.

Usage: python tools/query_profile.py [query ...] (default: full registry)
Writes JSON lines to stdout; one dict per query.
"""

import gc
import json
import os
import sys
import time

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvh_airflow_kafka_spark.catalog import REGISTRY  # noqa: E402
from dvh_airflow_kafka_spark.session import get_spark  # noqa: E402

spark = get_spark("query_profile")
sc = spark.sparkContext
tracker = sc.statusTracker()

_GC_BEANS = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()


def _gc_ms() -> int:
    total = 0
    it = _GC_BEANS.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total


def _cpu_jiffies() -> dict:
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    # cpu user nice system idle iowait irq softirq steal
    return {
        "user": int(f[1]) + int(f[2]),
        "system": int(f[3]),
        "idle": int(f[4]),
        "iowait": int(f[5]),
        "steal": int(f[8]),
    }

# warm codegen/classloading like bench.py does
REGISTRY["flagship_etl_pipeline"].fn(spark, SF).write.format("noop").mode(
    "overwrite"
).save()


def _counts_between(jid_lo: int, jid_hi: int) -> dict:
    jobs = [j for j in tracker.getJobIdsForGroup() if jid_lo < j <= jid_hi]
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is None:
                continue
            n_stages += 1
            n_tasks += si.numTasks
    return {"jobs": len(jobs), "stages": n_stages, "tasks": n_tasks}


def profile(name: str) -> dict:
    fn = REGISTRY[name].fn
    before = max(tracker.getJobIdsForGroup(), default=-1)
    gc0, cpu0 = _gc_ms(), _cpu_jiffies()
    t0 = time.time()
    df = fn(spark, SF)
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    gc1, cpu1 = _gc_ms(), _cpu_jiffies()
    time.sleep(0.05)  # let the async status listener drain
    after = max(tracker.getJobIdsForGroup(), default=-1)
    out = {
        "name": name,
        "build_s": round(t1 - t0, 3),
        "exec_s": round(t2 - t1, 3),
        "total_s": round(t2 - t0, 3),
        "gc_ms": gc1 - gc0,
    }
    for k in cpu0:
        out[f"cpu_{k}"] = cpu1[k] - cpu0[k]
    out.update(_counts_between(before, after))
    return out


names = sys.argv[1:] or list(REGISTRY)
rows = []
for i, name in enumerate(names):
    r = profile(name)
    rows.append(r)
    print(json.dumps(r), flush=True)
    gc.collect()
    if (i + 1) % 25 == 0:
        spark.catalog.clearCache()

path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PROFILE_FULL.json")
with open(os.path.abspath(path), "w") as fh:
    json.dump(rows, fh)
spark.stop()
