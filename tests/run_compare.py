"""Manual harness: run every catalog query against its DuckDB oracle and
print a per-query verdict. Usage:

    python tests/run_compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

from dvh_airflow_kafka_spark.catalog import REGISTRY
from dvh_airflow_kafka_spark.session import get_spark
from tests.compare import compare_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("compare", cpus=8)
    failures = []
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if qd.sql is None:
            try:
                n = qd.fn(spark, sf_dir).count()
                print(f"  rows-only {name}: {n} rows  [{time.time()-t0:.1f}s]")
            except Exception as e:
                print(f"✗ ERROR {name}: {e}")
                failures.append(name)
            continue
        try:
            res = compare_query(spark, name, qd.fn, qd.sql, sf_dir)
        except Exception as e:
            print(f"✗ ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        status = "✓" if res["match"] else "✗"
        print(
            f"{status} {name}: spark={res['spark_rows']} duck={res['duck_rows']} "
            f"cols_match={res['cols_match']}  [{time.time()-t0:.1f}s]"
        )
        if not res["match"]:
            failures.append(name)
            if not res["cols_match"]:
                print(f"    spark cols: {res['spark_cols']}")
                print(f"    duck  cols: {res['duck_cols']}")
            for a, b in res.get("first_diffs", []):
                print(f"    spark: {a}")
                print(f"    duck : {b}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
