"""Every catalog query vs its DuckDB oracle at sf0.001 — the same gate the
driver runs at sf0.01 (order-insensitive row/schema/value comparison)."""

from __future__ import annotations

import pytest

from dvh_airflow_kafka_spark.catalog import REGISTRY
from tests.compare import compare_query

ORACLED = [n for n, q in REGISTRY.items() if q.sql is not None]
ROWS_ONLY = [n for n, q in REGISTRY.items() if q.sql is None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    qd = REGISTRY[name]
    res = compare_query(spark, name, qd.fn, qd.sql, sf_dir)
    assert res["cols_match"], f"{res['spark_cols']} != {res['duck_cols']}"
    assert res["spark_rows"] == res["duck_rows"]
    assert res["match"], res.get("first_diffs")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    assert REGISTRY[name].fn(spark, sf_dir).count() >= 0


def test_manifest_in_sync_with_registry():
    """MANIFEST.md is the externally-diffable list of every registered
    query — regenerate with tools/gen_manifest.py when it drifts."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "MANIFEST.md")
    with open(path) as f:
        listed = set(re.findall(r"^\d+\. `([^`]+)`", f.read(), re.MULTILINE))
    assert listed == set(REGISTRY), (
        f"MANIFEST.md drift: missing={sorted(set(REGISTRY) - listed)} "
        f"stale={sorted(listed - set(REGISTRY))} — run "
        f"PYTHONPATH=. python tools/gen_manifest.py"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_deterministic(spark, sf_dir, name):
    """Rows-only queries have no DuckDB hash pinning them — pin
    run-to-run determinism instead: two executions must produce
    identical canonical row sets (catches rand()/partition-order
    sensitivity the oracle gate can't see)."""
    from tests.compare import canonical_rows

    qd = REGISTRY[name]
    a = qd.fn(spark, sf_dir)
    rows_a = canonical_rows(a.columns, [tuple(r) for r in a.collect()])
    b = qd.fn(spark, sf_dir)
    rows_b = canonical_rows(b.columns, [tuple(r) for r in b.collect()])
    assert rows_a == rows_b
