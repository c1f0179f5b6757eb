"""Scale-hygiene laws: guarantees the 100 TB configuration leans on —
the approximate-percentile rank-error bound (the mergeable sketch used
when exact ordered stats are too expensive) and schema-evolution reads
(a century-long table accretes columns; old files must stay readable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.io import load_table


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9])
def test_percentile_approx_rank_error_bound(spark, sf_dir, q):
    """percentile_approx(accuracy=A) must return a value whose RANK is
    within n/A of the true q·n rank (Greenwald-Khanna style bound) —
    the contract that justifies swapping it in for exact percentiles
    when a global sort is too expensive."""
    acc = 100
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    (approx,) = ev.agg(
        F.percentile_approx("value", q, acc).alias("p")
    ).collect()[0]
    n_below = ev.filter(F.col("value") < approx).count()
    n_lte = ev.filter(F.col("value") <= approx).count()
    target = q * n
    tol = n / acc + 1
    # the target rank must fall within the value's rank interval ± tol
    assert n_below - tol <= target <= n_lte + tol, (
        q,
        approx,
        n_below,
        n_lte,
        target,
    )


def test_parquet_schema_evolution_merges_and_prunes(spark, tmp_path):
    """Old files without a later-added column read as NULL under
    mergeSchema, and filters on the original columns still push down to
    the scan — the evolution path a long-lived table depends on."""
    old = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("a")
    )
    new = spark.range(100, 200).select(
        F.col("id"), (F.col("id") * 2).alias("a"), F.lit("fresh").alias("b")
    )
    old.write.parquet(str(tmp_path / "part=0"))
    new.write.parquet(str(tmp_path / "part=1"))
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path))
    assert set(merged.columns) == {"id", "a", "b", "part"}
    got = merged.filter(F.col("a") >= 198).select("id", "b").collect()
    assert {(r.id, r.b) for r in got} == {(99, None)} | {
        (i, "fresh") for i in range(100, 200)
    }
    plan = merged.filter(F.col("a") >= 198)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(a), GreaterThanOrEqual(a,198)" in plan, plan


def test_tpch_q6_scan_pushes_filters_and_prunes_columns(spark, sf_dir):
    """The canonical pushdown query: q6's selective predicates must reach
    the parquet scan (PushedFilters) and the scan must read ONLY the four
    columns the query touches — the properties that make a 100 TB scan
    proportional to the selectivity, not the table."""
    import contextlib
    import io

    from dvh_airflow_kafka_spark.catalog import REGISTRY

    df = REGISTRY["tpch_q6_forecast_revenue"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan[:3000]
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "IsNotNull(l_quantity)" in plan
    i = plan.find("ReadSchema: struct<")
    schema_line = plan[i : plan.find("\n", i)]
    cols = set(
        c.split(":")[0]
        for c in schema_line.split("struct<", 1)[1].rstrip(">").split(",")
    )
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }, schema_line


def test_bench_headline_all_registered_and_summary_bounded():
    """Every bench HEADLINE entry must exist in the registry (a renamed
    query would silently crash the driver's bench run), and the final
    summary line must fit the driver's ~2000-char tail capture even at
    worst-case float widths — the round-5 `parsed: null` regression
    class."""
    import json

    import bench
    from dvh_airflow_kafka_spark.catalog import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    worst = {n: 999.99 for n in bench.HEADLINE[:25]}
    summary = {
        "metric": "headline catalog queries, noop-sink end-to-end",
        "value": 99999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(bench.HEADLINE),
        "queries": worst,
    }
    assert len(json.dumps(summary)) <= 1500
