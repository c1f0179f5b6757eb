"""Bucketed-table layout: co-located joins and aggregations run without
an Exchange on the bucketed side, and results equal the unbucketed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.io import load_table, write_bucketed

N_BUCKETS = 4


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    """orders + customer bucketed by custkey into the same bucket count."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(
        orders,
        "b_orders",
        str(tmp_path / "b_orders"),
        "o_custkey",
        n_buckets=N_BUCKETS,
        sort_cols="o_custkey",
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        str(tmp_path / "b_customer"),
        "o_custkey",
        n_buckets=N_BUCKETS,
        sort_cols="o_custkey",
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def _executed_plan(df) -> str:
    df.collect()  # force AQE to finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t1, t2 = bucketed_pair
    # force the sort-merge path (broadcast would hide the bucketing win)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), on="o_custkey")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides scan pre-bucketed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    t1, _ = bucketed_pair
    agg = spark.table(t1).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan  # bucket distribution satisfies the agg


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    t1, t2 = bucketed_pair
    bucketed = (
        spark.table(t1)
        .join(spark.table(t2), on="o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, on="o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
