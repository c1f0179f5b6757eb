"""Distributed global rank / NTILE arithmetic (ext/ranking.py): exact
equivalence to the single-window forms, partition-count independence,
and the prefix-sum shard packer built on the same two-pass machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext.ranking import ntile_from_rank, with_global_rank
from dvh_airflow_kafka_spark.ext.sampling import pack_into_shards
from dvh_airflow_kafka_spark.io import load_table


def test_global_rank_matches_single_window(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, total = with_global_rank(
        cust, ["c_acctbal", "c_custkey"], rank_col="r"
    )
    got = {r["c_custkey"]: r["r"] for r in ranked.collect()}
    w = Window.orderBy("c_acctbal", "c_custkey")
    want = {
        r["c_custkey"]: r["r"]
        for r in cust.select(
            "c_custkey", F.row_number().over(w).alias("r")
        ).collect()
    }
    assert got == want
    assert total == len(want)


def test_global_rank_partition_count_independent(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    a, _ = with_global_rank(cust, ["c_custkey"], rank_col="r", num_partitions=3)
    b, _ = with_global_rank(cust, ["c_custkey"], rank_col="r", num_partitions=17)
    assert {(r["c_custkey"], r["r"]) for r in a.collect()} == {
        (r["c_custkey"], r["r"]) for r in b.collect()
    }


@pytest.mark.parametrize("total,tiles", [(10, 10), (95, 10), (7, 10), (100, 7)])
def test_ntile_from_rank_matches_ntile(spark, total, tiles):
    df = spark.range(1, total + 1).withColumnRenamed("id", "k")
    w = Window.orderBy("k")
    want = {
        r["k"]: r["t"]
        for r in df.select("k", F.ntile(tiles).over(w).alias("t")).collect()
    }
    got = {
        r["k"]: r["t"]
        for r in df.select(
            "k", ntile_from_rank(F.col("k"), total, tiles).alias("t")
        ).collect()
    }
    assert got == want


def test_pack_into_shards_matches_global_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("sz")
    )
    got = {
        r["doc_id"]: (r["size"], r["shard_id"], r["offset_in_shard"])
        for r in pack_into_shards(
            docs, "doc_id", F.col("sz"), capacity=512, num_partitions=5
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    before = (F.sum("sz").over(w) - F.col("sz")).cast("long")
    want = {
        r["doc_id"]: (r["size"], r["shard_id"], r["offset_in_shard"])
        for r in docs.select(
            "doc_id",
            F.col("sz").cast("long").alias("size"),
            F.floor(before / 512).cast("long").alias("shard_id"),
            (before % 512).cast("long").alias("offset_in_shard"),
        ).collect()
    }
    assert got == want


def test_pack_into_shards_no_single_partition_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("sz")
    )
    plan = (
        pack_into_shards(docs, "doc_id", F.col("sz"), capacity=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window node must carry a partition spec
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_slice" in line
