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


def test_curriculum_positions_are_a_permutation(spark, sf_dir):
    """curriculum_pos must be exactly 1..N (a total order with no gaps
    or ties), and deciles must be non-decreasing along the position."""
    from dvh_airflow_kafka_spark.catalog import REGISTRY

    rows = REGISTRY["curriculum_schedule"].fn(spark, sf_dir).collect()
    pos = sorted(r.curriculum_pos for r in rows)
    assert pos == list(range(1, len(rows) + 1))
    by_pos = sorted(rows, key=lambda r: r.curriculum_pos)
    deciles = [r.decile for r in by_pos]
    assert deciles == sorted(deciles)


def test_token_budget_monotone_in_budget(spark, sf_dir):
    """A larger token budget must keep a SUPERSET of documents (greedy
    prefix property of the quality order)."""
    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.ext.sampling import with_prefix_sum
    from dvh_airflow_kafka_spark.ext.text import quality_score, token_count_ws
    from dvh_airflow_kafka_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        token_count_ws(F.col("text")).cast("long").alias("n"),
    )
    pre = with_prefix_sum(
        scored, "doc_id", F.col("n"),
        order_by=[-F.col("q"), F.col("doc_id")],
    ).persist()
    small = {r.doc_id for r in pre.filter("before + size <= 4096").collect()}
    large = {r.doc_id for r in pre.filter("before + size <= 16384").collect()}
    assert small and small < large


def test_length_batches_tile_and_account(spark, sf_dir):
    """Batches partition the corpus into consecutive 32-runs (last one
    ragged) and padding_waste is consistent with max/sum."""
    from dvh_airflow_kafka_spark.catalog import REGISTRY, _BATCH_SIZE

    rows = REGISTRY["length_bucketed_batches"].fn(spark, sf_dir).collect()
    assert rows
    by_id = sorted(rows, key=lambda r: r.batch_id)
    assert [r.batch_id for r in by_id] == list(range(len(by_id)))
    for r in by_id[:-1]:
        assert r.n_docs == _BATCH_SIZE
    assert 1 <= by_id[-1].n_docs <= _BATCH_SIZE
    for r in by_id:
        assert r.padding_waste == r.n_docs * r.max_tokens - r.sum_tokens
        assert r.padding_waste >= 0


@pytest.mark.parametrize("nparts", [1, 3, 32])
def test_rank_and_prefix_invariant_under_parallelism(spark, sf_dir, nparts):
    """The two-pass rank/prefix-sum must produce IDENTICAL output at any
    partition count — the property that makes it safe to swap for the
    single-window form on any cluster geometry. (A bug that leaks slice
    boundaries into the result shows up here as a diff between
    parallelism levels.)"""
    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.ext.ranking import with_global_rank
    from dvh_airflow_kafka_spark.ext.sampling import with_prefix_sum
    from dvh_airflow_kafka_spark.ext.text import token_count_ws
    from dvh_airflow_kafka_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", token_count_ws(F.col("text")).alias("sz")
    )
    ranked, total = with_global_rank(
        sized, ["sz", "doc_id"], rank_col="r", num_partitions=nparts
    )
    got_rank = {(r.doc_id, r.r) for r in ranked.collect()}
    serial = sorted(
        ((r.sz, r.doc_id) for r in sized.collect())
    )
    want_rank = {(doc, i + 1) for i, (_, doc) in enumerate(serial)}
    assert got_rank == want_rank and total == len(serial)

    pre = with_prefix_sum(
        sized, "doc_id", F.col("sz"), num_partitions=nparts
    )
    got_pre = {(r.doc_id, r.before) for r in pre.collect()}
    cum, want_pre = 0, set()
    for r in sorted(sized.collect(), key=lambda r: r.doc_id):
        want_pre.add((r.doc_id, cum))
        cum += r.sz
    assert got_pre == want_pre
