"""Deterministic hash split/sample: stability across runs and
re-partitionings, fraction accuracy, and stratum uniformity."""

from __future__ import annotations

from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext.sampling import (
    hash_split,
    stratified_hash_sample,
)
from dvh_airflow_kafka_spark.io import load_table


def test_split_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id").collect()
    }
    assert a == b  # assignment is a pure function of the key


def test_split_fraction_close(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    train = hash_split(docs, "doc_id").filter(F.col("split") == "train").count()
    assert abs(train / n - 0.8) < 0.08


def test_salt_redraws_assignment(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="v2").collect()}
    assert a != b  # new salt, new draw
    assert set(a) == set(b)  # same universe


def test_stratified_sample_uniform_per_stratum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    kept = stratified_hash_sample(ev, "event_id", frac=0.2)
    per = {
        r["event_type"]: r["frac"]
        for r in kept.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
            on="event_type",
        )
        .select("event_type", (F.col("k") / F.col("n")).alias("frac"))
        .collect()
    }
    assert per and all(abs(f - 0.2) < 0.06 for f in per.values())
