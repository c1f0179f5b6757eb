"""profile_table null/distinct accounting, approx-profile error bounds,
and salted_join equivalence with a plain join (duplicates, misses, outer
variant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext.profile import (
    label_centroids,
    profile_table,
    profile_table_approx,
)
from dvh_airflow_kafka_spark.operators.skew import salted_join


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 2.0, None), (4, None, None)],
        "id long, x double, s string",
    )
    prof = {r["col_name"]: r for r in profile_table(
        df, numeric_cols=["id", "x"], other_cols=["s"]
    ).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["id"]["min_d"] == 1.0 and prof["id"]["max_d"] == 4.0
    assert prof["x"]["n_null"] == 2 and prof["x"]["n_distinct"] == 1
    assert prof["s"]["n_null"] == 2 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_d"] is None and prof["s"]["max_d"] is None


def test_profile_approx_within_rsd(spark, sf_dir):
    from dvh_airflow_kafka_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {r["col_name"]: r["n_distinct"] for r in profile_table(
        ev, numeric_cols=["user_id"], other_cols=["event_type"]
    ).collect()}
    approx = {r["col_name"]: r["n_distinct"] for r in profile_table_approx(
        ev, numeric_cols=["user_id"], other_cols=["event_type"], rsd=0.05
    ).collect()}
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(2, 0.15 * exact[c])


def test_label_centroids_small(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [2.0, 2.0])],
        "label int, embedding array<double>",
    )
    got = {(r["label"], r["pos"]): r["centroid"] for r in label_centroids(df).collect()}
    assert got == {(0, 1): 2.0, (0, 2): 4.0, (1, 1): 2.0, (1, 2): 2.0}


def _plain_vs_salted(spark, how):
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, payload string"
    )
    dim = spark.createDataFrame(
        [(1, "X"), (1, "Y"), (2, "Z")], "k long, attr string"
    )
    plain = sorted(
        tuple(r) for r in fact.join(dim, on=["k"], how=how).collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(fact, dim, on=["k"], n_salt=4, how=how).collect()
    )
    return plain, salted


def test_salted_join_matches_plain_inner(spark):
    plain, salted = _plain_vs_salted(spark, "inner")
    assert salted == plain  # duplicate keys on both sides: multiplicity kept


def test_salted_join_matches_plain_left(spark):
    plain, salted = _plain_vs_salted(spark, "left")
    assert salted == plain  # unmatched fact rows survive with NULL attr


def test_hll_sketches_merge_exactly_and_estimate_tightly(spark, sf_dir):
    """Mergeable-state law: union-of-sketches must equal
    sketch-of-union EXACTLY (same binary state), and estimates must sit
    within HLL's configured error of the exact distincts."""
    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    daily = (
        ev.select(day.alias("d"), "user_id")
        .groupBy("d")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged_est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0].e
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"),
        F.count_distinct("user_id").alias("x"),
    ).collect()[0]
    assert merged_est == direct.e  # merge == direct, bit-for-bit
    assert abs(direct.e - direct.x) <= max(2, 0.05 * direct.x)
    # per-day estimates individually tight
    rows = (
        ev.select(day.alias("d"), "user_id")
        .groupBy("d")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"),
            F.count_distinct("user_id").alias("x"),
        )
        .collect()
    )
    assert rows and all(abs(r.e - r.x) <= max(2, 0.05 * r.x) for r in rows)
