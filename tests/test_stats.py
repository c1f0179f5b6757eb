"""Laws for ext/stats (order statistics by counting) and containment
pairs — pinned against numpy/direct computation on seeded data, so the
kernels hold independently of the catalog oracles that also exercise
them."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext import stats as xstats
from dvh_airflow_kafka_spark.ext.dedup import ngram_containment_pairs


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def seeded_values(spark):
    rng = random.Random(4242)
    rows = [
        (k, rng.randint(0, 500))
        for k in ("a", "b", "c")
        for _ in range(rng.randint(30, 200))
    ]
    return rows


def test_keyed_median_matches_numpy(spark, seeded_values):
    df = _df(spark, seeded_values, "k string, v long")
    got = {
        r["k"]: r["m"]
        for r in xstats.keyed_median(df, "k", "v", "m").collect()
    }
    for k in ("a", "b", "c"):
        vals = [v for kk, v in seeded_values if kk == k]
        assert got[k] == float(np.median(vals)), k


def test_keyed_values_at_ranks_matches_sorted_indexing(spark, seeded_values):
    df = _df(spark, seeded_values, "k string, v long")
    got = {
        r["k"]: (r["lo"], r["hi"], r["n"])
        for r in xstats.keyed_values_at_ranks(
            df,
            "k",
            "v",
            {"lo": "(5 * __n + 99) div 100", "hi": "__n - (5 * __n + 99) div 100 + 1"},
            with_total="n",
        ).collect()
    }
    for k in ("a", "b", "c"):
        vals = sorted(v for kk, v in seeded_values if kk == k)
        n = len(vals)
        r_lo = (5 * n + 99) // 100
        assert got[k] == (vals[r_lo - 1], vals[n - r_lo], n), k


def test_keyed_median_mad_matches_numpy(spark, seeded_values):
    df = _df(spark, seeded_values, "k string, v long")
    got = {
        r["k"]: (r["med"], r["mad"])
        for r in xstats.keyed_median_mad(df, "k", "v", "med", "mad").collect()
    }
    for k in ("a", "b", "c"):
        vals = np.array([v for kk, v in seeded_values if kk == k], dtype=float)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        assert got[k] == (med, mad), k


def test_median_mad_robust_to_planted_whale(spark):
    """The 50% breakdown point in action: one planted 10⁹ outlier moves
    a mean/σ pair arbitrarily but leaves median and MAD unchanged."""
    base = [("k", v) for v in range(1, 102)]  # 1..101, median 51, MAD 25
    clean = xstats.keyed_median_mad(
        _df(spark, base, "k string, v long"), "k", "v", "med", "mad"
    ).collect()[0]
    spiked = xstats.keyed_median_mad(
        _df(spark, base + [("k", 10**9)], "k string, v long"),
        "k",
        "v",
        "med",
        "mad",
    ).collect()[0]
    assert (clean["med"], clean["mad"]) == (51.0, 25.0)
    assert spiked["med"] == 51.5  # shifts half a step, not 10⁷
    assert spiked["mad"] == 25.5


def test_ks_identical_samples_is_zero_and_split_detects(spark):
    rows = [("k", v % 97, v % 2 == 0) for v in range(2000)]
    df = _df(spark, rows, "k string, v long, early boolean")
    r = xstats.keyed_ks_two_sample(df, "k", "v", "early").collect()[0]
    # alternating assignment → both sides see the same distribution
    assert r["ks_stat"] <= 0.01
    # disjoint supports → D = 1 exactly
    rows2 = [("k", v, v < 500) for v in range(1000)]
    df2 = _df(spark, rows2, "k string, v long, early boolean")
    r2 = xstats.keyed_ks_two_sample(df2, "k", "v", "early").collect()[0]
    assert r2["ks_stat"] == 1.0
    assert r2["ks_num"] == r2["n_a"] * r2["n_b"]


def test_containment_superset_scores_one(spark):
    """A document pasted verbatim inside a longer one has containment
    exactly 1.0 in the short→long direction even though Jaccard is low."""
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = _df(spark, [(1, short), (2, long)], "doc_id long, text string")
    rows = ngram_containment_pairs(
        df, "doc_id", "text", ngram=3, threshold=0.5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a"] == 1.0
    assert r["containment_b"] < 0.2


def test_containment_symmetric_on_equal_docs(spark):
    text = "one two three four five six seven"
    df = _df(spark, [(1, text), (2, text)], "doc_id long, text string")
    r = ngram_containment_pairs(df, "doc_id", "text", threshold=0.9).collect()[0]
    assert r["containment_a"] == 1.0 and r["containment_b"] == 1.0
