"""Property-based CROSS-ENGINE parity (hypothesis + in-process DuckDB):
the catalog's oracle discipline depends on a handful of primitive
expressions meaning exactly the same thing in Spark and DuckDB —
tokenization, sha-prefix bucketing, content normalization, NTILE
arithmetic. These drive each primitive over generated adversarial
inputs (unicode whitespace, empties, Nordic letters) against a live
DuckDB instead of trusting the fixture to exercise the edge."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext.ranking import ntile_from_rank
from dvh_airflow_kafka_spark.ext.sampling import (
    split_bucket,
    sql_bucket_predicate,
)
from dvh_airflow_kafka_spark.ext.text import fingerprint, tokens

_SETTINGS = dict(max_examples=10, deadline=None)

# Adversarial text: letters, digits, ASCII + exotic whitespace, Nordic
# chars, punctuation. NBSP (\xa0) is deliberately included — it is NOT
# \s in either engine's regex dialect, so it must tokenize as content.
_TEXT = st.text(
    alphabet=st.sampled_from(list("ab zæøå09 \t\n\r.,!?-_\xa0")),
    max_size=30,
)


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_token_count_matches_duckdb(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", F.size(tokens(F.col("t"))).alias("n")).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.execute(
            r"SELECT len(regexp_extract_all(?, '\S+'))", [t]
        ).fetchone()[0]
        for i, t in rows
    }
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_fingerprint_matches_duckdb(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["f"]
        for r in df.select("i", fingerprint(F.col("t")).alias("f")).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.execute(
            "SELECT sha256(regexp_replace(lower(?), '[^a-z0-9]', '', 'g'))",
            [t],
        ).fetchone()[0]
        for i, t in rows
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=25),
    st.floats(min_value=0.05, max_value=0.95),
)
def test_bucket_predicate_matches_duckdb(spark, keys, frac):
    rows = [(k,) for k in set(keys)]
    df = spark.createDataFrame(rows, "k long")
    from dvh_airflow_kafka_spark.ext.sampling import _hex_threshold

    thr = _hex_threshold(frac)
    got = {
        r["k"]
        for r in df.filter(
            split_bucket(F.col("k"), "pv1") < F.lit(thr)
        ).collect()
    }
    con = duckdb.connect()
    want = {
        k
        for (k,) in rows
        if con.execute(
            f"SELECT {sql_bucket_predicate('?', frac, 'pv1')}", [k]
        ).fetchone()[0]
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1, max_value=20),
)
def test_ntile_arithmetic_matches_duckdb(spark, total, tiles):
    df = spark.range(1, total + 1).withColumnRenamed("id", "k")
    got = {
        r["k"]: r["t"]
        for r in df.select(
            "k", ntile_from_rank(F.col("k"), total, tiles).alias("t")
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT k, NTILE({tiles}) OVER (ORDER BY k) FROM range(1, {total + 1}) t(k)"
        ).fetchall()
    )
    assert got == want
