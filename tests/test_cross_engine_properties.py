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


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=30),
    st.integers(min_value=4, max_value=64),
)
def test_sequence_pack_span_arithmetic(spark, sizes, L):
    """Property: concat-and-split spans tile [0, total) exactly — every
    token lands in exactly one (doc, seq) span, spans are gapless within
    a sequence, and per-doc span lengths reconstruct the doc."""
    from dvh_airflow_kafka_spark.ext.sampling import with_prefix_sum

    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n long").filter("n > 0")
    pre = with_prefix_sum(df, "doc_id", F.col("n"))
    got = {r.doc_id: (r.size, r.before) for r in pre.collect()}
    cum = 0
    for doc_id, n in rows:
        if n == 0:
            assert doc_id not in got
            continue
        assert got[doc_id] == (n, cum)
        cum += n
    # span arithmetic (pure python mirror of the catalog expression)
    total = cum
    seen_tokens = 0
    for doc_id, n in rows:
        if n == 0:
            continue
        before = got[doc_id][1]
        end = before + n
        for seq in range(before // L, (end - 1) // L + 1):
            lo, hi = max(before, seq * L), min(end, (seq + 1) * L)
            assert lo < hi
            seen_tokens += hi - lo
    assert seen_tokens == total


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=12))
def test_chunk_windows_reconstruct_tokens(spark, texts):
    """Property: stride-S chunks cover every token; adjacent chunks
    overlap by C-S; joining chunk 0's prefix with each chunk's tail
    reconstructs the document's token stream."""
    from dvh_airflow_kafka_spark.catalog import (
        _CHUNK_LEN as C,
        _CHUNK_STRIDE as S,
    )
    from dvh_airflow_kafka_spark.ext.text import tokens as tok_col

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {
        r.doc_id: r.w
        for r in df.select("doc_id", tok_col(F.col("text")).alias("w")).collect()
    }
    chunked = df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.when(F.size(tok_col(F.col("text"))) <= C, F.lit(0))
                    .otherwise(
                        F.ceil(
                            (F.size(tok_col(F.col("text"))) - C) / F.lit(float(S))
                        )
                    )
                    .cast("int"),
                ),
                lambda i: F.slice(tok_col(F.col("text")), i * S + 1, C),
            )
        ).alias("idx", "chunk"),
    ).collect()
    by_doc: dict[int, list] = {}
    for r in chunked:
        by_doc.setdefault(r.doc_id, []).append((r.idx, r.chunk))
    for doc_id, w in toks.items():
        chunks = [c for _, c in sorted(by_doc[doc_id])]
        assert chunks[0] == w[:C]
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            rebuilt.extend(c[C - S :] if len(c) > C - S else [])
        # chunk starts step by S; the final chunk reaches the end
        assert rebuilt == w or (not w and rebuilt == [])


def test_levenshtein_unicode_divergence_pinned(spark):
    """KNOWN cross-engine divergence, pinned: DuckDB's levenshtein is
    BYTE-level (UTF-8), Spark's is codepoint-level — 'æ' is distance 1
    from '' in Spark but 2 in DuckDB. The fuzzy-join oracle therefore
    only holds on ASCII text (byte == codepoint), which the catalog
    query documents; Spark's codepoint semantics is the one a user
    should rely on for unicode corpora."""
    df = spark.createDataFrame([("", "æ")], "a string, b string")
    spark_d = df.select(F.levenshtein("a", "b").alias("d")).collect()[0].d
    duck_d = duckdb.connect().execute("SELECT levenshtein('', 'æ')").fetchone()[0]
    assert spark_d == 1 and duck_d == 2


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=list("abc 0"), max_size=12),
            st.text(alphabet=list("abc 0"), max_size=12),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_levenshtein_matches_duckdb(spark, pairs):
    """On ASCII text (byte == codepoint) the fuzzy-join verifier must
    mean the same thing in both engines."""
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", F.levenshtein(F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for i, a, b in rows
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(10**12), max_value=10**12),
            st.none(),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_variant_int_extraction_matches_duckdb_json(spark, vals):
    """Spark's VARIANT path extraction and DuckDB's JSON extraction must
    agree on integer fields (including null/missing)."""
    import json as _json

    rows = [
        (i, _json.dumps({"k": v} if v is not None else {}))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "i long, j string")
    got = {
        r["i"]: r["k"]
        for r in df.select(
            "i",
            F.variant_get(F.parse_json(F.col("j")), "$.k", "long").alias("k"),
        ).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.execute(
            "SELECT CAST(json_extract_string(?, '$.k') AS BIGINT)", [j]
        ).fetchone()[0]
        for i, j in rows
    }
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=8),
    k=st.sampled_from([0.5, 1.0, 2.0, 8.0, 100.0]),
)
def test_temperature_threshold_matches_duckdb(counts, k):
    """The temperature-mixture hex threshold — min(k/√c, 1) → floor·2³² →
    8-hex — must be BIT-IDENTICAL between Python (Spark driver side) and
    DuckDB (oracle side) for any count. Holds because ÷ and √ are
    correctly rounded under IEEE-754 in both; this is the reason α is
    pinned to 0.5 (a general pow is only faithfully rounded)."""
    import math

    from dvh_airflow_kafka_spark.ext.sampling import _hex_threshold

    con = duckdb.connect()
    for c in counts:
        py = _hex_threshold(min(k / math.sqrt(c), 1.0))
        # the CASE mirrors the oracle SQL in catalog.py: a capped fraction
        # of exactly 1.0 means "keep everything" -> sentinel 'g' above any
        # hex prefix (strict '<' against 'ffffffff' would drop p≈2⁻³² rows)
        (dk,) = con.execute(
            f"""SELECT CASE
                    WHEN {k!r} / sqrt(CAST({c} AS DOUBLE)) >= 1.0 THEN 'g'
                    ELSE lower(lpad(to_hex(CAST(least(
                        floor({k!r} / sqrt(CAST({c} AS DOUBLE)) * 4294967296.0),
                        4294967295.0) AS BIGINT)), 8, '0'))
                END"""
        ).fetchone()
        assert py == dk, (c, k, py, dk)
    con.close()


def test_oslo_dst_transition_parity(spark):
    """Pin the documented timezone semantics (functions/registry.py): the
    engine maps UTC instants to naive Oslo wall clocks by IANA rules.
    UTC→local is total and unambiguous even across both 2025 DST
    transitions; Spark's from_utc_timestamp, DuckDB's double AT TIME
    ZONE, and Python zoneinfo must agree instant-for-instant, including
    the skipped spring hour and the doubled fall-back wall clock. (The
    reference's pytz is_dst=True resolution differs by at most one hour
    ONLY in its local→local re-resolution path — disclosed, not
    replicated.)"""
    import datetime as dt
    from zoneinfo import ZoneInfo

    from pyspark.sql import functions as F

    instants = [
        # spring forward (2025-03-30 01:00 UTC: 02:00→03:00 CEST)
        dt.datetime(2025, 3, 30, 0, 0),
        dt.datetime(2025, 3, 30, 0, 59, 59),
        dt.datetime(2025, 3, 30, 1, 0),
        dt.datetime(2025, 3, 30, 1, 30),
        # fall back (2025-10-26 01:00 UTC: 03:00→02:00 CET)
        dt.datetime(2025, 10, 26, 0, 30),  # 02:30 CEST (first 02:30)
        dt.datetime(2025, 10, 26, 1, 0),
        dt.datetime(2025, 10, 26, 1, 30),  # 02:30 CET (second 02:30)
        dt.datetime(2025, 10, 26, 2, 0),
    ]
    df = spark.createDataFrame([(t,) for t in instants], "ts timestamp_ntz")
    got = [
        r.oslo
        for r in df.select(
            F.from_utc_timestamp(F.col("ts").cast("timestamp"), "Europe/Oslo").alias(
                "oslo"
            )
        ).collect()
    ]
    oslo = ZoneInfo("Europe/Oslo")
    want = [
        t.replace(tzinfo=dt.timezone.utc).astimezone(oslo).replace(tzinfo=None)
        for t in instants
    ]
    assert got == want
    con = duckdb.connect()
    for t, w in zip(instants, want):
        (d,) = con.execute(
            "SELECT CAST(TIMESTAMP '" + t.isoformat(sep=" ") + "' "
            "AT TIME ZONE 'UTC' AT TIME ZONE 'Europe/Oslo' AS TIMESTAMP)"
        ).fetchone()
        assert d == w, (t, d, w)
    con.close()
    # the doubled wall clock really is doubled: two distinct instants map
    # to the same naive 02:30
    assert want[4] == want[6] == dt.datetime(2025, 10, 26, 2, 30)
    # the skipped hour really is skipped: nothing maps into [02:00, 03:00)
    assert not any(
        dt.datetime(2025, 3, 30, 2, 0) <= w < dt.datetime(2025, 3, 30, 3, 0)
        for w in want
    )
