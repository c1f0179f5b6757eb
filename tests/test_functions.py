"""Scalar-function registry edge cases (reference src/transform.py:24-119)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.functions import registry as fns


def _eval1(spark, col, **data):
    df = spark.createDataFrame([data]) if data else spark.range(1)
    return df.select(col.alias("x")).collect()[0].x


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("hello world", "HELLO_WORLD"),
        ("  spaced   out  ", "SPACED_OUT"),
        ("Blåbærsyltetøy", "BLAABARSYLTETOY"),
        ("æøå ÆØÅ", "AOAA_AOAA"),
        ("!!!", "UKJENT"),
        ("", "UKJENT"),
        (None, "UKJENT"),
        ("a-b.c/d", "ABCD"),
        ("tall 123", "TALL_123"),
    ],
)
def test_str_to_code(spark, raw, expected):
    # reference src/transform.py:33-46 (DVH-standard 2.3 normalization)
    got = _eval1(spark, fns.str_to_code(F.lit(raw).cast("string")), v=0)
    assert got == expected


def test_epoch_conversions_dst(spark):
    # CET (winter, +1): 2024-01-15 00:00:00 UTC -> 01:00 Oslo
    assert _eval1(
        spark, fns.epoch_s_to_oslo(F.lit(1705276800).cast("long")), v=0
    ) == dt.datetime(2024, 1, 15, 1, 0, 0)
    # CEST (summer, +2): 2024-07-15 00:00:00 UTC -> 02:00 Oslo
    assert _eval1(
        spark, fns.epoch_s_to_oslo(F.lit(1721001600).cast("long")), v=0
    ) == dt.datetime(2024, 7, 15, 2, 0, 0)
    # ms precision preserved (reference src/transform.py:77-87)
    got = _eval1(spark, fns.epoch_ms_to_oslo(F.lit(1705276800123).cast("long")), v=0)
    assert got == dt.datetime(2024, 1, 15, 1, 0, 0, 123000)


def test_epoch_null_safe(spark):
    assert _eval1(spark, fns.epoch_s_to_oslo(F.lit(None).cast("long")), v=0) is None
    assert _eval1(spark, fns.bool_to_int(F.lit(None).cast("boolean")), v=0) is None


def test_bool_to_int(spark):
    assert _eval1(spark, fns.bool_to_int(F.lit(True)), v=0) == 1
    assert _eval1(spark, fns.bool_to_int(F.lit(False)), v=0) == 0


def test_str_to_oslo_datetime(spark):
    got = _eval1(
        spark, fns.str_to_oslo_datetime(F.lit("2024-01-15 10:30:00")), v=0
    )
    assert got == dt.datetime(2024, 1, 15, 11, 30, 0)  # +1 CET
    assert _eval1(spark, fns.str_to_oslo_datetime(F.lit("not a date")), v=0) is None
    # dd.MM.yyyy (Norwegian convention)
    got = _eval1(spark, fns.str_to_oslo_datetime(F.lit("15.01.2024")), v=0)
    assert got == dt.datetime(2024, 1, 15, 1, 0, 0)


def test_content_hash_matches_python(spark):
    import hashlib

    raw = '{"k": 1}'
    got = _eval1(spark, fns.content_hash(F.lit(raw)), v=0)
    assert got == hashlib.sha256(raw.encode()).hexdigest()


def test_registry_is_closed_and_config_addressable():
    assert set(fns.TRANSFORMS) == {
        "str -> str-code",
        "str -> datetime-no",
        "int-unix-s -> datetime-no",
        "int-unix-ms -> datetime-no",
        "bool -> int",
        "datetime -> datetime-no",
    }


def test_str_to_oslo_datetime_fuzzy_freeform(spark):
    """dateparser-grade free-form inputs (reference src/transform.py:49-60)
    resolved by the residual pandas-UDF fallback."""
    cases = {
        "March 5th 2024": dt.datetime(2024, 3, 5, 1, 0, 0),  # +1 CET
        "5 Mar 2024 14:30": dt.datetime(2024, 3, 5, 15, 30, 0),
        "March 5 2024 14:30:45": dt.datetime(2024, 3, 5, 15, 30, 45),
        "03/05/2024": dt.datetime(2024, 3, 5, 1, 0, 0),  # US month-first
        "2024 March 5": dt.datetime(2024, 3, 5, 1, 0, 0),
        "July 1st 2024": dt.datetime(2024, 7, 1, 2, 0, 0),  # +2 CEST
        "still not a date": None,
    }
    for raw, expect in cases.items():
        assert _eval1(spark, fns.str_to_oslo_datetime(F.lit(raw)), v=0) == expect, raw


def test_fuzzy_jvm_cascade_matches_python_parse(spark):
    """The round-13 optimization replaced the default F3 path's residual
    pandas UDF with a codegen twin (`_fuzzy_jvm_cascade`); pin the twin
    against the Python reference parse on the format/normalization
    matrix, including the grammar-divergence guards (5-digit year runs
    and year 0000 must fail BOTH paths)."""
    cases = [
        "March 5th 2024",
        "march 5 2024",            # lowercase month name
        "MARCH 5 2024 14:30",      # uppercase month name
        "5 Mar 2024 14:30",
        "5 mar 2024 14:30:45",
        "2024 March 5",
        "03/05/2024",
        "3/5/2024",                # non-padded month/day
        "15-01-2024",
        "July, 1st, 2024",         # commas collapse like whitespace
        "  March   5\t2024  ",     # whitespace runs
        "February 30 2024",        # invalid day -> None both
        "February 29 2023",        # non-leap -> None both
        "March 5 20244",           # 5-digit year run -> None both
        "January 1 0000",          # year 0 -> None both
        "still not a date",
        "5 days ago",              # relative needs an anchor -> None
    ]
    for raw in cases:
        py = fns.fuzzy_parse_datetime(raw)
        jvm = _eval1(spark, fns._fuzzy_jvm_cascade(F.lit(raw)), v=0)
        assert jvm == py, (raw, jvm, py)


def test_fuzzy_parse_is_deterministic_no_relative_forms():
    assert fns.fuzzy_parse_datetime("5 days ago") is None
    assert fns.fuzzy_parse_datetime(None) is None
    assert fns.fuzzy_parse_datetime("March 5th 2024") == dt.datetime(2024, 3, 5)


_ANCHOR = dt.datetime(2024, 3, 15, 12, 0, 0)  # naive UTC batch time

# dateparser's documented relative examples, pinned against _ANCHOR
_RELATIVE_TABLE = {
    "now": _ANCHOR,
    "today": _ANCHOR,
    "yesterday": dt.datetime(2024, 3, 14, 12, 0, 0),
    "tomorrow": dt.datetime(2024, 3, 16, 12, 0, 0),
    "2 days ago": dt.datetime(2024, 3, 13, 12, 0, 0),
    "1 hour ago": dt.datetime(2024, 3, 15, 11, 0, 0),
    "an hour ago": dt.datetime(2024, 3, 15, 11, 0, 0),
    "30 minutes ago": dt.datetime(2024, 3, 15, 11, 30, 0),
    "3 weeks ago": dt.datetime(2024, 2, 23, 12, 0, 0),
    "in 3 hours": dt.datetime(2024, 3, 15, 15, 0, 0),
    "In 2 Days": dt.datetime(2024, 3, 17, 12, 0, 0),  # case-insensitive
    "still not a date": None,
    "days ago": None,  # missing count never guesses
}


def test_fuzzy_parse_relative_with_anchor_matrix():
    for raw, expect in _RELATIVE_TABLE.items():
        assert fns.fuzzy_parse_datetime(raw, _ANCHOR) == expect, raw
    # fixed formats still parse identically with an anchor present
    assert fns.fuzzy_parse_datetime("March 5th 2024", _ANCHOR) == dt.datetime(
        2024, 3, 5
    )


def test_str_to_oslo_datetime_fuzzy_column_and_dsl(spark):
    """The `fuzzy: true` escape hatch end-to-end: the column factory
    resolves relative forms against the anchor (then shifts to Oslo wall
    clock, +1 CET in March), and the transform DSL wires the flag to the
    frozen batch time — twice, to prove idempotence."""
    fn = fns.str_to_oslo_datetime_fuzzy(_ANCHOR)
    assert _eval1(spark, fn(F.lit("2 days ago")), v=0) == dt.datetime(
        2024, 3, 13, 13, 0, 0
    )
    assert _eval1(spark, fn(F.lit("2024-03-05 10:00:00")), v=0) == dt.datetime(
        2024, 3, 5, 11, 0, 0
    )
    assert _eval1(spark, fn(F.lit("gibberish")), v=0) is None

    from dvh_airflow_kafka_spark.plans.transform_dsl import Transform

    t = Transform(
        [{"src": "raw", "dst": "ts", "fun": "str -> datetime-no", "fuzzy": True}],
        batch_time=_ANCHOR,
    )
    df = spark.createDataFrame([("yesterday",), ("03/05/2024",)], "raw string")
    got = {r.ts for r in t.apply(df).collect()}
    assert got == {
        dt.datetime(2024, 3, 14, 13, 0, 0),
        dt.datetime(2024, 3, 5, 1, 0, 0),
    }
    assert got == {r.ts for r in t.apply(df).collect()}  # idempotent

    import pytest as _pytest

    with _pytest.raises(ValueError, match="fuzzy"):
        Transform([{"src": "x", "dst": "y", "fun": "bool -> int", "fuzzy": True}])


def test_redact_pii_planted(spark):
    from dvh_airflow_kafka_spark.ext.text import pii_counts, redact_pii

    rows = [
        (1, "mail me at jane.doe+x@sub.example.co.uk today"),
        (2, "call +47 22 33 44 55 or write a.b@c.io and x@y.org"),
        (3, "no pii here, just text with @ sign and 12 34 numbers"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    counts = pii_counts(F.col("t"))
    got = {
        r.id: (r.red, r.ne, r.np)
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            counts["<EMAIL>"].alias("ne"),
            counts["<PHONE>"].alias("np"),
        ).collect()
    }
    assert got[1] == ("mail me at <EMAIL> today", 1, 0)
    assert got[2] == ("call <PHONE> or write <EMAIL> and <EMAIL>", 2, 1)
    assert got[3] == (rows[2][1], 0, 0)  # untouched
    assert got[4][0] is None
