"""Transform-DSL laws (reference src/transform.py; spec
src/development/test_transform.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.plans import Transform

BT = dt.datetime(2025, 6, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def payload_df(spark):
    return spark.createDataFrame(
        [
            Row(a=Row(b="x", n=7), flat="keep", ts_s=1700000000),
            Row(a=Row(b=None, n=None), flat="other", ts_s=None),
        ]
    )


def test_keypath_literal_and_batch_time(payload_df):
    t = Transform(
        [
            {"src": "a.b", "dst": "ab"},
            {"src": "$LITERAL", "dst": "lit_col"},
            {"src": "$$BATCH_TIME", "dst": "lastet_tid"},
        ],
        batch_time=BT,
    )
    rows = t.apply(payload_df).collect()
    assert rows[0].ab == "x" and rows[1].ab is None
    assert {r.lit_col for r in rows} == {"LITERAL"}
    # law 3: one constant batch time per run, frozen at construction
    assert {r.lastet_tid for r in rows} == {BT}


def test_batch_time_frozen_per_instance(payload_df):
    t1 = Transform([{"src": "$$BATCH_TIME", "dst": "bt"}])
    first = t1.apply(payload_df).collect()[0].bt
    second = t1.apply(payload_df).collect()[0].bt
    assert first == second  # re-application does not re-freeze


def test_missing_path_raises_unless_allow_undefined(payload_df):
    with pytest.raises(KeyError):
        Transform([{"src": "no.such.path", "dst": "x"}]).apply(payload_df)
    out = Transform(
        [{"src": "no.such.path", "dst": "x", "allow-undefined": True}]
    ).apply(payload_df)
    assert [r.x for r in out.collect()] == [None, None]


def test_fun_applied_only_on_keypath_branch(payload_df):
    # literals bypass `fun` (reference quirk, src/transform.py:168-195)
    t = Transform(
        [
            {"src": "ts_s", "dst": "oslo", "fun": "int-unix-s -> datetime-no"},
            {"src": "$2021-01-01", "dst": "raw_lit", "fun": "str -> datetime-no"},
        ],
        batch_time=BT,
    )
    rows = t.apply(payload_df).collect()
    # 2023-11-14 22:13:20 UTC -> 23:13:20 Oslo (CET, +1)
    assert rows[0].oslo == dt.datetime(2023, 11, 14, 23, 13, 20)
    assert rows[0].raw_lit == "2021-01-01"  # stayed a string


def test_unknown_fun_and_identifier_rejected():
    with pytest.raises(KeyError):
        Transform([{"src": "a", "dst": "x", "fun": "no-such-fun"}])
    with pytest.raises(NotImplementedError):
        Transform([{"src": "$$NOPE", "dst": "x"}])


def test_rule_order_defines_output_columns(payload_df):
    t = Transform(
        [{"src": "flat", "dst": "z_last"}, {"src": "a.n", "dst": "a_first"}],
        batch_time=BT,
    )
    assert t.apply(payload_df).columns == ["z_last", "a_first"]
