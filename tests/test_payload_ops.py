"""P1/P2/P3 payload operators, incl. array-broadcast keypath semantics
(reference src/kafka_source.py:84-100; spec test_integration.py:269-342)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dvh_airflow_kafka_spark.config import AllowRule
from dvh_airflow_kafka_spark.operators.payload import (
    drop_fields,
    filter_json_payload,
    flag_fields,
    python_canonical_json,
)
from dvh_airflow_kafka_spark.sources.envelope import allow_filter_condition

NESTED = {
    "keep": "v",
    "secret": "x",
    "nested": {"flagme": "data", "other": 1},
    "arr": [{"secret": "a", "ok": 1}, {"secret": "b", "ok": 2}],
}


@pytest.fixture(scope="module")
def typed_df(spark):
    schema = T.StructType(
        [
            T.StructField("keep", T.StringType()),
            T.StructField("secret", T.StringType()),
            T.StructField(
                "nested",
                T.StructType(
                    [
                        T.StructField("flagme", T.StringType()),
                        T.StructField("other", T.LongType()),
                    ]
                ),
            ),
            T.StructField(
                "arr",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("secret", T.StringType()),
                            T.StructField("ok", T.LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame([(NESTED,)], T.StructType([T.StructField("p", schema)]))
    return df, schema


def test_drop_fields_top_nested_and_in_arrays(typed_df):
    df, schema = typed_df
    out = df.select(
        drop_fields(F.col("p"), schema, ["secret", "arr/secret"]).alias("p")
    ).collect()[0].p.asDict(recursive=True)
    assert "secret" not in out
    assert out["keep"] == "v" and out["nested"]["other"] == 1
    # [i]-stripped matching: dropped from EVERY array element
    assert out["arr"] == [{"ok": 1}, {"ok": 2}]


def test_flag_fields_presence(typed_df):
    df, schema = typed_df
    out = df.select(
        flag_fields(F.col("p"), schema, ["nested/flagme", "arr/secret"]).alias("p")
    ).collect()[0].p.asDict(recursive=True)
    assert out["nested"]["flagme"] == 1  # non-null -> 1
    assert [e["secret"] for e in out["arr"]] == [1, 1]


def test_dynamic_json_filter_matches_reference_walk(spark):
    raw = json.dumps(NESTED, ensure_ascii=False)
    df = spark.createDataFrame([(raw,), (None,)], "payload string")
    out = df.select(
        filter_json_payload(
            F.col("payload"), ["secret", "arr/secret"], ["nested/flagme"]
        ).alias("m")
    ).collect()
    got = json.loads(out[0].m)
    assert "secret" not in got
    assert got["nested"]["flagme"] == 1
    assert got["arr"] == [{"ok": 1}, {"ok": 2}]
    assert out[1].m is None  # null payload stays null


def test_python_canonical_json_byte_parity(spark):
    # key order preserved, ensure_ascii=False, ", "/": " separators
    raw = '{"b": 1,"a":  "blåbær"}'
    df = spark.createDataFrame([(raw,)], "payload string")
    got = df.select(python_canonical_json(F.col("payload")).alias("m")).collect()[0].m
    assert got == json.dumps(json.loads(raw), ensure_ascii=False)
    assert '"blåbær"' in got


def test_allow_filter_nulls_payload_keeps_row(spark):
    df = spark.createDataFrame(
        [('{"t": "keep"}',), ('{"t": "drop"}',), (None,)], "payload string"
    )
    keep = allow_filter_condition(F.col("payload"), [AllowRule(key="t", allowed_value="keep")])
    out = df.select(
        F.when(keep, F.col("payload")).otherwise(F.lit(None)).alias("m")
    ).collect()
    assert [r.m for r in out] == ['{"t": "keep"}', None, None]
    assert len(out) == 3  # law 6: rows are never dropped
