"""Property-based parity tests (hypothesis) — stronger than the
reference's hand-written asserts (SURVEY.md §5 notes it has no
property/randomized tests at all).

Each property drives the Spark expression against an independent Python
reimplementation of the REFERENCE semantics (from the reference spec, not
from this repo's code), over generated inputs. Spark round trips are
batched: one DataFrame per hypothesis example list, small example counts.
"""

from __future__ import annotations

import json
import struct

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.functions import registry as fns
from dvh_airflow_kafka_spark.sources.envelope import decode_key, json_quote

# Realistic text domain: ASCII + Nordic letters + assorted unicode
# whitespace and symbols the reference's feeds actually carry.
_TEXT = st.text(
    alphabet=st.sampled_from(
        list(
            "abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
            "æøåÆØÅ _-.,;:!?\"'\t\n\r  $%&/()[]{}"
        )
    ),
    max_size=40,
)

_SETTINGS = dict(max_examples=12, deadline=None)


def _ref_str_code(s):
    """The reference's str -> str-code, reimplemented from its spec
    (reference src/transform.py:33-46): split on whitespace, join '_',
    uppercase, Æ->A Ø->O Å->AA, strip outside [0-9A-Z_], empty->UKJENT."""
    if s is None:
        return "UKJENT"
    y = "_".join(str(s).split()).upper()
    y = y.replace("Æ", "A").replace("Ø", "O").replace("Å", "AA")
    y = "".join(ch for ch in y if ch in "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_")
    return y or "UKJENT"


@settings(**_SETTINGS)
@given(st.lists(_TEXT | st.none(), min_size=1, max_size=30))
def test_str_code_matches_reference_semantics(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "v string").select(
        "v", fns.str_to_code(F.col("v")).alias("code")
    )
    for r in df.collect():
        assert r.code == _ref_str_code(r.v), repr(r.v)


@settings(**_SETTINGS)
@given(st.lists(_TEXT | st.none(), min_size=1, max_size=30))
def test_json_quote_round_trips(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "v string").select(
        "v", json_quote(F.col("v")).alias("q")
    )
    for r in df.collect():
        if r.v is None:
            assert r.q is None
        else:
            assert r.q == json.dumps(r.v, ensure_ascii=False), repr(r.v)
            assert json.loads(r.q) == r.v


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=30,
    )
)
def test_int64_key_decode_matches_reference_unsigned(spark, values):
    # parity with the reference's int.from_bytes(x, "big") — unsigned,
    # including MSB-set keys (reference src/kafka_source.py:78)
    raw = [struct.pack(">q", v) for v in values]
    df = spark.createDataFrame([(b,) for b in raw], "key binary").select(
        decode_key(F.col("key"), "int-64").alias("d")
    )
    got = [r.d for r in df.collect()]
    assert got == [str(int.from_bytes(b, byteorder="big")) for b in raw]


@settings(max_examples=100, deadline=None)
@given(_TEXT | st.none())
def test_fuzzy_parse_never_raises_and_is_deterministic(raw):
    a = fns.fuzzy_parse_datetime(raw)
    b = fns.fuzzy_parse_datetime(raw)
    assert a == b


@settings(max_examples=25, deadline=None)
@given(
    st.binary(min_size=0, max_size=30_000),
    st.integers(min_value=4, max_value=10),
)
def test_cdc_boundaries_properties(data, mask_bits):
    """CDC chunker invariants on arbitrary bytes: boundaries are strictly
    increasing, cover the blob exactly, respect min/max (interior cuts),
    and the vectorized windowed Gear hash matches the sequential fold."""
    from dvh_airflow_kafka_spark.ext.multimodal import (
        _cdc_boundaries,
        _gear_table_low,
    )

    min_size, max_size = 16, 2048
    cuts = _cdc_boundaries(data, mask_bits, min_size, max_size)
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data)
    assert all(a < b for a, b in zip(cuts, cuts[1:]))
    start = 0
    for end in cuts:
        assert 0 < end - start <= max_size
        start = end
    # vectorized low-bits window == sequential (h<<1)+g fold
    g = _gear_table_low(mask_bits)
    mask = (1 << mask_bits) - 1
    h, seq = 0, set()
    for i, b in enumerate(data):
        h = ((h << 1) + int(g[b])) & mask
        if h == 0:
            seq.add(i + 1)
    import numpy as np

    arr = np.frombuffer(data, dtype=np.uint8)
    gv = g[arr]
    acc = np.zeros(len(arr), dtype=np.uint64)
    for j in range(min(mask_bits, len(arr))):
        acc[j:] += gv[: len(arr) - j] << np.uint64(j)
    vec = set((np.nonzero((acc & np.uint64(mask)) == 0)[0] + 1).tolist())
    assert vec == seq
