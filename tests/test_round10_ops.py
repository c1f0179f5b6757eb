"""Round-10 operators: the Misra-Gries streaming twin's laws, the Unicode
normalization kernel, and the composition capstones' internal invariants
(the cross-engine value hashes live in the driver gate / run_compare)."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.catalog import REGISTRY
from dvh_airflow_kafka_spark.ext.sketch import _mg_feed
from dvh_airflow_kafka_spark.ext.text import unicode_normalize_udf


# ------------------------------------------------------------------ MG laws
def _freqs(texts):
    out: dict[str, int] = {}
    for t in texts:
        for tok in t.split():
            out[tok] = out.get(tok, 0) + 1
    return out


def test_mg_feed_retains_every_heavy_hitter():
    # adversarial mix: one dominant token, a mid token, and a long tail of
    # singletons that forces constant decrement churn at k=4
    texts = ["hot " * 40 + "warm " * 12] + [f"tail{i}" for i in range(60)]
    k = 4
    counters: dict[str, int] = {}
    _mg_feed(counters, texts, k)
    assert len(counters) <= k
    n = sum(_freqs(texts).values())
    for tok, c in _freqs(texts).items():
        if c > n / k:
            assert tok in counters, (tok, c, n, counters)


def test_mg_feed_chunked_equals_single_pass():
    # the streaming-state law: resuming the counters across chunk
    # boundaries is EXACTLY one pass over the concatenation
    texts = [f"a b c d{i % 7} e{i % 3} a" for i in range(50)]
    one: dict[str, int] = {}
    _mg_feed(one, texts, 5)
    chunked: dict[str, int] = {}
    for lo in range(0, 50, 9):
        _mg_feed(chunked, texts[lo : lo + 9], 5)
    assert one == chunked


def test_streaming_mg_matches_batch_twin_and_bounds_emissions(spark, sf_dir):
    batch = (
        REGISTRY["frequent_tokens_bounded_state"].fn(spark, sf_dir).collect()
    )
    stream = REGISTRY["streaming_frequent_tokens"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
    assert len(batch) > 0


def test_streaming_hll_matches_batch_twin(spark, sf_dir):
    batch = REGISTRY["hll_register_distinct"].fn(spark, sf_dir).collect()
    stream = REGISTRY["streaming_hll_registers"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
    assert len(batch) > 0


def test_streaming_kmv_matches_batch_twin(spark, sf_dir):
    batch = REGISTRY["theta_sketch_overlap"].fn(spark, sf_dir).collect()
    stream = REGISTRY["streaming_kmv_minima"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
    assert len(batch) > 0


def test_kmv_updater_chunked_equals_single_pass():
    # the streaming-state law: k-min-of-union resumed across batch
    # boundaries telescopes to the k-min over the concatenation — and a
    # hash discarded in an early batch never re-enters
    import pandas as pd

    from dvh_airflow_kafka_spark.streaming.stateful import _make_kmv_updater

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    hashes = [((h * 2654435761) % 997) for h in range(300)]  # dups included
    k = 16
    expect = sorted(set(hashes))[:k]

    upd = _make_kmv_updater(k)
    one = FakeState()
    list(upd(("g",), iter([pd.DataFrame({"h": hashes})]), one))
    chunked = FakeState()
    for lo in range(0, 300, 37):
        out = list(
            upd(("g",), iter([pd.DataFrame({"h": hashes[lo : lo + 37]})]), chunked)
        )
        assert len(out) == 1 and len(out[0]) == 1  # one snapshot row/batch
        assert len(out[0]["kmins"][0]) <= k
    assert one._v[1] == chunked._v[1] == expect
    # seq is the per-batch monotone snapshot counter the reader keys on
    assert chunked._v[0] == len(range(0, 300, 37)) and one._v[0] == 1


def test_streaming_bloom_matches_batch_twin_and_bits_law(spark, sf_dir):
    # result-level twin law: the streaming-bits readout reproduces the
    # batch Bloom dedup exactly
    batch = REGISTRY["bloom_dedup_insert"].fn(spark, sf_dir).collect()
    stream = REGISTRY["streaming_bloom_bits"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
    assert len(batch) > 0
    # bits-level twin law: the DRAINED streaming state snapshot equals
    # the batch build_bloom frame EXACTLY (not just any superset — extra
    # set bits would be invisible to the result-level check above, since
    # they only shrink the fast path)
    from dvh_airflow_kafka_spark.catalog.q12_round10 import _bloom_bits_snapshot
    from dvh_airflow_kafka_spark.ext.bloom import build_bloom
    from dvh_airflow_kafka_spark.io import load_table

    sink = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 0)
        .select("event_id")
    )
    key = F.concat_ws("\x1f", F.col("event_id").cast("string"))
    batch_bits = {r["pos"] for r in build_bloom(sink, key).collect()}
    stream_bits = {
        r["pos"] for r in _bloom_bits_snapshot(spark, sf_dir).collect()
    }
    assert stream_bits == batch_bits
    assert len(batch_bits) > 0


def test_curation_funnel_monotone_attrition(spark, sf_dir):
    from dvh_airflow_kafka_spark.io import load_table

    from dvh_airflow_kafka_spark.ext.text import token_count_ws

    rows = REGISTRY["curation_funnel_attrition"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    raw = {
        (r["source"],): (r["n"], r["t"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(token_count_ws(F.col("text"))).alias("t"),
        )
        .collect()
    }
    by_src: dict[str, dict[int, tuple]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[int(r["stage"])] = (
            r["n_docs"],
            r["n_tokens"],
        )
    assert by_src
    for src, stages in by_src.items():
        # stage 0 covers the whole per-source corpus (docs AND tokens)
        assert stages[0][0] == raw[(src,)][0], (src, stages)
        assert stages[0][1] == raw[(src,)][1], (src, stages)
        # docs and tokens are monotonically non-increasing in stage
        for s in range(1, 4):
            prev = stages.get(s - 1, (0, 0))
            cur = stages.get(s, (0, 0))
            assert cur[0] <= prev[0] and cur[1] <= prev[1], (src, stages)


def test_mg_updater_emits_at_most_k_per_shard_per_batch():
    # drive the applyInPandasWithState updater directly with a fake state
    import pandas as pd

    from dvh_airflow_kafka_spark.streaming.stateful import _make_mg_updater

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    upd = _make_mg_updater(8)
    state = FakeState()
    texts = pd.DataFrame({"text": [f"t{i} t{i} common" for i in range(100)]})
    out = list(upd((3,), iter([texts]), state))
    assert len(out) == 1 and len(out[0]) <= 8
    toks, counts = state._v
    assert len(toks) <= 8 and len(toks) == len(counts)
    # resume: feeding more data through the SAME state keeps the bound
    out2 = list(upd((3,), iter([texts]), state))
    assert len(out2[0]) <= 8


# ------------------------------------------------------- unicode normalize
def test_unicode_normalize_udf_matches_unicodedata(spark):
    rows = [
        ("café",),  # decomposed é
        ("ﬁsh ½",),  # ligature fi + vulgar half
        ("plain ascii",),
        ("",),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = df.select(
        unicode_normalize_udf("NFC")(F.col("t")).alias("nfc"),
        unicode_normalize_udf("NFKC")(F.col("t")).alias("nfkc"),
    ).collect()
    for (t,), r in zip(rows, got):
        assert r["nfc"] == unicodedata.normalize("NFC", t)
        assert r["nfkc"] == unicodedata.normalize("NFKC", t)


def test_unicode_normalize_udf_rejects_bad_form():
    with pytest.raises(ValueError):
        unicode_normalize_udf("NFX")


def test_nfc_audit_classes(spark, sf_dir):
    rows = REGISTRY["unicode_nfc_audit"].fn(spark, sf_dir).collect()
    by_class: dict[int, list] = {}
    for r in rows:
        by_class.setdefault(int(r["inject_class"]), []).append(r)
    # class 0 (decomposed accents): NFC composes -> chars saved > 0 where
    # any 'e' existed; NFKC agrees with NFC here (canonical composition)
    for r in by_class[0]:
        assert r["nfc_chars_saved"] >= 0
        assert r["nfkc_chars_delta"] == -r["nfc_chars_saved"]
    # class 1 (fi ligature): NFC-stable, NFKC expands
    for r in by_class[1]:
        assert r["nfc_drift_docs"] == 0 and r["nfc_chars_saved"] == 0
        assert r["nfkc_chars_delta"] >= 0
    # class 2 (clean ASCII): nothing moves under either form
    for r in by_class[2]:
        assert r["nfc_drift_docs"] == 0 and r["nfkc_drift_docs"] == 0
        assert r["nfc_chars_saved"] == 0 and r["nfkc_chars_delta"] == 0


# ------------------------------------------------------------- capstones
def test_neardup_pipeline_partitions_the_corpus(spark, sf_dir):
    from dvh_airflow_kafka_spark.io import load_table

    out = REGISTRY["neardup_survivor_pipeline"].fn(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = out.collect()
    # one row per original document, exactly one survivor per cluster
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    clusters: dict[int, int] = {}
    for r in rows:
        clusters[r["cluster_id"]] = clusters.get(r["cluster_id"], 0) + r[
            "survivor"
        ]
        if not r["survivor"]:
            # dropped members lose everything
            assert r["n_removed"] == r["n_tokens"]
        assert 0 <= r["n_removed"] <= r["n_tokens"]
    assert all(v == 1 for v in clusters.values()), clusters


def test_decontamination_accounting(spark, sf_dir):
    rows = REGISTRY["decontamination_capstone"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_removed"] + r["n_kept"] == r["n_train"]
        assert 0 <= r["tokens_removed"] <= r["train_tokens"]
