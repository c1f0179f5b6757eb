"""Round-9 operator laws: the guarantees the new queries are sold on,
pinned on synthetic and real inputs (the hash-certified driver rows
prove cross-engine equality; these prove the SEMANTICS)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.catalog import (
    _DDSKETCH_QS,
    _WINNOW_K,
    _WINNOW_W,
    REGISTRY,
)
from dvh_airflow_kafka_spark.io import load_table


def _stage_documents(spark, tmp_path, rows):
    """Write a synthetic documents table the catalog queries can read."""
    (
        spark.createDataFrame(
            [
                (i, text, "en", f"src{i % 3}", len(text))
                for i, text in enumerate(rows)
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        .coalesce(1)
        .write.parquet(f"{tmp_path}/documents.parquet")
    )
    return str(tmp_path)


def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(
    spark, tmp_path
):
    """The winnowing theorem (Schleimer et al. 2003): two documents
    sharing a token run of length ≥ k + w − 1 select at least one
    common fingerprint from inside the run — so the planted pair MUST
    surface, and an unrelated pair must not."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
             "lam mu nu xi omicron pi rho sigma tau upsilon"
    rows = [
        "one two three four five six seven " + shared + " end0 stop0",
        "red green blue cyan violet umber ochre " + shared + " end1 stop1",
        # controls: no shared >= k+w-1 run with anything
        "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt",
        "zz yy xx ww vv uu qq2 rr2 ss2 tt2 a1 b1 c1 d1 e1 f1 g1 h1 i1 j1",
    ]
    assert len(shared.split()) >= _WINNOW_K + _WINNOW_W - 1
    sf_dir = _stage_documents(spark, tmp_path, rows)
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in REGISTRY["winnowing_fingerprint_pairs"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert (0, 1) in pairs  # the planted pair
    assert pairs[(0, 1)] >= 2
    for bad in ((0, 2), (1, 3), (2, 3)):
        assert bad not in pairs


def test_passage_dedup_counts_planted_boilerplate(spark, tmp_path):
    """A 10-token window duplicated verbatim across two docs is counted
    for both, and a unique doc reports zero dup windows."""
    boiler = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        boiler + " u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",
        boiler + " v1 v2 v3 v4 v5 v6 v7 v8 v9 v10",
        "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 y1 y2 y3 y4 y5 y6 y7 y8 y9 y10",
    ]
    sf_dir = _stage_documents(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in REGISTRY["passage_window_dedup"].fn(spark, sf_dir).collect()
    }
    assert got[0] == (2, 1) and got[1] == (2, 1)
    assert got[2] == (2, 0)


def test_ddsketch_quantile_bounds_vs_exact(spark, sf_dir):
    """The sketch's reported bucket upper bound brackets the exact
    percentile: hi ≥ exact, and hi ≤ exact · (1 + 1/16) + 1 (one
    sub-bucket of relative width, +1 for integer truncation)."""
    rows = REGISTRY["ddsketch_value_quantiles"].fn(spark, sf_dir).collect()
    vals = np.array(
        [
            int(np.floor(r.value * 1_000_000 + 0.5))
            for r in load_table(spark, sf_dir, "events")
            .select("value")
            .collect()
        ],
        dtype=np.int64,
    )
    assert rows and {r.q_pct for r in rows} == set(_DDSKETCH_QS)
    for r in rows:
        # exact rank-percentile over this event_type's values
        sub = np.sort(
            np.array(
                [
                    int(np.floor(v * 1_000_000 + 0.5))
                    for (v,) in load_table(spark, sf_dir, "events")
                    .filter(F.col("event_type") == r.event_type)
                    .select("value")
                    .collect()
                ],
                dtype=np.int64,
            )
        )
        rank = -(-r.q_pct * len(sub) // 100)  # ceil
        exact = int(sub[rank - 1])
        assert r.value_micro_hi >= exact, (r, exact)
        assert r.value_micro_hi <= exact + exact // 16 + 1, (r, exact)
    assert vals.min() >= 1  # the vm >= 1 guard drops nothing on this data


def test_sign_codes_match_numpy_bits(spark, sf_dir):
    from dvh_airflow_kafka_spark.ext import similarity as xsim

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    got = {
        r.vec_id: (r.code_lo, r.code_hi)
        for r in xsim.sign_codes(emb).collect()
    }
    for r in emb.collect():
        e = np.asarray(r.embedding, dtype=np.float64)
        lo = sum(1 << i for i in range(32) if e[i] > 0)
        hi = sum(1 << (i - 32) for i in range(32, 64) if e[i] > 0)
        assert got[r.vec_id] == (lo, hi)


def test_maxsim_scores_bounded_and_deterministic(spark, sf_dir):
    rows = REGISTRY["multi_vector_maxsim"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 8 query tokens, each max-cosine in [-1, 1] micro-units
        assert -8_000_000 <= r.score_micro <= 8_000_000
        assert r.cand_group != r.query_group
    again = REGISTRY["multi_vector_maxsim"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_streaming_ddsketch_equals_batch_sketch(spark, sf_dir):
    """Mergeability, engine-level: the streaming complete-mode snapshot
    must equal the batch sketch row-for-row."""
    batch = sorted(
        map(
            tuple,
            REGISTRY["ddsketch_value_quantiles"].fn(spark, sf_dir).collect(),
        )
    )
    stream = sorted(
        map(
            tuple,
            REGISTRY["streaming_ddsketch_quantiles"]
            .fn(spark, sf_dir)
            .collect(),
        )
    )
    assert batch == stream
