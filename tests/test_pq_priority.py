"""Law tests for the round-6b [EXT] additions: product-quantization
encode (``ext/similarity.pq_encode``) and Duffield-Lund-Thorup priority
sampling (catalog ``weighted_priority_sample``)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from dvh_airflow_kafka_spark.ext import similarity as xsim


@pytest.fixture(scope="module")
def pq_emb(spark):
    # 8 vectors, dim 8, values exact at 6 decimals (halves) -> rounding
    # is the identity and a vector equal to its codebook seed
    # reconstructs with error exactly 0
    rows = []
    for i in range(8):
        base = [float(i)] * 8
        rows.append((i, base))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_pq_seed_vectors_reconstruct_exactly(pq_emb):
    cb = xsim.pq_seed_codebooks(pq_emb, n_codes=4)
    assert cb.shape == (4, 8)
    out = {r["vec_id"]: r for r in xsim.pq_encode(pq_emb, cb, m=2).collect()}
    assert len(out) == 8
    # vec_id 0..3 ARE the seeds of codes 0..3 -> zero error, own code
    for i in range(4):
        assert out[i]["recon_err"] == 0.0
        assert out[i]["codes"] == [i, i]
    # every code in range, error non-negative
    for r in out.values():
        assert len(r["codes"]) == 2
        assert all(0 <= c < 4 for c in r["codes"])
        assert r["recon_err"] >= 0.0
    # vec 4 ([4.0]*8) is nearer seed 3 ([3.0]*8) than seed 0
    assert out[4]["codes"] == [3, 3]


def test_pq_encode_deterministic_on_real_data(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = xsim.pq_seed_codebooks(emb, n_codes=16)
    a = sorted(
        (r["vec_id"], tuple(r["codes"]), r["recon_err"])
        for r in xsim.pq_encode(emb, cb, m=8).collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["codes"]), r["recon_err"])
        for r in xsim.pq_encode(emb, cb, m=8).collect()
    )
    assert a == b
    assert len(a) == emb.count()
    assert all(len(codes) == 8 for _, codes, _ in a)


def test_priority_sample_matches_python_arithmetic(spark, sf_dir):
    from dvh_airflow_kafka_spark.catalog import REGISTRY

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {
        r["doc_id"]: max(r["n_chars"], 1)
        for r in docs.select("doc_id", "n_chars").collect()
    }
    out = REGISTRY["weighted_priority_sample"].fn(spark, sf_dir).collect()
    assert out, "sample must be non-empty"
    per_source: dict[str, list[int]] = {}
    for r in out:
        h = int(
            hashlib.sha256(f"prio-v1{r['doc_id']}".encode()).hexdigest()[:8],
            16,
        )
        assert r["priority"] == (weights[r["doc_id"]] << 32) // (h + 1)
        assert r["weight"] == weights[r["doc_id"]]
        per_source.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert len(ranks) <= 20
