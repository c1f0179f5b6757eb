"""Behavioral laws for the round-6d operators (BM25 retrieval, batch
range join, hard-negative mining, char-LM quality) — the oracle gate in
``test_catalog_oracle`` pins cross-engine equality; these pin the
SEMANTICS each operator claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.catalog import (
    _BM25_TERMS,
    _BURST_US,
    REGISTRY,
)
from dvh_airflow_kafka_spark.ext import similarity as xsim
from dvh_airflow_kafka_spark.io import load_table


def test_range_join_covers_every_probe_and_matches_direct_count(spark, sf_dir):
    """Left-join semantics: one output row per 'error' event; the binned
    equi-join must agree with a direct (unoptimized) range filter on a
    sampled probe."""
    out = REGISTRY["error_burst_range_join"].fn(spark, sf_dir)
    rows = {r["event_id"]: r for r in out.collect()}
    ev = load_table(spark, sf_dir, "events")
    n_err = ev.filter(F.col("event_type") == "error").count()
    assert len(rows) == n_err
    # direct recomputation for the 5 lowest-id probes
    probes = (
        ev.filter(F.col("event_type") == "error")
        .orderBy("event_id")
        .limit(5)
        .collect()
    )
    all_ev = ev.select("ts", "value").collect()
    for p in probes:
        lo = p["ts"].timestamp() - _BURST_US / 1e6
        n = sum(
            1
            for e in all_ev
            if lo <= e["ts"].timestamp() < p["ts"].timestamp()
        )
        assert rows[p["event_id"]]["n_preceding"] == n


def test_bm25_top_docs_contain_a_query_term_and_scores_descend(spark, sf_dir):
    out = REGISTRY["bm25_topk_docs"].fn(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    docs = load_table(spark, sf_dir, "documents")
    ids = [r["doc_id"] for r in out]
    hit = docs.filter(F.col("doc_id").isin(ids)).select("doc_id", "text").collect()
    for r in hit:
        toks = r["text"].lower().split()
        assert any(t in toks for t in _BM25_TERMS)


def test_hard_negatives_are_nearest_of_a_different_label(spark, sf_dir):
    out = REGISTRY["hard_negative_mining"].fn(spark, sf_dir).collect()
    by_q: dict = {}
    for r in out:
        assert r["neighbor_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cos = [r["cosine"] for r in rs]
        assert cos == sorted(cos, reverse=True)
    # the label mask beats top-k-then-filter: rank-1 negative must
    # dominate every other different-label candidate (spot-check one
    # query against the plain unrestricted top-k with a large k)
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = min(by_q)
    queries = emb.filter(F.col("vec_id") == q0)
    allk = xsim.brute_force_topk(emb, queries, k=50, label_col="label").collect()
    qlab = emb.filter(F.col("vec_id") == q0).select("label").first()[0]
    diff = [r for r in allk if r["neighbor_label"] != qlab]
    assert diff, "50-NN of the probe are all same-label; widen k"
    best = max(diff, key=lambda r: (r["cosine"], -r["neighbor_id"]))
    assert by_q[q0][0]["neighbor_id"] == best["neighbor_id"]


def test_brute_force_same_label_mode_mines_positives(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = xsim.brute_force_topk(
        emb, queries, k=3, label_col="label", same_label=True
    ).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in queries.select("vec_id", "label").collect()
    }
    assert out
    for r in out:
        assert r["neighbor_label"] == labels[r["query_id"]]


def test_charlm_scores_are_negative_logprobs_of_true_bigram_counts(spark, sf_dir):
    out = REGISTRY["charlm_doc_quality"].fn(spark, sf_dir).collect()
    assert len(out) == 20
    vals = [r["avg_logprob"] for r in out]
    assert vals == sorted(vals)
    assert all(v < 0 for v in vals)
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in out]))
        .select("doc_id", "text")
        .collect()
    }
    for r in out:
        assert r["n_bigrams"] == len(docs[r["doc_id"]]) - 1


def test_dsir_selects_target_domain_documents(spark, sf_dir):
    """DSIR law: the importance ranking must actually discriminate — the
    top-k is majority target-lang, scores are sorted, and a target-lang
    document outscores the non-target mean."""
    out = REGISTRY["dsir_domain_selection"].fn(spark, sf_dir).collect()
    assert len(out) == 20
    imps = [r["importance"] for r in out]
    assert imps == sorted(imps, reverse=True)
    langs = [r["lang"] for r in out]
    assert langs.count("en") > len(langs) / 2, langs


def test_charlm_two_models_match_separately_trained(spark, sf_dir):
    """Round-13 optimization law: the fused one-pass trainer
    (``charlm_two_models``) must return BIT-IDENTICAL models to two
    separate ``charlm_model`` calls — base over the whole frame, target
    over the condition's subset."""
    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.ext import text as xtext
    from dvh_airflow_kafka_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    t = docs.filter(F.length("text") >= 2).select(
        "doc_id", "lang", F.lower(F.col("text")).alias("s")
    )
    cond = F.col("lang") == "en"
    base_sep = xtext.charlm_model(t)
    target_sep = xtext.charlm_model(t.filter(cond))
    base_fused, target_fused = xtext.charlm_two_models(t, cond)
    assert base_fused == base_sep
    assert target_fused == target_sep
