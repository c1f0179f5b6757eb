"""Law tests for the round-6 [EXT] additions: distributed k-means
(``ext/cluster``), link-graph PageRank (``ext/graph``), and
exact-substring span removal (``ext/dedup.remove_duplicate_spans``).
Cross-engine value equality is covered by the catalog oracles
(``test_catalog_oracle`` samples the registry); these pin the algorithmic
invariants on hand-built fixtures."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext import cluster as xcluster
from dvh_airflow_kafka_spark.ext import graph as xgraph
from dvh_airflow_kafka_spark.ext.dedup import remove_duplicate_spans


# ---------------------------------------------------------------- k-means
@pytest.fixture(scope="module")
def tiny_emb(spark):
    # two tight blobs far apart -> any sane k=2 run splits them exactly
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + 0.01 * i, 10.0]))
    for i in range(8, 16):
        rows.append((i, [-10.0 - 0.01 * i, -10.0]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_kmeans_separates_blobs(tiny_emb):
    out = xcluster.kmeans_assignments(
        tiny_emb, "vec_id", "embedding", k=2, iters=3
    ).collect()
    assert len(out) == 16
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
        assert r["sqdist"] >= 0.0
    assert sorted(len(v) for v in by_cluster.values()) == [8, 8]
    blobs = [set(range(8)), set(range(8, 16))]
    assert sorted(by_cluster.values(), key=min) == blobs


def test_kmeans_deterministic(tiny_emb):
    a = sorted(
        map(tuple, xcluster.kmeans_assignments(tiny_emb, k=2, iters=2).collect())
    )
    b = sorted(
        map(tuple, xcluster.kmeans_assignments(tiny_emb, k=2, iters=2).collect())
    )
    assert a == b


def test_kmeans_every_point_assigned_once(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = xcluster.kmeans_assignments(emb, k=4, iters=2)
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    assert out.select("cluster").distinct().count() <= 4


# --------------------------------------------------------------- PageRank
def test_pagerank_cycle_is_uniform(spark):
    # a pure 4-cycle: every node has in/out degree 1 -> uniform fixpoint
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src: long, dst: long"
    )
    out = {
        r["id"]: r["rank"]
        for r in xgraph.pagerank_fixed(nodes, edges, 4, iters=5).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for v in out.values():
        assert v == pytest.approx(0.25, abs=1e-9)


def test_pagerank_mass_conserved_and_sink_ranks_highest(spark):
    # star: everyone links to node 0; node 0 links to 1 (no dangling)
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id: long")
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)] + [(0, 1)], "src: long, dst: long"
    )
    out = {
        r["id"]: r["rank"]
        for r in xgraph.pagerank_fixed(nodes, edges, 5, iters=10).collect()
    }
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-6)
    # rank concentrates on the hub and its sole out-neighbour (the
    # hub's whole mass flows to node 1 each step, so they alternate)
    assert min(out[0], out[1]) > max(out[i] for i in (2, 3, 4))
    assert all(v > 0 for v in out.values())


# ----------------------------------------------------------- span removal
@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "a b c d e f g h"  # one exact 8-gram
    return spark.createDataFrame(
        [
            (0, f"{shared} tail zero"),
            (1, f"head one {shared}"),
            (2, "entirely unique text with no duplicated span here ok"),
            (3, shared),  # whole doc duplicated
            (4, "short doc"),  # < 8 tokens: never touched
        ],
        "doc_id: long, text: string",
    )


def test_span_removal_keeper_untouched_others_cleaned(span_docs):
    out = {r["doc_id"]: r for r in remove_duplicate_spans(span_docs).collect()}
    # doc 0 is the min-id keeper of the shared gram -> keeps everything
    assert out[0]["n_removed"] == 0
    assert (
        out[0]["cleaned_sha"]
        == hashlib.sha256(b"a b c d e f g h tail zero").hexdigest()
    )
    # doc 1 loses exactly the 8 shared tokens, keeps its own prefix
    assert out[1]["n_removed"] == 8
    assert out[1]["cleaned_sha"] == hashlib.sha256(b"head one").hexdigest()
    # doc 3 is a full duplicate -> everything removed, empty-string sha
    assert out[3]["n_removed"] == 8
    assert out[3]["cleaned_sha"] == hashlib.sha256(b"").hexdigest()
    # untouched docs
    assert out[2]["n_removed"] == 0
    assert out[4]["n_removed"] == 0
    assert out[4]["n_tokens"] == 2


def test_span_removal_overlapping_spans_union(spark):
    # docs share a 9-token run -> two overlapping 8-gram spans in doc 11;
    # covered positions are the UNION (9 tokens), not 16
    run = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame(
        [(10, f"{run} alpha"), (11, f"{run} beta")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs).collect()}
    assert out[10]["n_removed"] == 0
    assert out[11]["n_removed"] == 9
    assert out[11]["cleaned_sha"] == hashlib.sha256(b"beta").hexdigest()


def test_span_removal_one_row_per_doc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_duplicate_spans(docs)
    assert out.count() == docs.count()
    bad = out.filter(
        (F.col("n_removed") < 0) | (F.col("n_removed") > F.col("n_tokens"))
    )
    assert bad.count() == 0


# ------------------------------------------------------------ ingest gate
def test_jaccard_ingest_gate_directional(spark):
    from dvh_airflow_kafka_spark.ext.dedup import jaccard_ingest_gate

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base),  # existing
            (3, "totally different words here nothing shared at all"),
            (10, base + " iota"),  # incoming: near-dup of existing 1
            (20, "unique incoming text with fresh vocabulary only"),
            (30, "repeated incoming payload snippet one two three"),
            (40, "repeated incoming payload snippet one two three"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in jaccard_ingest_gate(
            docs,
            "doc_id",
            "text",
            incoming_pred=(docs.doc_id % 10 == 0),
            threshold=0.4,
        ).collect()
    }
    assert set(out) == {10, 20, 30, 40}  # one row per incoming doc
    assert out[10]["kept"] == 0 and out[10]["max_jaccard"] > 0.4
    assert out[20]["kept"] == 1 and out[20]["max_jaccard"] == 0.0
    # incoming-vs-incoming duplicates are NOT the gate's business
    # (directional join: incoming probes existing only) — both admitted
    assert out[30]["kept"] == 1 and out[40]["kept"] == 1


# ------------------------------------------------------------ HITS / k-core
def test_hits_one_iter_auth_is_indegree(spark):
    # star: 0->2, 1->2, 2->3.  With hub0=1, auth after one half-step is
    # exactly the in-degree; hub after the full step sums its targets'
    # auth scores.
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 3)], "src: long, dst: long"
    )
    out = {
        r["id"]: (r["hub_score"], r["auth_score"])
        for r in xgraph.hits_fixed(nodes, edges, iters=1).collect()
    }
    # auth = indegree: node2=2, node3=1, others 0
    assert {k: v[1] for k, v in out.items()} == {0: 0, 1: 0, 2: 2, 3: 1}
    # hub(u) = sum auth(dst): 0->2 gives 2, 1->2 gives 2, 2->3 gives 1
    assert {k: v[0] for k, v in out.items()} == {0: 2, 1: 2, 2: 1, 3: 0}


def test_hits_rejects_zero_iters_and_lpa_rejects_string_ids(spark):
    nodes = spark.createDataFrame([(i,) for i in range(3)], "id: long")
    edges = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    with pytest.raises(ValueError, match="iters >= 1"):
        xgraph.hits_fixed(nodes, edges, iters=0)
    snodes = spark.createDataFrame([("a",), ("b",)], "id: string")
    with pytest.raises(ValueError, match="numeric id"):
        xgraph.label_propagation_fixed(snodes, edges)


def test_hits_integer_growth_deterministic(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id: long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (3, 0)],
        "src: long, dst: long",
    )
    a = sorted(map(tuple, xgraph.hits_fixed(nodes, edges, iters=4).collect()))
    b = sorted(map(tuple, xgraph.hits_fixed(nodes, edges, iters=4).collect()))
    assert a == b
    assert all(isinstance(r[1], int) and r[1] >= 0 for r in a)


def test_kcore_triangle_sheds_pendant(spark):
    # triangle 0-1-2 plus pendant 3 attached to 0: the 2-core is the
    # triangle; the pendant (degree 1) peels in round one and node 0's
    # final degree drops to 2.
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src: long, dst: long"
    )
    out = {
        r["id"]: (r["degree"], r["converged"])
        for r in xgraph.k_core_peel(nodes, edges, k=2, iters=3).collect()
    }
    assert set(out) == {0, 1, 2}
    assert all(d == 2 for d, _ in out.values())
    assert all(c for _, c in out.values())  # peel settled within 3 rounds


def test_kcore_full_unravel_when_k_exceeds_degrees(spark):
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src: long, dst: long"
    )
    out = xgraph.k_core_peel(nodes, edges, k=3, iters=2).collect()
    assert out == []


def test_kcore_iters1_converged_compares_against_unpeeled(spark):
    # iters=1 takes the prev_n = initial-survivor-count path: on a cycle
    # (everyone degree 2, k=2) round 1 drops nobody -> converged True;
    # with a pendant attached, round 1 drops it -> converged False.
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    cycle = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src: long, dst: long"
    )
    out = xgraph.k_core_peel(
        nodes, cycle, k=2, iters=1
    ).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2]
    assert all(r["converged"] for r in out)
    pendant = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src: long, dst: long"
    )
    out = xgraph.k_core_peel(nodes, pendant, k=2, iters=1).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2]
    assert not any(r["converged"] for r in out)


def test_kcore_iters2_converged_from_last_two_rounds(spark):
    # pendant peels in round 1, round 2 drops nobody: the flag compares
    # the LAST TWO survivor counts, so iters=2 reports converged even
    # though round 1 shed a node.
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id: long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src: long, dst: long"
    )
    out = xgraph.k_core_peel(nodes, edges, k=2, iters=2).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2]
    assert all(r["converged"] for r in out)
