"""Analytic laws for ext/graph.triangle_counts on handmade graphs."""

from __future__ import annotations

from dvh_airflow_kafka_spark.ext.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_complete_k4_every_node_in_three_triangles(spark):
    pairs = [(a, b) for a in range(4) for b in range(4) if a != b]  # both dirs
    got = {r["node"]: r for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert len(got) == 4
    for n in range(4):
        assert got[n]["degree"] == 3
        assert got[n]["n_triangles"] == 3  # C(3,2) closed pairs in K4


def test_path_graph_has_no_triangles(spark):
    pairs = [(i, i + 1) for i in range(5)]
    rows = triangle_counts(_edges(spark, pairs)).collect()
    assert all(r["n_triangles"] == 0 for r in rows)
    degs = sorted(r["degree"] for r in rows)
    assert degs == [1, 1, 2, 2, 2, 2]


def test_direction_duplicates_and_self_loops_ignored(spark):
    # one triangle listed redundantly in both directions + a self loop
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (1, 1)]
    got = {r["node"]: r for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert len(got) == 3
    for n in range(3):
        assert got[n] and got[n]["n_triangles"] == 1 and got[n]["degree"] == 2


def test_total_triangle_count_bowtie(spark):
    # two triangles sharing node 2 (bow tie): node 2 is in both
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    got = {r["node"]: r for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got[2]["n_triangles"] == 2 and got[2]["degree"] == 4
    for n in (0, 1, 3, 4):
        assert got[n]["n_triangles"] == 1
    # each triangle contributes 3 node-incidences
    assert sum(r["n_triangles"] for r in got.values()) == 6
