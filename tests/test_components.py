"""Connected components: transitive closure beyond direct pairs, multiple
components, convergence on chains longer than one propagation hop."""

from __future__ import annotations

from dvh_airflow_kafka_spark.ext.components import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """A 12-node chain needs several propagation rounds — exercises the
    iteration loop, not just one join."""
    chain = [(i, i + 1) for i in range(12)]
    got = _cc(spark, chain)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1), (2, 5)]) == {1: 1, 2: 1, 5: 1}


def test_unconverged_raises_instead_of_wrong_labels(spark):
    """A component whose diameter exceeds max_iter must fail loudly —
    silently returning partial labels would merge documents into wrong
    clusters downstream."""
    import pytest

    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
    # and the same graph converges fine with an adequate cap
    assert connected_components(df, max_iter=15).count() == 13


def test_dedup_clusters_canonical_is_min(spark):
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 21: 20}
