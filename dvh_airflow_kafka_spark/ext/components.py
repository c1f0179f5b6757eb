"""[EXT] Distributed connected components — pair lists into dedup
clusters.

Every near-dup detector in this repo (MinHash, SimHash, n-gram Jaccard,
embedding cosine) emits *pairs*; deduplication needs *clusters*: if A~B
and B~C, one canonical document must survive for {A, B, C} even though
(A, C) was never emitted. That closure is connected components.

Algorithm: iterative minimum-label propagation (the alternating-star
family of Kiveris et al. "Connected Components in MapReduce and Beyond",
SoCC'14, simplified to plain label propagation). Each iteration joins the
current labels across the symmetric edge list and keeps the per-node
minimum — one shuffle join + one aggregate per round, converging in
O(component diameter) rounds. Near-dup clusters are shallow (dozens of
docs, diameter a handful), so a small iteration cap covers 100 TB corpora;
the convergence check is a driver-side count of changed labels (scalar
per round, the legitimate driver-loop case the iterative algorithm
needs).

Determinism: the component id is the minimum node id in the component —
stable across partitionings, runs, and engines, which is what makes the
result oracle-able against a recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Undirectedness is enforced by symmetrising the input.

    ``shuffle_partitions`` right-sizes the per-round exchanges exactly
    like the streaming drains do for state stores: each label-propagation
    round is several tiny stages over the label frame, and when that
    frame is far below a-partition-per-core (near-dup clusters: hundreds
    of edges), 32-task stages are pure scheduler overhead — measured
    3.7s -> ~1s on a 477-node graph at 8 partitions.  Leave ``None`` for
    graphs that actually fill the cluster; the conf is saved/restored
    around the loop and only affects plans created inside it (the
    returned frame is already materialized by its final checkpoint)."""
    spark = edges.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    try:
        return _cc_loop(edges, src, dst, max_iter)
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)


def _cc_loop(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # An iterative plan that feeds its own output back in must cut the
    # lineage every round — otherwise each iteration's plan embeds all
    # previous ones and analysis/codegen cost grows exponentially until
    # the JVM gives up. localCheckpoint materialises the (tiny) label
    # frame and restarts the lineage; on a cluster, checkpoint() to a
    # fault-tolerant dir serves the same role.
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        # each node offers its label to every neighbour; keep the min of
        # (own label, best neighbour offer)
        offers = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), "component"
        )
        new_labels = (
            labels.select("node", "component")
            .union(offers)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # Unconverged labels would silently merge documents into WRONG
        # clusters downstream — fail loudly instead (a component with
        # diameter > max_iter exists; raise the cap).
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; a component's diameter exceeds the cap — "
            f"rerun with a larger max_iter"
        )
    return labels.select("node", "component")


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id) with cluster_id = the
    minimum doc_id of the transitive cluster — the canonical survivor
    every other member would dedup against."""
    cc = connected_components(
        pairs, src=id_a, dst=id_b, shuffle_partitions=shuffle_partitions
    )
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
