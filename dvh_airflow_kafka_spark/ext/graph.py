"""[EXT] Fixed-iteration PageRank over an edge frame — the link-graph
centrality primitive web-scale corpus curation uses to pick crawl domains
(RefinedWeb/FineWeb-style harmonic-centrality/rank selection of sources).

Spark-first shape: the graph lives as two DataFrames — ``edges (src,
dst)`` and the node universe — and every iteration is one keyed join
(ranks ⋈ edges on src) plus one map-side-combined ``groupBy(dst).sum``.
That is the canonical distributed PageRank data movement: per iteration
exactly one exchange keyed on src and one keyed on dst, both AQE-planned.

Scale notes (100 TB / billions of edges):

- the edge frame is joined every iteration on the SAME key — pre-bucketing
  both ``edges`` and the rank frame by node id (``io.write_bucketed``)
  makes each iteration's join exchange-free on the edge side, which is the
  production layout; here the edges frame is persisted once with outdeg
  merged in so per-iteration work is join + agg only;
- lineage grows linearly with iterations; past ~10 iterations a
  checkpoint/localCheckpoint truncates the plan (5 here — no need);
- dangling nodes (outdeg 0) would leak rank mass; callers must either
  guarantee outdeg >= 1 (the catalog's synthesized graph does, by
  construction) or redistribute the dangling mass per iteration.

Cross-engine determinism: per-iteration ranks are rounded to 10 decimals
on both engines (in-degree sums are tiny — a last-ulp straddle of the
rounding boundary is the same documented negligible-risk class as the
rest of the [EXT] float oracles); the final output rounds to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITER_ROUND = 10


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    iters: int = 5,
    damping: float = 0.85,
    id_col: str = "id",
) -> DataFrame:
    """``iters`` synchronous PageRank steps from the uniform vector.

    ``nodes``: one column ``id_col`` (the node universe — nodes with no
    in-edges must still receive the teleport term). ``edges``: columns
    ``src, dst``, assumed deduplicated. Returns ``(id_col, rank)`` with
    ``rank`` rounded to ``ITER_ROUND`` decimals (callers round coarser
    for presentation)."""
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # The two frames every iteration re-joins are persisted PRE-HASHED on
    # their join keys (the in-memory analogue of the bucketed layout the
    # module docstring prescribes at 100 TB): the edge side of the
    # src-join and the node side of the teleport left-join then satisfy
    # the join's required distribution from cache — only the rank frame
    # (which changes every iteration) still exchanges.
    e = edges.join(outdeg, "src").repartition("src").persist()
    nodes_p = nodes.repartition(id_col).persist()
    teleport = (1.0 - damping) / n_nodes

    ranks = nodes_p.select(
        F.col(id_col), F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(iters):
        # name-based joins throughout: ``ranks`` derives from ``nodes``
        # every iteration, so attribute references would trip Spark's
        # ambiguous-self-join detection
        contrib = (
            e.join(
                ranks.select(F.col(id_col).alias("__src"), "rank"),
                F.col("src") == F.col("__src"),
            )
            .select(
                F.col("dst").alias(id_col),
                (F.col("rank") / F.col("outdeg")).alias("__c"),
            )
            .groupBy(id_col)
            .agg(F.sum("__c").alias("__c"))
        )
        ranks = nodes_p.join(contrib, id_col, "left").select(
            F.col(id_col),
            F.round(
                F.lit(teleport) + damping * F.coalesce(F.col("__c"), F.lit(0.0)),
                ITER_ROUND,
            ).alias("rank"),
        )
    return ranks
