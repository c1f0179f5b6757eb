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


def triangle_counts(edges: DataFrame, out_node: str = "node") -> DataFrame:
    """Per-node exact triangle counts + degree over an undirected graph
    given as a (src, dst) edge frame (direction and duplicates ignored;
    self-loops dropped).

    Algorithm: degree-ordered node-iterator (Suri & Vassilvitskii,
    'Counting triangles and the curse of the last reducer', WWW'11) —
    orient every undirected edge from its lower-(degree, id) endpoint to
    the higher, generate wedges by self-joining oriented edges on the
    source, and close each wedge with one lookup in the canonical edge
    set.  The orientation is the whole scale story: a celebrity node
    with degree d contributes d² wedges under a naive join, but ordered
    orientation bounds every out-degree at O(√m), so total wedges are
    O(m^{3/2}) — the worst case of triangle counting itself, with no
    'last reducer' hot key.  Three keyed exchanges (degree agg, wedge
    join, closure join); each triangle is generated exactly once, from
    its lowest-ordered vertex.

    Output: (node, degree, n_triangles) — every node of the graph, zero
    triangles included.  Local clustering coefficients derive as
    ``2·T / (d·(d−1))``.
    """
    # localCheckpoint: `und` feeds three consumers (degrees, the wedge
    # join via the oriented frame, the closure lookup) — materialize the
    # canonicalized edge set once instead of relying on exchange reuse,
    # which is session-state sensitive
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("u"),
            F.greatest(F.col("src"), F.col("dst")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    j = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = j.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    l, r = oriented.alias("l"), oriented.alias("r")
    wedge_order = (F.col("l.db") < F.col("r.db")) | (
        (F.col("l.db") == F.col("r.db")) & (F.col("l.b") < F.col("r.b"))
    )
    wedges = l.join(
        r, (F.col("l.a") == F.col("r.a")) & wedge_order
    ).select(
        F.col("l.a").alias("a"),
        F.col("l.b").alias("b"),
        F.col("r.b").alias("c"),
    )
    closed = wedges.join(
        und,
        (F.least(F.col("b"), F.col("c")) == F.col("u"))
        & (F.greatest(F.col("b"), F.col("c")) == F.col("v")),
        "left_semi",
    )
    tri = (
        closed.select(F.explode(F.array("a", "b", "c")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.join(tri, "n", "left")
        .select(
            F.col("n").alias(out_node),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).alias("n_triangles"),
        )
    )


def bfs_min_hops(
    seeds: DataFrame,
    edges: DataFrame,
    *,
    max_hops: int,
    id_col: str = "id",
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed, bounded at
    ``max_hops`` — the reachability primitive behind crawl-frontier
    expansion, contamination blast-radius audits ("every doc within k
    link hops of a flagged doc") and recursive-CTE reachability queries
    (the Spark-side equivalent of ``WITH RECURSIVE``; the catalog
    oracles it with unrolled per-hop CTEs).

    Frontier-style (Pregel-shaped) iteration: each hop is ONE src-keyed
    join (frontier ⋈ edges), a dst-distinct, and an anti-join against
    the visited set — expanding from the *frontier only* is already
    min-hop-correct, because any node reachable from an earlier layer
    was claimed by that layer.  Scale notes: at billions of edges the
    join is the same bucketing candidate as ``pagerank_fixed`` (edges
    pre-bucketed by src make every hop exchange-free on the edge side);
    the visited set is localCheckpoint-ed each hop, truncating lineage
    that would otherwise double per iteration, and the per-hop
    anti-join keeps frontier size monotone non-increasing in the
    reachable set, never corpus-sized.

    ``seeds``: one column ``id_col``.  ``edges``: ``src``/``dst``
    (directed).  Returns (``id_col``, ``hops``).
    """
    visited = seeds.select(F.col(id_col).alias("id")).distinct()
    out = visited.withColumn("hops", F.lit(0))
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=False)
        )
        out = out.union(nxt.withColumn("hops", F.lit(h)))
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return out.select(F.col("id").alias(id_col), "hops")


def label_propagation_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    id_col: str = "id",
) -> DataFrame:
    """``iters`` synchronous label-propagation steps (community
    detection, Raghavan et al. 2007) with DETERMINISTIC resolution:
    label_0 = node id; each step every node adopts the most frequent
    label among its undirected neighbors, ties broken by the SMALLEST
    label; isolated nodes keep their id. The (count DESC, label ASC)
    argmax is one ``max(struct(count, -label))`` — no window, no
    nondeterministic arbitrary pick, so the fixpoint replays exactly in
    an unrolled SQL oracle.  The ``-label`` negation requires NUMERIC
    node ids (asserted below); string-labeled graphs must map ids to
    longs first (``F.hash``/dense rank), or the tie-break would silently
    misorder.

    Scale shape mirrors :func:`pagerank_fixed`: the undirected edge
    frame is persisted pre-hashed on ``src`` once; each iteration is one
    src-keyed join + two map-side-combined aggregates keyed on the
    destination. Per-iteration state is one (node, label) row per node.
    Returns ``(id_col, community)``."""
    id_type = dict(nodes.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"label_propagation_fixed needs a numeric id column for its "
            f"(count DESC, label ASC) tie-break; got {id_col}: {id_type}"
        )
    und = (
        edges.select("src", "dst")
        .union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .repartition("src")
        .persist()
    )
    nodes_p = nodes.repartition(id_col).persist()
    labels = nodes_p.select(F.col(id_col), F.col(id_col).alias("lbl"))
    for _ in range(iters):
        nbr = und.join(
            labels.select(F.col(id_col).alias("__s"), "lbl"),
            F.col("src") == F.col("__s"),
        ).select(F.col("dst").alias(id_col), "lbl")
        votes = nbr.groupBy(id_col, "lbl").agg(
            F.count(F.lit(1)).alias("c")
        )
        best = (
            votes.groupBy(id_col)
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            )
            .select(F.col(id_col), (-F.col("m.nl")).alias("__new"))
        )
        labels = nodes_p.join(best, id_col, "left").select(
            F.col(id_col),
            F.coalesce(F.col("__new"), F.col(id_col)).alias("lbl"),
        )
    return labels.select(F.col(id_col), F.col("lbl").alias("community"))


def hits_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    id_col: str = "id",
) -> DataFrame:
    """``iters`` synchronous HITS steps (Kleinberg, 'Authoritative
    sources in a hyperlinked environment', JACM'99) WITHOUT per-step
    normalization: starting from hub = 1 on every node, each step is
    auth(v) = Σ_{u→v} hub(u) then hub(u) = Σ_{u→v} auth(v) — so every
    score is a pure INTEGER (a count of directed paths alternating
    out/in from the start vector), and a SQL oracle replays the
    iteration bit-exactly with no float caveat at all.  Magnitudes grow
    like (mean degree)^(2·iters): int64 is safe far beyond any
    realistic (degree, iters) audit configuration.  Callers that want
    comparable scores divide by the max AFTER the loop (two exact
    int64s → one correctly-rounded double division — still exact
    cross-engine).

    Same movement as ``pagerank_fixed``: per half-step one keyed join
    (scores ⋈ edges) + one map-side-combined ``groupBy().sum``; the
    edge frame is persisted pre-hashed on each join key so only the
    score frames exchange per iteration.  Inside the loop the score
    frames stay SPARSE — a node absent from ``auth``/``hub`` has score
    0 and contributes nothing to the next half-step's sum, so the
    full-universe densification (left-join + coalesce) happens exactly
    once, after the loop, instead of twice per iteration.  Returns
    ``(id_col, hub_score, auth_score)`` longs over the full node
    universe (nodes with no in/out edges score 0).  ``iters`` must be
    >= 1: the loop defines the auth frame, so a 0-iteration call has no
    meaningful auth side (the pre-loop state is hub-only by
    construction)."""
    if iters < 1:
        raise ValueError(f"hits_fixed needs iters >= 1, got {iters}")
    e_src = edges.repartition("src").persist()
    e_dst = edges.repartition("dst").persist()
    nodes_p = nodes.repartition(id_col).persist()
    hub = nodes_p.select(F.col(id_col), F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(iters):
        auth = (
            e_src.join(
                hub.select(F.col(id_col).alias("__s"), "h"),
                F.col("src") == F.col("__s"),
            )
            .groupBy(F.col("dst").alias(id_col))
            .agg(F.sum("h").cast("long").alias("a"))
        )
        hub = (
            e_dst.join(
                auth.select(F.col(id_col).alias("__d"), "a"),
                F.col("dst") == F.col("__d"),
            )
            .groupBy(F.col("src").alias(id_col))
            .agg(F.sum("a").cast("long").alias("h"))
        )
    # the final auth frame feeds both the last hub half-step and the
    # output — persist so the shared subtree evaluates once
    auth = auth.persist()
    return (
        nodes_p.join(hub, id_col, "left")
        .join(auth, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub_score"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth_score"),
        )
    )


def k_core_peel(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 3,
    iters: int = 4,
    id_col: str = "id",
) -> DataFrame:
    """``iters`` rounds of k-core peeling (Seidman, 'Network structure
    and minimum degree', Social Networks 1983) over the UNDIRECTED
    version of ``edges``: each round drops every node whose remaining
    degree is < k, then restricts the edge set to survivors.  A fixed
    iteration count makes the op deterministic and SQL-replayable
    (integer degrees only — bit-exact oracle); on graphs whose peeling
    converges within ``iters`` rounds the result IS the k-core, and the
    ``converged`` flag (no node dropped in the final round) tells the
    caller whether more rounds were needed — the audit shape, rather
    than an unbounded loop, at 100 TB.

    Per round: one map-side-combined degree count + one semi-join of
    the edge frame against survivors — the same bounded-exchange
    movement as the other fixed-iteration graph ops.  Only the LAST TWO
    rounds' survivor counts are ever compared for the ``converged``
    flag, so earlier rounds schedule no count action.

    Lineage note (this is the load-bearing scale fix): each round's
    edge set references the previous round THREE times (once directly,
    twice through ``keep``), so without truncation the logical plan
    grows 3^rounds and Catalyst analysis time explodes long before the
    data does — measured 16s planning at round 4 on a 30k-edge graph.
    An eager ``localCheckpoint`` per round replaces the lineage with
    the materialized blocks, keeping plan depth constant; on a real
    cluster with executor churn, swap for reliable ``checkpoint()``.
    Returns ``(id_col, degree, converged)`` for surviving nodes with
    their final within-core degree."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    cur = und
    # initial survivor count only matters when iters == 1 (the flag then
    # compares round 1 against the un-peeled graph)
    prev_n = (
        und.select("src").distinct().count() if iters <= 1 else None
    )
    converged = False
    for t in range(1, iters + 1):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src").persist()
        if t >= iters - 1:
            n_keep = keep.count()
            converged = n_keep == prev_n
            prev_n = n_keep
        cur = (
            cur.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .localCheckpoint()
        )
    final_deg = cur.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return final_deg.select(
        F.col("src").alias(id_col),
        "degree",
        F.lit(converged).alias("converged"),
    )
