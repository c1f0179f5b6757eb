"""Catalog family module (mechanical split of catalog.py, round 10).

See ``catalog/__init__.py`` for the module map.  Registration order is
preserved by import order; do not reorder modules or @register blocks.
"""
from __future__ import annotations

from dvh_airflow_kafka_spark.ext import dedup as xdedup, text as xtext
from dvh_airflow_kafka_spark.io import load_table
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from dvh_airflow_kafka_spark.catalog._core import (
    _stage_frame,
    register,
)

# ==========================================================================
# [EXT] round-6: distributed k-means clustering, exact-substring span
# REMOVAL, link-graph PageRank, product-quantization encode, priority
# sampling.
#
# ROUND-7 NOTE: these ten (embedding_kmeans_assign,
# duplicate_span_removal, link_graph_pagerank, pq_encode_stats,
# pq_adc_recall, ivf_pq_ann_topk, incremental_near_dup_ingest,
# knn_label_accuracy, bpe_learn_merges_table, weighted_priority_sample)
# register AFTER the 50-query driver window, so
# they hold no driver CORRECTNESS row this round (verified locally vs
# their oracles at sf0.01 + pytest-pinned invariants).  Next round, rotate
# them to the front of _CERTIFY_FIRST.
# ==========================================================================

_KMEANS_K = 8
_KMEANS_ITERS = 3
_EMB_DIM = 64


def _kmeans_oracle_sql(k: int, iters: int, dim: int) -> str:
    """Unrolled Lloyd's iterations as nested CTEs — the SQL mirror of
    ``ext/cluster.kmeans_assignments``'s determinism contract (seeds =
    min-id per residue class; centroids rounded to 6 after seeding and
    after every mean; distances rounded to 6 before the (d, cluster)
    argmin)."""
    parts = [
        f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sd AS (SELECT CAST(vec_id % {k} AS INT) AS c, MIN(vec_id) AS sid
           FROM v GROUP BY 1),
    c0 AS (SELECT sd.c AS c, list_transform(v.e, x -> round(x, 6)) AS ce
           FROM sd JOIN v ON v.vec_id = sd.sid)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""
    , a{t} AS (
        SELECT v.vec_id, v.e, c.c AS c,
               round(list_dot_product(v.e, v.e)
                     - 2 * list_dot_product(v.e, c.ce)
                     + list_dot_product(c.ce, c.ce), 6) AS d
        FROM v CROSS JOIN c{t - 1} c
    ), s{t} AS (
        SELECT vec_id, e, c, d FROM (
            SELECT vec_id, e, c, d,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM a{t}) q{t} WHERE rn = 1
    )"""
        )
        if t < iters:
            parts.append(
                f"""
    , c{t} AS (
        SELECT c, list(m ORDER BY i) AS ce FROM (
            SELECT c, i, round(AVG(e[i]), 6) AS m
            FROM s{t}, (SELECT unnest(range(1, {dim + 1})) AS i) dims
            GROUP BY c, i) m{t} GROUP BY c
    )"""
            )
    parts.append(
        f"""
    SELECT vec_id, CAST(c AS INT) AS cluster, round(d, 4) AS sqdist
    FROM s{iters}
    """
    )
    return "".join(parts)


@register(
    "embedding_kmeans_assign",
    sql=_kmeans_oracle_sql(_KMEANS_K, _KMEANS_ITERS, _EMB_DIM),
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distributed fixed-iteration Lloyd's k-means over the
    embedding corpus (k=8, 3 assignment passes) — the cluster-then-curate
    primitive (SemDeDup clusters before deduping; domain discovery and
    corpus mixing cluster before sampling). Per iteration: ONE linear
    ``mapInPandas`` corpus scan (centroids broadcast in the closure,
    numpy matmul per Arrow batch) + ONE map-side-combined k*dim-row
    aggregate — no join, no cross product, so a 1000-executor 100 TB run
    moves only k*dim rows per iteration through the exchange. The oracle
    replays the identical rounded-centroid iteration as unrolled CTEs."""
    from dvh_airflow_kafka_spark.ext import cluster as xcluster

    emb = load_table(spark, sf_dir, "embeddings")
    out = xcluster.kmeans_assignments(
        emb, "vec_id", "embedding", k=_KMEANS_K, iters=_KMEANS_ITERS
    )
    return out.select(
        "vec_id", "cluster", F.round("sqdist", 4).alias("sqdist")
    )


_SPAN_REMOVAL_SQL = r"""
    WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS wl
               FROM documents),
    gi AS (
        SELECT doc_id, wl, unnest(range(1, len(wl) - 6)) AS i
        FROM w WHERE len(wl) >= 8
    ),
    g AS (
        SELECT doc_id, i,
               wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2] || ' ' || wl[i+3]
               || ' ' || wl[i+4] || ' ' || wl[i+5] || ' ' || wl[i+6]
               || ' ' || wl[i+7] AS gram
        FROM gi
    ),
    dup AS (
        SELECT gram, MIN(doc_id) AS keeper
        FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    cov AS (
        SELECT DISTINCT doc_id, p FROM (
            SELECT g.doc_id, unnest(range(g.i, g.i + 8)) AS p
            FROM g JOIN dup USING (gram) WHERE g.doc_id <> dup.keeper) cv
    ),
    tp AS (SELECT doc_id, wl, unnest(range(1, len(wl) + 1)) AS p FROM w),
    toks AS (SELECT doc_id, p, wl[p] AS tok FROM tp),
    kept AS (
        SELECT t.doc_id, t.p, t.tok
        FROM toks t LEFT JOIN cov ON t.doc_id = cov.doc_id AND t.p = cov.p
        WHERE cov.p IS NULL
    ),
    ka AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               sha256(array_to_string(list(tok ORDER BY p), ' '))
                   AS cleaned_sha
        FROM kept GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(len(w.wl) AS INT) AS n_tokens,
           CAST(len(w.wl) - COALESCE(ka.n_kept, 0) AS INT) AS n_removed,
           COALESCE(ka.cleaned_sha, sha256('')) AS cleaned_sha
    FROM w LEFT JOIN ka ON w.doc_id = ka.doc_id
    """


@register("duplicate_span_removal", sql=_SPAN_REMOVAL_SQL)
def duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact-substring dedup with span REMOVAL (Lee et al. ACL'22):
    every word-level 8-gram occurring in >= 2 documents is deleted from
    every document except the min-id keeper; kept tokens re-join in
    order. The transform downstream of ``duplicated_ngram_spans``'s
    detection signal — it PRODUCES the cleaned corpus. Pure higher-order
    functions + keyed exchanges (gram, then (doc, pos)); see
    ``ext/dedup.remove_duplicate_spans`` for the 100 TB plan notes."""
    docs = load_table(spark, sf_dir, "documents")
    return xdedup.remove_duplicate_spans(docs, "doc_id", "text", ngram=8)


_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_oracle_sql(iters: int, damping: float) -> str:
    """Unrolled synchronous PageRank as nested CTEs over the synthesized
    link graph (doc i links to (i*31 + g) % N for g in 1..3, self-loops
    dropped) — the SQL mirror of ``ext/graph.pagerank_fixed`` (uniform
    start, per-iteration round to 10, final round to 6)."""
    parts = [
        """
    WITH nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS ni
                FROM documents),
    gg AS (SELECT unnest([1, 2, 3]) AS g),
    e AS (
        SELECT DISTINCT d.doc_id AS src,
               (d.doc_id * 31 + gg.g) % nn.ni AS dst
        FROM documents d, nn, gg
        WHERE (d.doc_id * 31 + gg.g) % nn.ni <> d.doc_id
    ),
    o AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT doc_id AS id, 1.0 / nn.n AS r FROM documents, nn)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""
    , r{t} AS (
        SELECT d.doc_id AS id,
               round((1.0 - {damping}) / nn.n
                     + {damping} * COALESCE(s.c, 0.0), 10) AS r
        FROM documents d CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS id, SUM(p.r / o.outdeg) AS c
            FROM e JOIN r{t - 1} p ON p.id = e.src JOIN o ON o.src = e.src
            GROUP BY e.dst) s ON s.id = d.doc_id
    )"""
        )
    parts.append(
        f"""
    SELECT id AS doc_id, round(r, 6) AS pagerank FROM r{iters}
    """
    )
    return "".join(parts)


@register(
    "link_graph_pagerank", sql=_pagerank_oracle_sql(_PR_ITERS, _PR_DAMPING)
)
def link_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Fixed-iteration PageRank (d=0.85, 5 steps) over a
    deterministic synthesized link graph on documents (doc i -> (i*31+g)
    % N, g in 1..3, self-loops dropped, deduplicated) — the link-graph
    centrality signal web-corpus curation ranks crawl domains with
    (RefinedWeb/FineWeb-style source selection). Per iteration exactly
    one src-keyed join + one dst-keyed map-side-combined sum
    (``ext/graph.pagerank_fixed``); at 100 TB both sides pre-bucket by
    node id to make the joins exchange-free."""
    from dvh_airflow_kafka_spark.ext import graph as xgraph

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("g"),
        )
        .withColumn("dst", (F.col("src") * 31 + F.col("g")) % F.lit(n))
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
        .distinct()
    )
    ranks = xgraph.pagerank_fixed(
        docs.select(F.col("doc_id").alias("id")),
        edges,
        n_nodes=n,
        iters=_PR_ITERS,
        damping=_PR_DAMPING,
        id_col="id",
    )
    return ranks.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("pagerank")
    )


_PQ_M = 8
_PQ_CODES = 16
_PQ_SUB = _EMB_DIM // _PQ_M


@register(
    "pq_encode_stats",
    sql=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sd AS (SELECT CAST(vec_id % {_PQ_CODES} AS INT) AS c, MIN(vec_id) AS sid
           FROM v GROUP BY 1),
    cb AS (SELECT sd.c, list_transform(v.e, x -> round(x, 6)) AS ce
           FROM sd JOIN v ON v.vec_id = sd.sid),
    ss AS (SELECT unnest(range(0, {_PQ_M})) AS s),
    d AS (
        SELECT v.vec_id, ss.s, cb.c,
               round(list_dot_product(v.e[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}],
                                      v.e[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}])
                     - 2 * list_dot_product(v.e[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}],
                                            cb.ce[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}])
                     + list_dot_product(cb.ce[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}],
                                        cb.ce[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}]),
                     6) AS d
        FROM v CROSS JOIN ss CROSS JOIN cb
    ),
    b AS (
        SELECT vec_id, s, c, d,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        FROM d
    )
    SELECT vec_id, string_agg(CAST(c AS VARCHAR), ',' ORDER BY s) AS codes,
           SUM(CAST(round(d * 1000000, 0) AS BIGINT)) / 1000000.0 AS recon_err
    FROM b WHERE rn = 1 GROUP BY vec_id
    """,
)
def pq_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Product quantization encode (Jégou et al. TPAMI'11): each
    64-dim vector becomes m=8 sub-vector codes against 16-entry seeded
    codebooks plus its summed reconstruction error — the memory half of
    IVF-PQ (``ivf_index_build`` is the routing half): codes shrink a
    100 TB float corpus ~32x so ADC scans touch bytes, not floats. ONE
    linear mapInPandas scan, codebooks broadcast in the closure, one
    einsum per Arrow batch (``ext/similarity.pq_encode``); seeded (not
    Lloyd-refined) codebooks keep the whole encode SQL-replayable —
    production refines per-subspace with ``ext/cluster``."""
    from dvh_airflow_kafka_spark.ext import similarity as xsim2

    emb = load_table(spark, sf_dir, "embeddings")
    cb = xsim2.pq_seed_codebooks(emb, "vec_id", "embedding", n_codes=_PQ_CODES)
    enc = xsim2.pq_encode(emb, cb, m=_PQ_M)
    # comma-joined codes keep the driver's sorted-column compare hashable
    # (array cells break pandas lexsort); the values are unchanged.
    return enc.withColumn(
        "codes",
        F.array_join(
            F.expr("transform(codes, x -> cast(x as string))"), ","
        ),
    )


def _l2_micro_sql(a: str, b: str) -> str:
    """Rounded squared-L2 distance as an EXACT BIGINT in micro-units —
    the shared cross-engine distance idiom of the PQ family."""
    return (
        f"CAST(round(round(list_dot_product({a}, {a})"
        f" - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}), 6) * 1000000, 0) AS BIGINT)"
    )


def _pq_sub_slice(col: str) -> str:
    return f"{col}[ss.s*{_PQ_SUB}+1 : ss.s*{_PQ_SUB}+{_PQ_SUB}]"


_PQ_ADC_SQL = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sd AS (SELECT CAST(vec_id % {_PQ_CODES} AS INT) AS c, MIN(vec_id) AS sid
           FROM v GROUP BY 1),
    cb AS (SELECT sd.c, list_transform(v.e, x -> round(x, 6)) AS ce
           FROM sd JOIN v ON v.vec_id = sd.sid),
    ss AS (SELECT unnest(range(0, {_PQ_M})) AS s),
    d AS (
        SELECT v.vec_id, ss.s, cb.c,
               round(list_dot_product({_pq_sub_slice('v.e')}, {_pq_sub_slice('v.e')})
                     - 2 * list_dot_product({_pq_sub_slice('v.e')}, {_pq_sub_slice('cb.ce')})
                     + list_dot_product({_pq_sub_slice('cb.ce')}, {_pq_sub_slice('cb.ce')}),
                     6) AS d
        FROM v CROSS JOIN ss CROSS JOIN cb
    ),
    b AS (
        SELECT vec_id, s, c,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        FROM d
    ),
    q AS (SELECT vec_id AS qid, e FROM v WHERE vec_id < 10),
    qd AS (
        SELECT q.qid, ss.s, cb.c,
               CAST(round(round(
                   list_dot_product({_pq_sub_slice('q.e')}, {_pq_sub_slice('q.e')})
                   - 2 * list_dot_product({_pq_sub_slice('q.e')}, {_pq_sub_slice('cb.ce')})
                   + list_dot_product({_pq_sub_slice('cb.ce')}, {_pq_sub_slice('cb.ce')}),
                   6) * 1000000, 0) AS BIGINT) AS dm
        FROM q CROSS JOIN ss CROSS JOIN cb
    ),
    adc0 AS (
        SELECT qd.qid, b.vec_id AS nid, SUM(qd.dm) AS dist
        FROM b JOIN qd ON qd.s = b.s AND qd.c = b.c
        WHERE b.rn = 1 AND b.vec_id <> qd.qid
        GROUP BY qd.qid, b.vec_id
    ),
    adct AS (
        SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
            FROM adc0) x WHERE rn <= 5
    ),
    ex0 AS (
        SELECT q.qid, v.vec_id AS nid, {_l2_micro_sql('v.e', 'q.e')} AS dist
        FROM q CROSS JOIN v WHERE v.vec_id <> q.qid
    ),
    ext AS (
        SELECT qid, nid FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
            FROM ex0) y WHERE rn <= 5
    )
    SELECT e.qid AS query_id, CAST(COUNT(a.nid) AS INT) AS hits_at_5
    FROM (SELECT DISTINCT qid FROM ext) e
    LEFT JOIN (
        SELECT adct.qid, adct.nid FROM adct
        JOIN ext ON adct.qid = ext.qid AND adct.nid = ext.nid) a
      ON a.qid = e.qid
    GROUP BY e.qid
    """


@register("pq_adc_recall", sql=_PQ_ADC_SQL)
def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Asymmetric-distance (ADC) recall audit for the PQ codes —
    the quality gate on ``pq_encode_stats``, mirroring what
    ``ann_recall_at_k`` does for SRP-LSH: per query (vec_id < 10) the
    ADC top-5 over PQ CODES (one linear scan of the codes frame, m
    table lookups per vector — never touching the float corpus) is
    intersected with the exact squared-L2 top-5 (one linear corpus
    scan). Distances are exact integer micro-units end-to-end on both
    engines, so even rank boundaries are bit-deterministic. Heavy by
    construction (it runs the pipeline under test AND its baseline);
    a verification harness, not a production path."""
    from dvh_airflow_kafka_spark.ext import similarity as xsim2

    emb = load_table(spark, sf_dir, "embeddings")
    cb = xsim2.pq_seed_codebooks(emb, "vec_id", "embedding", n_codes=_PQ_CODES)
    codes = xsim2.pq_encode(emb, cb, m=_PQ_M).select("vec_id", "codes")
    qdf = emb.filter(F.col("vec_id") < 10)
    q_ids, q_mat = xsim2._collect_matrix(qdf, "vec_id", "embedding")
    adc = xsim2.pq_adc_topk(codes, cb, q_ids, q_mat, m=_PQ_M, k=5)
    exact = xsim2.brute_force_topk_l2(emb, qdf, k=5)
    hits = (
        adc.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__h"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("__h"), F.lit(0)).cast("int").alias("hits_at_5"),
        )
    )


_IVFPQ_INDEX_PATH = (
    f"/tmp/dvh_ivfpq_index_{__import__('os').getpid()}.parquet"
)
_IVFPQ_PROBES_PATH = (
    f"/tmp/dvh_ivfpq_probes_{__import__('os').getpid()}.parquet"
)
_IVFPQ_DTAB_PATH = (
    f"/tmp/dvh_ivfpq_dtab_{__import__('os').getpid()}.parquet"
)
# generate_subscripts is 1-based; dtab's mi is 0-based.  Pure int64
# arithmetic end-to-end — this replay is BIT-exact, no float caveat.
_IVFPQ_ANN_SQL = f"""
    WITH idx AS (
        SELECT vec_id, __list, codes
        FROM read_parquet('{_IVFPQ_INDEX_PATH}/*.parquet')
    ), p AS (
        SELECT query_id, __list
        FROM read_parquet('{_IVFPQ_PROBES_PATH}/*.parquet')
    ), t AS (
        SELECT query_id, mi, code, d_micro
        FROM read_parquet('{_IVFPQ_DTAB_PATH}/*.parquet')
    ), cand AS (
        SELECT p.query_id, idx.vec_id AS neighbor_id, idx.codes
        FROM p JOIN idx USING (__list)
        WHERE idx.vec_id <> p.query_id
    ), expl AS (
        SELECT query_id, neighbor_id,
               unnest(codes) AS code,
               generate_subscripts(codes, 1) - 1 AS mi
        FROM cand
    ), dist AS (
        SELECT e.query_id, e.neighbor_id,
               CAST(SUM(t.d_micro) AS BIGINT) AS dist_micro
        FROM expl e
        JOIN t ON t.query_id = e.query_id
              AND t.mi = e.mi AND t.code = e.code
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, dist_micro,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist_micro, neighbor_id)
                AS BIGINT) AS rank
    FROM dist
    QUALIFY rank <= 5
    """


@register("ivf_pq_ann_topk", sql=_IVFPQ_ANN_SQL)
def ivf_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] IVF-PQ approximate top-k — the full production ANN
    configuration: IVF coarse routing bounds WHICH vectors a query
    touches (n_probe/n_lists of the corpus), PQ codes bound WHAT the hot
    loop reads per touched vector (m small ints — the float corpus is
    never rejoined after the single index-build scan). Runs entirely in
    L2 over L2-normalized vectors, where squared-L2 ranking == cosine
    ranking. Codebooks are Lloyd-REFINED per subspace (2 distributed
    iterations, ``pq_refine_codebooks``) — the production configuration.
    Upgraded rows-only → PARTIAL oracle: the quantizer/codebook training
    stays engine-side, its three kernel frames (codes index, probe set,
    per-query integer ADC sub-distance tables) stage to per-process
    parquet, and DuckDB replays the ENTIRE query-time path — probe
    equi-join, ADC as m exact-int64 table-lookup sums, (dist, id) top-5
    — BIT-exactly from the same bytes (pure integer arithmetic).
    Full-probe == exhaustive-ADC equivalence additionally pytest-pinned
    for both seeded and refined codebooks."""
    from dvh_airflow_kafka_spark.ext import similarity as xsim2

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    index, probes, dtab = xsim2.ivf_pq_kernel_frames(
        emb,
        queries,
        n_lists=16,
        n_probe=4,
        m=_PQ_M,
        n_codes=_PQ_CODES,
        refine_iters=2,
    )
    _stage_frame(index, _IVFPQ_INDEX_PATH, sf_dir)
    _stage_frame(probes, _IVFPQ_PROBES_PATH, sf_dir)
    _stage_frame(dtab, _IVFPQ_DTAB_PATH, sf_dir)
    return xsim2.ivf_pq_topk_from_index(
        spark.read.parquet(_IVFPQ_INDEX_PATH),
        spark.read.parquet(_IVFPQ_PROBES_PATH),
        spark.read.parquet(_IVFPQ_DTAB_PATH),
        k=5,
    ).select(
        "query_id",
        "neighbor_id",
        "dist_micro",
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "incremental_near_dup_ingest",
    sql=r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS wl FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(wl) >= 3
                   THEN list_transform(range(1, len(wl) - 1),
                                       i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
                   ELSE [array_to_string(wl, ' ')] END) AS s
        FROM w
    ), inv AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), i AS (SELECT doc_id, g FROM inv WHERE doc_id % 5 = 0),
    e AS (SELECT doc_id, g FROM inv WHERE doc_id % 5 <> 0),
    shared AS (
        SELECT i.doc_id AS in_id, e.doc_id AS ex_id, count(*) AS c
        FROM i JOIN e ON i.g = e.g
        GROUP BY i.doc_id, e.doc_id
    ), sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    best AS (
        SELECT in_id, MAX(CAST(c AS DOUBLE) / (na.n + nb.n - c)) AS mx
        FROM shared
        JOIN sizes na ON na.doc_id = in_id
        JOIN sizes nb ON nb.doc_id = ex_id
        GROUP BY in_id
    )
    SELECT sh.doc_id,
           COALESCE(b.mx, 0.0) AS max_jaccard,
           CAST(COALESCE(b.mx, 0.0) < 0.4 AS INT) AS kept
    FROM sh LEFT JOIN best b ON b.in_id = sh.doc_id
    WHERE sh.doc_id % 5 = 0
    """,
)
def incremental_near_dup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Ingest-time NEAR-dup gate: an incoming batch (doc_id % 5 ==
    0, ~20% of the corpus) is admitted doc-by-doc only if its exact
    3-gram Jaccard against the EXISTING corpus stays below 0.4 — the
    LLM-corpus analogue of the reference's insert-time exact anti-join
    (J1), upgraded from hash equality to similarity. The candidate join
    is DIRECTIONAL (incoming shingles probe existing buckets only), so a
    small batch against a 100 TB corpus pays batch-sized bucket probes,
    never corpus pairs; ``ext/dedup.jaccard_ingest_gate`` documents the
    hot-shingle cap bolt-on. Jaccard stays an exact integer ratio
    (correctly-rounded IEEE division — bit-identical cross-engine, no
    rounding step needed)."""
    docs = load_table(spark, sf_dir, "documents")
    return xdedup.jaccard_ingest_gate(
        docs,
        "doc_id",
        "text",
        incoming_pred=F.col("doc_id") % 5 == 0,
        ngram=3,
        threshold=0.4,
    )


@register(
    "knn_label_accuracy",
    sql=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    tr AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
    te AS (SELECT * FROM v WHERE vec_id % 5 = 0),
    d AS (
        SELECT te.vec_id AS qid, te.label AS true_label,
               tr.vec_id AS nid, tr.label AS nlabel,
               {_l2_micro_sql('te.e', 'tr.e')} AS dist
        FROM te CROSS JOIN tr
    ),
    top AS (
        SELECT qid, true_label, nlabel FROM (
            SELECT qid, true_label, nlabel,
                   row_number() OVER (PARTITION BY qid ORDER BY dist, nid)
                       AS rn
            FROM d) x WHERE rn <= 5
    ),
    votes AS (
        SELECT qid, true_label, nlabel, COUNT(*) AS c
        FROM top GROUP BY qid, true_label, nlabel
    ),
    pred AS (
        SELECT qid, true_label, nlabel AS pred_label FROM (
            SELECT qid, true_label, nlabel,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY c DESC, nlabel) AS rn
            FROM votes) y WHERE rn = 1
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS INT) AS n_test,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS INT) AS n_correct
    FROM pred GROUP BY true_label
    """,
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Embedding-quality eval: 5-NN majority-vote label
    classification of a held-out test split (vec_id % 5 == 0) against
    the training split, reported as per-label test counts and correct
    predictions — the standard quick probe of whether an embedding
    space separates classes (the eval loop a training-data pipeline
    runs after re-embedding). Distances ride the exact integer
    micro-unit machinery of the PQ family (``brute_force_topk_l2``:
    query matrix broadcast, ONE linear train-corpus scan, lossless
    per-batch prune); majority vote breaks ties by (count desc, label
    asc) so the whole chain is bit-deterministic cross-engine."""
    from dvh_airflow_kafka_spark.ext import similarity as xsim2

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    top = xsim2.brute_force_topk_l2(train, test, k=5)
    labels = emb.select(F.col("vec_id"), F.col("label"))
    votes = (
        top.join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nlabel")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.col("nlabel").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nlabel").alias("pred_label"))
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(truth, "query_id")
        .groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_test"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("int")
            .alias("n_correct"),
        )
    )


# Staged-bytes partial oracle for the BPE learner (round 13 — the last
# rows-only query promoted to hash certification, VERDICT r12 ask #6):
# the greedy piece-rewrite between iterations has no SQL form, but the
# merge SELECTION does — each accepted iteration's aggregated pair-count
# table (bounded by symbol-vocab², corpus-size-independent) stages to
# parquet with an ``iter`` column, and DuckDB replays the argmax
# (count DESC, pair ASC — the Sennrich tie-break this repo pins) over
# the same bytes.  Counts are exact integer sums, so the engine's live
# argmax and the oracle's round-tripped one agree bit-for-bit.
_BPE_MERGE_PAIRS_PATH = (
    f"/tmp/dvh_bpe_merge_pairs_{__import__('os').getpid()}.parquet"
)

_BPE_MERGES_ORACLE_SQL = f"""
    WITH p AS (
        SELECT iter, a, b, c,
               row_number() OVER (PARTITION BY iter
                                  ORDER BY c DESC, a, b) AS rn
        FROM read_parquet('{_BPE_MERGE_PAIRS_PATH}/*.parquet')
    )
    SELECT CAST(iter AS INT) AS rank, a AS "left", b AS "right",
           CAST(c AS BIGINT) AS pair_count
    FROM p WHERE rn = 1
"""


def _staged_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the learner once per (path, sf_dir), staging each accepted
    iteration's pair-count table; returns the staged frame."""
    import atexit
    import os
    import shutil
    import tempfile

    from dvh_airflow_kafka_spark.catalog._core import _STAGED_LINKS

    link = _BPE_MERGE_PAIRS_PATH
    key = os.path.abspath(sf_dir)
    if _STAGED_LINKS.get(link) != key:
        stage = tempfile.mkdtemp(prefix="dvh_stage_")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        target = os.path.join(stage, "data")

        def cap(it: int, pairs: DataFrame) -> None:
            # append-mode: every iteration lands flat in one dir, each
            # row carrying its ``iter`` — one glob serves both engines
            pairs.withColumn("iter", F.lit(it)).write.mode(
                "append"
            ).parquet(target)

        docs = load_table(spark, sf_dir, "documents")
        xtext.bpe_learn_merges(docs, "text", n_merges=8, capture=cap)
        if os.path.isdir(link) and not os.path.islink(link):
            shutil.rmtree(link)
        tmplink = os.path.join(stage, "link")
        os.symlink(target, tmplink)
        os.replace(tmplink, link)
        atexit.register(
            lambda p=link: os.path.islink(p) and os.remove(p)
        )
        _STAGED_LINKS[link] = key
    return spark.read.parquet(link)


@register("bpe_learn_merges_table", sql=_BPE_MERGES_ORACLE_SQL)
def bpe_learn_merges_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distributed BPE merge LEARNING (Sennrich et al. ACL'16
    §3.2) over the corpus — the training-side counterpart of the merge
    APPLICATION ops (`bpe_encode_stats` etc.): the first 8 learned
    merges with their weighted pair counts. ONE corpus aggregate builds
    the word-frequency table; every iteration then runs on that COMPACT
    table (bounded by vocabulary, not corpus — the reason production
    BPE trainers work from word-count dicts), with a 1-row TakeOrdered
    collect per merge. PARTIAL oracle via the staged-bytes pattern
    (round 13): each accepted iteration's pair-count aggregate stages to
    parquet and DuckDB replays the merge selection (count DESC, pair
    ASC) from the same bytes — the greedy rewrite engine-side, the
    selection cross-engine.  The learner stays pytest-pinned against a
    pure-Python reference implementation on a hand-built corpus, the
    staged argmax against the learner's own merge list
    (``tests/test_text_bpe.py``), and learned merges feed
    ``bpe_encode_udf`` end-to-end under the rejoin invariant."""
    staged = _staged_bpe_merge_pairs(spark, sf_dir)
    w = Window.partitionBy("iter").orderBy(
        F.col("c").desc(), F.col("a"), F.col("b")
    )
    return (
        staged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("iter").cast("int").alias("rank"),
            F.col("a").alias("left"),
            F.col("b").alias("right"),
            F.col("c").cast("long").alias("pair_count"),
        )
    )


_PRIORITY_K = 20
_PRIORITY_SALT = "prio-v1"


@register(
    "weighted_priority_sample",
    sql=f"""
    WITH h AS (
        SELECT source, doc_id, GREATEST(n_chars, 1) AS weight,
               ('0x' || substr(sha256('{_PRIORITY_SALT}'
                                      || CAST(doc_id AS VARCHAR)), 1, 8)
               )::BIGINT AS hv
        FROM documents
    ),
    p AS (
        SELECT source, doc_id, weight,
               (weight * 4294967296) // (hv + 1) AS priority
        FROM h
    )
    SELECT source, doc_id, weight, priority,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY priority DESC, doc_id) AS INT)
               AS rank
    FROM p QUALIFY rank <= {_PRIORITY_K}
    """,
)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Priority sampling (Duffield, Lund, Thorup, JACM'07): keep
    the top-20 docs per source by priority w/u, u a
    deterministic sha-derived uniform — the weight-proportional corpus
    subsample whose estimators are provably near-optimal. The priority
    is EXACT integer arithmetic (w * 2^32 div (h+1), h the 8-hex sha
    prefix) — bit-identical across engines, no float ordering anywhere.
    Scan-fused expressions + ONE source-keyed window; at 100 TB the
    per-source top-k runs as rank-limited window groups (WindowGroupLimit
    pushes the k cutoff map-side), never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.lit(_PRIORITY_SALT), F.col("doc_id").cast("string")
                ),
                256,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    return (
        docs.select(
            "source",
            "doc_id",
            F.greatest(F.col("n_chars"), F.lit(1)).alias("weight"),
            h.alias("__hv"),
        )
        .withColumn(
            "priority",
            F.expr("weight * 4294967296 DIV (__hv + 1)"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _PRIORITY_K)
        .select("source", "doc_id", "weight", "priority", "rank")
    )


