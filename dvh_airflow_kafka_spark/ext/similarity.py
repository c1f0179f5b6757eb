"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact top-k cosine — the correctness baseline.
  The (small) query side ships as a broadcast numpy matrix; the corpus is
  scanned ONCE by an Arrow-batched ``mapInPandas`` doing a single numpy
  matmul per batch, with per-batch exact top-k pruning so only
  O(partitions × |queries| × k) rows ever reach the final shuffle.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (SRP) LSH.
  Each vector gets a compact bucket id per hash table (sign bits of H
  seeded hyperplane projections, folded into a long); candidates are
  equi-joined per (table, bucket) and only candidates pay the exact
  cosine. At 100 TB the corpus is hashed once (linear scan, no shuffle
  beyond the candidate join) and queries touch ~|corpus| / 2^H vectors
  per table instead of the whole corpus.

Vector math policy: every dot product / projection runs as a vectorized
numpy matmul inside an Arrow-batched pandas UDF — Catalyst's higher-order
``aggregate``/``zip_with`` lambdas execute in the *interpreted* eval path
per array element (~17 ms/row for 32 projections at dim 64), which is a
CPU-bound scale-killer on a 100 TB corpus scan. One matmul per Arrow batch
is ~3 orders of magnitude cheaper.

Determinism policy: numpy (pairwise) and SQL-engine (left-to-right fold)
float summation orders differ in the last ulps, so every emitted cosine is
rounded to ``ROUND_DIGITS`` decimals and thresholds/rankings are applied to
the ROUNDED value — DuckDB oracles round identically, making results
hash-stable across engines.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Cosines are compared/ranked at this precision on BOTH engines; 1e-6 is
# far above double-matmul noise (~1e-15) and far below any semantic
# distinction between similarity scores.
ROUND_DIGITS = 6


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict left-to-right double fold. Interpreted eval —
    fine for one-off scalar checks, NEVER for a corpus scan (use the
    pandas-UDF paths below on any hot path)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _vstack(series: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in series])


@F.pandas_udf(T.DoubleType())
def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized per-row cosine of two array columns: one einsum per
    Arrow batch, rounded to ROUND_DIGITS. The hot-path replacement for
    the interpreted ``cosine`` Column fold."""
    if len(a) == 0:
        return pd.Series(np.empty(0, dtype=np.float64))
    A, B = _vstack(a), _vstack(b)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(np.round(num / np.where(den == 0.0, 1.0, den), ROUND_DIGITS))


def _collect_matrix(
    df: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side collect of the SMALL side (query/probe vectors) into an
    id vector + row matrix — the numpy analogue of ``F.broadcast``. The
    corpus side is never collected."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(n == 0.0, 1.0, n)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: Optional[str] = None,
    same_label: Optional[bool] = None,
) -> DataFrame:
    """Exact top-k neighbours (cosine) of each query vector against the
    corpus, self-matches excluded. Output: (query_id, neighbor_id, cosine,
    rank) plus ``neighbor_label`` when ``label_col`` is given.

    ``label_col`` + ``same_label`` restrict the candidate pool by class
    label BEFORE ranking — ``same_label=False`` is contrastive-learning
    hard-NEGATIVE mining (nearest vectors of a *different* class),
    ``same_label=True`` mines hard positives (farthest-ranked matches of
    the *same* class are the informative ones). ``None`` = no restriction.

    Plan shape: query matrix broadcast in the UDF closure → ONE linear
    corpus scan (mapInPandas, numpy matmul per Arrow batch) → per-batch
    exact top-k prune (ordered by rounded cosine desc, id asc — identical
    to the final ordering, so pruning is lossless) → tiny final window.
    No join, no BroadcastNestedLoopJoin, no quadratic shuffle."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    qn = _normalize(q_mat).T  # (dim, nq)
    nq = len(q_ids)
    q_labels: Optional[np.ndarray] = None
    if label_col is not None and same_label is not None:
        rows = queries.select(id_col, label_col).collect()
        by_id = {int(r[0]): r[1] for r in rows}
        q_labels = np.array([by_id[int(i)] for i in q_ids])

    fields = [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
    if label_col is not None:
        fields.append(T.StructField("neighbor_label", T.LongType()))
    out_schema = T.StructType(fields)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            labs = (
                pdf[label_col].to_numpy() if label_col is not None else None
            )
            sims = np.round(_normalize(_vstack(pdf[vec_col])) @ qn, ROUND_DIGITS)
            frames = []
            for j in range(nq):
                s = sims[:, j]
                mask = ids != q_ids[j]
                if q_labels is not None:
                    if same_label:
                        mask &= labs == q_labels[j]
                    else:
                        mask &= labs != q_labels[j]
                keep = np.nonzero(mask)[0]
                if keep.size == 0:
                    continue
                # exact (value desc, id asc) order => lossless local prune
                order = np.lexsort((ids[keep], -s[keep]))[:k]
                sel = keep[order]
                frame = {
                    "query_id": q_ids[j],
                    "neighbor_id": ids[sel],
                    "cosine": s[sel],
                }
                if labs is not None:
                    frame["neighbor_label"] = labs[sel].astype(np.int64)
                frames.append(pd.DataFrame(frame))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pruned = ensure_parallelism(emb).mapInPandas(scan, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return pruned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _kmeans_cosine(
    sample: np.ndarray, n_lists: int, seed: int, max_iter: int = 10
) -> np.ndarray:
    """Tiny deterministic spherical k-means on a driver-side sample —
    the IVF coarse quantizer (Jégou et al., 'Product Quantization for
    Nearest Neighbor Search', TPAMI'11 — the IVF-Flat part). Centroids
    are L2-normalized so nearest-centroid-by-dot == nearest-by-cosine."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample)
    # k-means++ seeding (Arthur & Vassilvitskii, SODA'07): next centroid
    # drawn ∝ squared cosine distance to the nearest chosen one — far
    # better separated than uniform picks, and robust to the order of
    # the training sample.
    idx = [int(rng.randint(len(x)))]
    d2 = np.maximum(0.0, 1.0 - x @ x[idx[0]]) ** 2
    for _ in range(1, min(n_lists, len(x))):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = int(rng.choice(len(x), p=p))
        idx.append(nxt)
        d2 = np.minimum(d2, np.maximum(0.0, 1.0 - x @ x[nxt]) ** 2)
    cents = x[idx].copy()
    for _ in range(max_iter):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
            else:
                # reseed a starved list to the overall worst-served point
                cents[j] = x[int(sims.max(axis=1).argmin())]
        cents = _normalize(cents)
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """Pandas UDF: vector -> index of the nearest (cosine) centroid.
    One matmul per Arrow batch; the centroid matrix ships in the closure
    (the numpy analogue of a broadcast variable)."""
    cents = centroids.T  # (dim, n_lists)

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(
            (_normalize(_vstack(v)) @ cents).argmax(axis=1).astype(np.int32)
        )

    return assign


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """IVF-Flat approximate top-k — the second ANN scale path beside
    SRP-LSH (``lsh_bucketed_topk``).

    Plan shape: (1) train a spherical-k-means coarse quantizer on a
    driver-side sample; (2) ONE linear corpus pass assigns every vector
    its inverted-list id (pandas-UDF matmul — no shuffle, the vector
    stays in its row); (3) each query probes its ``n_probe`` nearest
    lists (driver-side — |queries| is the small side); (4) candidates =
    broadcast equi-join on list id, exact-cosine re-rank, per-query
    window top-k. Each query touches ~n_probe/n_lists of the corpus, so
    at 100 TB the scan is the assignment pass (IO-bound) and the probe
    work shrinks by the fan-out ratio."""
    corpus, probe_df = ivf_partition(
        emb,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        n_lists=n_lists,
        n_probe=n_probe,
        sample_size=sample_size,
        seed=seed,
        with_vectors=True,
    )
    return ivf_topk_from_lists(
        corpus, probe_df, emb, queries, k=k, id_col=id_col, vec_col=vec_col
    )


def ivf_partition(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
    with_vectors: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """IVF-Flat kernel outputs: the corpus inverted-list assignment frame
    ``(__id, __list)`` and the per-query probe set ``(query_id, __list)``.
    The k-means quantizer and nearest-centroid argmax are the only
    non-relational pieces of the pipeline; everything downstream (the
    probe equi-join — the actual partition-pruning scale mechanism — and
    the exact-cosine re-rank) is relational, so catalog queries stage
    these two frames and a DuckDB oracle replays the downstream from the
    same bytes.  ``with_vectors=True`` keeps the vector on the assignment
    row (one fused corpus scan — the non-staged hot path)."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    # Deterministic training sample: bare limit() is partition-order
    # dependent (different centroids every run); ordering by the hashed
    # id plans as TakeOrderedAndProject — per-partition top-n + driver
    # merge, no global sort shuffle — so the quantizer is reproducible
    # on any cluster at any parallelism.
    sample = np.array(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in emb.select(
                F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__o")
            )
            .orderBy("__o")
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ]
    )
    cents = _kmeans_cosine(sample, n_lists, seed)
    assign = ivf_assign_udf(cents)

    cols = [
        F.col(id_col).alias("__id"),
        assign(F.col(vec_col)).alias("__list"),
    ]
    if with_vectors:
        cols.insert(1, F.col(vec_col).cast("array<double>").alias("__nv"))
    corpus = ensure_parallelism(emb).select(*cols)

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    probes = np.argsort(-(_normalize(q_mat) @ cents.T), axis=1)[:, :n_probe]
    probe_rows = [
        (int(qid), int(lst)) for qid, row in zip(q_ids, probes) for lst in row
    ]
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probe_rows, "query_id long, __list int")
    return corpus, probe_df


def ivf_topk_from_lists(
    corpus_assign: DataFrame,
    probe_df: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Relational downstream of IVF-Flat: broadcast probe equi-join on
    list id, self-match filter, exact-cosine re-rank (rounded — ranking
    happens on the rounded value, see module docstring), per-query window
    top-k.  ``corpus_assign`` is an ``ivf_partition`` frame; when it does
    not already carry the vector (``__nv`` — e.g. it was re-read from a
    staged parquet), vectors are re-attached from ``emb`` by id."""
    corpus = corpus_assign.select(
        F.col("__id").alias("neighbor_id"),
        *(["__nv"] if "__nv" in corpus_assign.columns else []),
        "__list",
    )
    if "__nv" not in corpus.columns:
        corpus = corpus.join(
            emb.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__nv"),
            ),
            "neighbor_id",
        )
    query_v = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cands = (
        corpus.join(F.broadcast(probe_df), "__list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(query_v), "query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("__qv"), F.col("__nv")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_bits, dim))


def srp_buckets_udf(planes: np.ndarray):
    """Pandas UDF computing ALL tables' SRP bucket ids in one matmul:
    vectors (B, dim) @ planes.T (dim, n_tables·n_bits) → sign bits →
    bit-packed long per table. Returns array<long> of length n_tables.

    Replaces the per-bit Column construction (n_tables×n_bits interpreted
    higher-order folds + thousands of plan literals) with one Arrow-batched
    BLAS call — the difference between ~17 ms/row and ~µs/row on the
    corpus hashing pass that dominates at 100 TB."""
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim).astype(np.float64)
    weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        # round the projection before the sign test: BLAS matmul summation
        # order can differ from an oracle's sequential dot product in the
        # last ulp, so an exactly-orthogonal vector (true projection 0)
        # could flip a bucket bit nondeterministically; at 6 digits both
        # engines see the same 0. Mirrored by round(list_dot_product, 6)
        # in every oracle SQL that replays these planes.
        bits = np.round(_vstack(v) @ flat.T, 6) > 0  # (B, n_tables*n_bits)
        packed = (
            bits.reshape(len(v), n_tables, n_bits).astype(np.int64) * weights
        ).sum(axis=2)
        return pd.Series(list(packed))

    return buckets


def srp_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Single-table SRP bucket as a Column expression (interpreted HOF
    path) — retained for plan-free scalar checks; hot paths use
    ``srp_buckets_udf``."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(
            F.round(proj, 6) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return bucket


def _probe_masks(n_bits: int, max_hamming: int) -> list[int]:
    """All XOR masks with popcount <= max_hamming — the multi-probe
    perturbation set (Lv et al., 'Multi-Probe LSH', VLDB'07). Probing
    near-miss buckets trades a small candidate-set growth (sum C(n_bits,i))
    for a large recall gain: a neighbour at angle θ agrees with the query
    on each bit w.p. 1-θ/π, so requiring ALL n_bits to agree is
    exponentially lossy while allowing <=m flips is not."""
    return [m for m in range(1 << n_bits) if bin(m).count("1") <= max_hamming]


def srp_bucket_frame(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """SRP kernel output: one ``(__id, __table, __bucket)`` row per vector
    per hash table — the ONLY non-relational piece of the LSH pipeline (a
    seeded numpy matmul sign-fold inside a pandas UDF).  Everything
    downstream (multi-probe expansion, candidate equi-join, exact-cosine
    re-rank, top-k) is pure relational algebra; catalog queries stage this
    frame to parquet so a DuckDB oracle can replay that downstream exactly
    from the same bytes (see ``catalog.lsh_ann_topk``)."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    buckets = srp_buckets_udf(planes)
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(buckets(F.col(vec_col))).alias("__table", "__bucket"),
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    probe_hamming: int = 2,
    corpus_buckets: Optional[DataFrame] = None,
    query_buckets: Optional[DataFrame] = None,
) -> DataFrame:
    """Approximate top-k: SRP-LSH candidate generation + exact cosine
    re-rank. Candidates = vectors whose bucket is within ``probe_hamming``
    bit-flips of the query's bucket in ANY of ``n_tables`` tables
    (multi-probe). Only the QUERY side is expanded (x sum C(n_bits, <=m)
    probes) — the corpus is hashed exactly once per table (one pandas-UDF
    matmul pass), so the linear corpus scan that dominates at 100 TB stays
    IO-bound; recall rises from p^n_bits to
    P(Binomial(n_bits, p) >= n_bits-m) per table.

    ``corpus_buckets`` / ``query_buckets`` optionally inject precomputed
    ``srp_bucket_frame`` outputs (e.g. re-read from a staged parquet) in
    place of hashing here — the staged-partial-oracle hook."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    def bucketize(df: DataFrame, role: str) -> DataFrame:
        frame = srp_bucket_frame(
            df, id_col, vec_col, n_bits, n_tables, dim, seed
        )
        return _role_buckets(frame, role)

    def _role_buckets(frame: DataFrame, role: str) -> DataFrame:
        return frame.select(
            F.col("__id").alias(f"{role}_id"),
            F.col("__table").alias(f"__{role}_table"),
            F.col("__bucket").alias(f"__{role}_bucket"),
        )

    c = (
        _role_buckets(corpus_buckets, "neighbor")
        if corpus_buckets is not None
        else bucketize(ensure_parallelism(emb), "neighbor")
    )
    q = (
        _role_buckets(query_buckets, "query")
        if query_buckets is not None
        else bucketize(queries, "query")
    )
    if probe_hamming > 0:
        masks = F.array(*[F.lit(m) for m in _probe_masks(n_bits, probe_hamming)])
        q = q.select(
            "query_id",
            "__query_table",
            F.explode(masks).alias("__mask"),
            F.col("__query_bucket").alias("__qb"),
        ).select(
            "query_id",
            "__query_table",
            F.col("__qb").bitwiseXOR(F.col("__mask")).alias("__query_bucket"),
        )
    # distinct on ids only — vectors re-attached after dedup so the
    # exact-cosine re-rank computes once per (query, candidate)
    cand_ids = (
        c.join(
            F.broadcast(q),
            (F.col("__neighbor_table") == F.col("__query_table"))
            & (F.col("__neighbor_bucket") == F.col("__query_bucket")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    corpus_v = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    query_v = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cands = cand_ids.join(corpus_v, "neighbor_id").join(
        F.broadcast(query_v), "query_id"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("__qv"), F.col("__nv")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_embeddings_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q = sign(x)·⌊|x|·127/max|x|
    + 0.5⌋ (half-away-from-zero, pinned explicitly because numpy's default
    round is half-to-even while SQL engines round half-away — the floor
    form is bit-identical everywhere). Returns (id, q array<tinyint>,
    scale double) with scale = max|x|/127 for dequantization.

    Why: int8 vectors are 4× smaller than float32 — at 100 TB the ANN
    candidate re-rank becomes memory-bound, and integer dot products are
    EXACT (≤ 127²·dim fits long), so ranking is deterministic across
    engines and runs. One Arrow-batched linear pass, no shuffle."""

    @F.pandas_udf(T.StructType([
        T.StructField("q", T.ArrayType(T.ByteType())),
        T.StructField("scale", T.DoubleType()),
    ]))
    def quant(v: pd.Series) -> pd.DataFrame:
        qs, scales = [], []
        for vec in v:
            a = np.asarray(vec, dtype=np.float64)
            m = float(np.abs(a).max()) if a.size else 0.0
            if m > 0.0:
                q = (np.floor(np.abs(a) * 127.0 / m + 0.5) * np.sign(a)).astype(np.int8)
            else:
                q = np.zeros(a.size, dtype=np.int8)
            qs.append(q)
            scales.append(m / 127.0)
        return pd.DataFrame({"q": qs, "scale": scales})

    out = emb.select(F.col(id_col), quant(F.col(vec_col)).alias("__qs"))
    return out.select(
        id_col, F.col("__qs.q").alias("q"), F.col("__qs.scale").alias("scale")
    )


# --------------------------------------------------------------------------
# Persisted IVF index: build once, serve many (the production ANN shape)
# --------------------------------------------------------------------------


def ivf_index_build(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
) -> None:
    """Materialise the IVF index on disk: a ``centroids`` table
    (list_id, centroid) and an ``assignments`` table (id, vector,
    list_id) PARTITIONED BY list_id — so a probe reads only its lists'
    directories (partition pruning), not the corpus. This is the shape
    a production ANN service runs: the quantizer trains ONCE (the cost
    `ivf_topk` re-pays every call), appends reuse the stored centroids,
    and queries touch n_probe/n_lists of the data at parquet-directory
    granularity."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    spark = emb.sparkSession
    sample = np.array(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in emb.select(
                F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__o")
            )
            .orderBy("__o")
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ]
    )
    cents = _kmeans_cosine(sample, n_lists, seed)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assign = ivf_assign_udf(cents)
    (
        ensure_parallelism(emb)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
            assign(F.col(vec_col)).alias("list_id"),
        )
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/assignments")
    )


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Serve approximate top-k from a PERSISTED IVF index: load the
    centroids (tiny), pick each query's n_probe nearest lists
    driver-side, and scan only those ``list_id=`` partitions of the
    assignments table — the probe plan-prunes at the directory level
    (asserted in tests). No quantizer training, no corpus pass."""
    crows = sorted(
        (r.list_id, r.centroid)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    cents = _normalize(np.array([c for _, c in crows], dtype=np.float64))
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    probes = np.argsort(-(_normalize(q_mat) @ cents.T), axis=1)[:, :n_probe]
    probe_rows = [
        (int(qid), int(lst)) for qid, row in zip(q_ids, probes) for lst in row
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, list_id int")
    needed = sorted({p for _, p in probe_rows})
    assignments = spark.read.parquet(f"{path}/assignments").filter(
        F.col("list_id").isin(needed)  # partition-pruned scan
    )
    query_v = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cands = (
        assignments.join(F.broadcast(probe_df), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(query_v), "query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            pair_cosine(F.col("__qv"), F.col("vec")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid — 'Product Quantization for
# Nearest Neighbor Search', TPAMI 2011): split the vector into m subspaces,
# quantize each sub-vector to a tiny per-subspace codebook, store m small
# codes per vector. The memory side of IVF-PQ (ext: ``ivf_index_build`` is
# the routing side): 64 float32 dims (256 B) compress to m=8 uint4/uint8
# codes, so a 100 TB embedding corpus's quantized form fits hot storage and
# ADC distance scans touch codes, not floats.
# ---------------------------------------------------------------------------


def pq_seed_codebooks(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_codes: int = 16,
) -> np.ndarray:
    """Deterministic seeded codebooks: code c's centroid (in EVERY
    subspace) comes from the full vector of the MINIMUM id in residue
    class ``id % n_codes == c`` — a groupBy-min plus a bounded n_codes-row
    collect, the same seeding contract as ``ext/cluster``. Production
    refines each subspace's codebook with Lloyd iterations
    (``ext/cluster.kmeans_assignments`` per subspace); seeds keep the
    whole encode SQL-replayable cross-engine. Returns (n_codes, dim)
    float64 rounded to ROUND_DIGITS."""
    rows = (
        emb.groupBy((F.col(id_col) % n_codes).cast("int").alias("__c"))
        .agg(F.min(id_col).alias("__sid"))
        .join(emb, F.col("__sid") == F.col(id_col))
        .select("__c", vec_col)
        .collect()
    )
    by_c = {int(r["__c"]): np.asarray(r[vec_col], dtype=np.float64) for r in rows}
    return np.round(
        np.vstack([by_c[c] for c in sorted(by_c)]), ROUND_DIGITS
    )


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector: per subspace s (dim/m contiguous dims), pick
    ``argmin_c round(||x_s - cb[c]_s||^2, 6)`` (ties -> lowest code) and
    report the summed per-subspace error. ONE linear mapInPandas corpus
    scan, codebooks broadcast in the closure — no join, no shuffle;
    numpy does (batch, m, n_codes) distances in one einsum.

    The error sum runs in EXACT integer micro-units (the rounded
    distances are 6-decimal values, so x1e6 they are integers): a float
    sum re-rounded to 4 decimals hits exact .00005 ties where numpy
    rounds half-even and SQL engines half-away — integer summation has
    no tie to disagree on.

    Output: ``(id_col, codes array<int>, recon_err double, 6 dp)``."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    n_codes, dim = codebooks.shape
    sub = dim // m
    # (m, n_codes, sub)
    C = codebooks.reshape(n_codes, m, sub).transpose(1, 0, 2).copy()
    cc = np.einsum("mcs,mcs->mc", C, C)  # (m, n_codes)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("recon_err", T.DoubleType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _vstack(pdf[vec_col]).reshape(-1, m, sub)  # (n, m, sub)
            xx = np.einsum("nms,nms->nm", X, X)  # (n, m)
            xc = np.einsum("nms,mcs->nmc", X, C)  # (n, m, n_codes)
            d = np.round(
                xx[:, :, None] - 2.0 * xc + cc[None, :, :], ROUND_DIGITS
            )
            codes = np.argmin(d, axis=2)  # ties -> lowest code
            dsel = np.take_along_axis(d, codes[:, :, None], axis=2).squeeze(2)
            micro = np.rint(dsel * 1e6).astype(np.int64).sum(axis=1)
            err = micro / 1e6
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes.astype(np.int32)),
                    "recon_err": err,
                }
            )

    return ensure_parallelism(emb.select(id_col, vec_col)).mapInPandas(
        encode, schema=out_schema
    )


def brute_force_topk_l2(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by SQUARED L2 distance (the PQ/ADC metric — cosine's
    counterpart ``brute_force_topk`` serves the normalized-embedding
    paths). Same plan shape: query matrix broadcast in the closure, ONE
    linear corpus scan, lossless per-batch prune, tiny final window.

    Distances are rounded to ROUND_DIGITS then carried as EXACT integer
    micro-units (x1e6), ordering ties broken by id — bit-identical
    cross-engine, no float ordering anywhere downstream of the round.

    Output: ``(query_id, neighbor_id, dist_micro long, rank)``."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    qq = np.einsum("ij,ij->i", q_mat, q_mat)
    nq = len(q_ids)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("dist_micro", T.LongType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = _vstack(pdf[vec_col])
            xx = np.einsum("ij,ij->i", X, X)
            d = np.round(
                xx[:, None] - 2.0 * (X @ q_mat.T) + qq[None, :], ROUND_DIGITS
            )
            dm = np.rint(d * 1e6).astype(np.int64)
            frames = []
            for j in range(nq):
                keep = np.nonzero(ids != q_ids[j])[0]
                if keep.size == 0:
                    continue
                order = np.lexsort((ids[keep], dm[keep, j]))[:k]
                sel = keep[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids[sel],
                            "dist_micro": dm[sel, j],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pruned = ensure_parallelism(emb.select(id_col, vec_col)).mapInPandas(
        scan, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("neighbor_id").asc()
    )
    return pruned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    m: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou et al. TPAMI'11
    §IV.A): per query, an (m, n_codes) table of rounded sub-distances to
    every codebook entry is precomputed (tiny — broadcast in the
    closure), then ONE linear scan over the CODES frame sums m table
    lookups per vector. The scan never touches the float corpus — this
    is why PQ wins at 100 TB: the hot loop reads m small ints per
    vector. Distances are exact integer micro-units end-to-end.

    Output: ``(query_id, neighbor_id, dist_micro long, rank)``."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    n_codes, dim = codebooks.shape
    sub = dim // m
    C = codebooks.reshape(n_codes, m, sub).transpose(1, 0, 2).copy()
    cc = np.einsum("mcs,mcs->mc", C, C)
    Q = q_mat.reshape(len(q_ids), m, sub)
    qq = np.einsum("qms,qms->qm", Q, Q)
    qc = np.einsum("qms,mcs->qmc", Q, C)
    # (nq, m, n_codes) rounded sub-distance tables, micro-int
    dtab = np.rint(
        np.round(qq[:, :, None] - 2.0 * qc + cc[None, :, :], ROUND_DIGITS)
        * 1e6
    ).astype(np.int64)
    nq = len(q_ids)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("dist_micro", T.LongType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.vstack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )  # (n, m)
            # dist[n, q] = sum_s dtab[q, s, codes[n, s]] — per-query gather
            frames = []
            for j in range(nq):
                dj = dtab[j, np.arange(m)[None, :], codes].sum(axis=1)
                keep = np.nonzero(ids != q_ids[j])[0]
                if keep.size == 0:
                    continue
                order = np.lexsort((ids[keep], dj[keep]))[:k]
                sel = keep[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids[sel],
                            "dist_micro": dj[sel],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pruned = ensure_parallelism(codes_df.select(id_col, "codes")).mapInPandas(
        scan, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("neighbor_id").asc()
    )
    return pruned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def normalize_udf():
    """Pandas UDF: vector -> L2-normalized double vector (zero vectors
    pass through). One vectorized pass per Arrow batch."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def norm_vec(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        M = _normalize(_vstack(v))
        return pd.Series(list(M))

    return norm_vec


def _pq_tables(cb: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, cc): per-subspace codebook views and their squared norms."""
    n_codes, dim = cb.shape
    sub = dim // m
    C = cb.reshape(n_codes, m, sub).transpose(1, 0, 2).copy()
    cc = np.einsum("mcs,mcs->mc", C, C)
    return C, cc


def _adc_query_tables(
    Q: np.ndarray, C: np.ndarray, cc: np.ndarray
) -> np.ndarray:
    """(nq, m, n_codes) micro-int sub-distance tables for ADC."""
    m = C.shape[0]
    sub = C.shape[2]
    Qs = Q.reshape(len(Q), m, sub)
    qq = np.einsum("qms,qms->qm", Qs, Qs)
    qc = np.einsum("qms,mcs->qmc", Qs, C)
    return np.rint(
        np.round(qq[:, :, None] - 2.0 * qc + cc[None, :, :], ROUND_DIGITS)
        * 1e6
    ).astype(np.int64)


def _ivf_pq_index_pass(cents: np.ndarray, C: np.ndarray, cc: np.ndarray, m: int, id_col: str):
    """mapInPandas generator: normalized batch → (id, list id, PQ codes)."""
    centsT = cents.T
    sub = C.shape[2]

    def index_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _vstack(pdf["__nv"])
            lists = (X @ centsT).argmax(axis=1).astype(np.int32)
            Xs = X.reshape(-1, m, sub)
            xx = np.einsum("nms,nms->nm", Xs, Xs)
            xc = np.einsum("nms,mcs->nmc", Xs, C)
            d = np.round(
                xx[:, :, None] - 2.0 * xc + cc[None, :, :], ROUND_DIGITS
            )
            codes = np.argmin(d, axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "__list": lists,
                    "codes": list(codes.astype(np.int32)),
                }
            )

    return index_pass


def ivf_pq_index_build(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    refine_iters: int = 2,
) -> None:
    """Materialise the FULL production ANN index on disk — IVF routing +
    PQ codes, floats never stored: ``centroids`` (list_id, centroid),
    ``codebooks`` (code, centroid — Lloyd-refined), and ``codes``
    (vec_id, codes) PARTITIONED BY list_id. The quantizers train ONCE;
    appends reuse the stored centroids/codebooks; a probe reads
    n_probe/n_lists of the code partitions at parquet-directory
    granularity and each touched row is m small ints — at 100 TB the
    serving tier holds ~1/32 of the corpus bytes and never rejoins the
    float table. `ivf_index_build` is the Flat (float-retaining)
    sibling; this is what you deploy when memory is the constraint."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    spark = emb.sparkSession
    nv = normalize_udf()
    norm_emb = emb.select(F.col(id_col), nv(F.col(vec_col)).alias("__nv"))
    sample = np.array(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in emb.select(
                F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__o")
            )
            .orderBy("__o")
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ]
    )
    cents = _kmeans_cosine(sample, n_lists, seed)
    cb = pq_seed_codebooks(norm_emb, id_col, "__nv", n_codes)
    if refine_iters > 0:
        cb = pq_refine_codebooks(
            norm_emb, cb, m=m, iters=refine_iters, id_col=id_col, vec_col="__nv"
        )
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cb)],
        "code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    C, cc = _pq_tables(cb, m)
    (
        ensure_parallelism(norm_emb)
        .mapInPandas(
            _ivf_pq_index_pass(cents, C, cc, m, id_col),
            schema=T.StructType(
                [
                    T.StructField(id_col, T.LongType()),
                    T.StructField("__list", T.IntegerType()),
                    T.StructField("codes", T.ArrayType(T.IntegerType())),
                ]
            ),
        )
        .withColumnRenamed("__list", "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/codes")
    )


def ivf_pq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_probe: int = 4,
) -> DataFrame:
    """Serve approximate top-k from a PERSISTED IVF-PQ index: load the
    centroids and codebooks (tiny), route each query to its n_probe
    lists driver-side, scan ONLY those ``list_id=`` partitions of the
    codes table, and rank by ADC distance — m table lookups per touched
    row, exact integer micro-units, no quantizer training, no corpus
    pass, no float vectors anywhere in the serve path."""
    crows = sorted(
        (r.list_id, r.centroid)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )
    cents = np.array([c for _, c in crows], dtype=np.float64)
    cbrows = sorted(
        (r.code, r.centroid)
        for r in spark.read.parquet(f"{path}/codebooks").collect()
    )
    cb = np.array([c for _, c in cbrows], dtype=np.float64)
    C, cc = _pq_tables(cb, m)

    q_ids, q_raw = _collect_matrix(queries, id_col, vec_col)
    Q = _normalize(q_raw)
    probes = np.argsort(-(Q @ cents.T), axis=1)[:, :n_probe]
    probe_rows = [
        (int(qid), int(lst)) for qid, row in zip(q_ids, probes) for lst in row
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, list_id int")
    needed = sorted({p for _, p in probe_rows})
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("list_id").isin(needed)  # partition-pruned scan
    )
    dtab = _adc_query_tables(Q, C, cc)
    qpos = {int(q): i for i, q in enumerate(q_ids)}
    mm = m

    @F.pandas_udf(T.LongType())
    def adc_dist(qid: pd.Series, code_col: pd.Series) -> pd.Series:
        if len(qid) == 0:
            return pd.Series([], dtype="int64")
        cd = np.vstack([np.asarray(c, dtype=np.int64) for c in code_col])
        qi = qid.map(qpos).to_numpy(dtype=np.int64)
        return pd.Series(
            dtab[qi[:, None], np.arange(mm)[None, :], cd].sum(axis=1)
        )

    cands = codes.join(F.broadcast(probe_df), "list_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            adc_dist(F.col("query_id"), F.col("codes")).alias("dist_micro"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-PQ approximate top-k — the full production ANN configuration
    (Jégou et al. TPAMI'11): IVF coarse routing bounds WHICH vectors a
    query touches (~n_probe/n_lists of the corpus), PQ codes bound WHAT
    the hot loop reads per touched vector (m small ints, never floats).
    ``ivf_topk`` (IVF-Flat) and ``pq_adc_topk`` (exhaustive ADC) are its
    two halves; this composes them.

    Everything runs in L2 space over L2-NORMALIZED vectors, where
    squared-L2 ranking is exactly cosine ranking (|a-b|^2 = 2 - 2cos on
    unit vectors) — one metric end-to-end for routing, codes, and ADC.

    Plan shape: (1) spherical k-means quantizer on a deterministic
    driver-side sample; (2) ONE linear corpus pass emits (id, list id,
    PQ codes) — the stored index row, 1 int + m small ints per vector;
    (3) per-query probe lists picked driver-side (|queries| is the small
    side); (4) candidates = broadcast equi-join on list id over the
    CODES frame (the float corpus is never rejoined); (5) ADC distance =
    m table lookups per candidate (per-query tables broadcast in the
    closure, exact integer micro-units); (6) per-query window top-k.

    Output: ``(query_id, neighbor_id, dist_micro long, rank)`` — the
    quantizer is data-dependent, but the integer ADC arithmetic is
    exactly replayable from the staged kernel frames (see
    ``ivf_pq_kernel_frames``); recall pinned by pytest against the
    exact L2 baseline."""
    index, probe_df, dtab_df = ivf_pq_kernel_frames(
        emb,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        n_lists=n_lists,
        n_probe=n_probe,
        m=m,
        n_codes=n_codes,
        sample_size=sample_size,
        seed=seed,
        refine_iters=refine_iters,
    )
    return ivf_pq_topk_from_index(
        index, probe_df, dtab_df, k=k, id_col=id_col
    )


def ivf_pq_kernel_frames(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """IVF-PQ kernel outputs as three stageable frames: the index
    ``(id, __list, codes array<int>)`` (one fused corpus scan), the
    per-query probe set ``(query_id, __list)``, and the per-query ADC
    sub-distance tables ``(query_id, mi, code, d_micro)`` — nq·m·n_codes
    rows of exact int64 micro-units.  The quantizer/codebook training is
    the only non-relational piece; the ENTIRE query-time path downstream
    (probe equi-join, ADC = m integer table lookups summed, top-k) is
    pure relational algebra over these frames, so a DuckDB oracle can
    replay it bit-exactly (integer arithmetic — no float caveat)."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    spark = emb.sparkSession
    nv = normalize_udf()
    norm_emb = emb.select(F.col(id_col), nv(F.col(vec_col)).alias("__nv"))

    sample = np.array(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in emb.select(
                F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__o")
            )
            .orderBy("__o")
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ]
    )
    cents = _kmeans_cosine(sample, n_lists, seed)  # unit rows
    cb = pq_seed_codebooks(norm_emb, id_col, "__nv", n_codes)
    if refine_iters > 0:
        # production configuration: per-subspace Lloyd refinement of the
        # codebooks (deterministic, bounded exchanges — see
        # pq_refine_codebooks); 0 keeps the raw seeds
        cb = pq_refine_codebooks(
            norm_emb, cb, m=m, iters=refine_iters, id_col=id_col, vec_col="__nv"
        )

    C, cc = _pq_tables(cb, m)

    idx_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("__list", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    # one scan: coarse list id (argmax cos == argmin L2 on unit
    # vectors) + PQ codes, both from the same normalized batch
    index = ensure_parallelism(norm_emb).mapInPandas(
        _ivf_pq_index_pass(cents, C, cc, m, id_col), schema=idx_schema
    )

    q_ids, q_raw = _collect_matrix(queries, id_col, vec_col)
    Q = _normalize(q_raw)
    probes = np.argsort(-(Q @ cents.T), axis=1)[:, :n_probe]
    probe_rows = [
        (int(qid), int(lst)) for qid, row in zip(q_ids, probes) for lst in row
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, __list int")

    dtab = _adc_query_tables(Q, C, cc)
    dtab_rows = [
        (int(q_ids[qi]), mi, code, int(dtab[qi, mi, code]))
        for qi in range(len(q_ids))
        for mi in range(dtab.shape[1])
        for code in range(dtab.shape[2])
    ]
    dtab_df = spark.createDataFrame(
        dtab_rows, "query_id long, mi int, code int, d_micro long"
    )
    return index, probe_df, dtab_df


def ivf_pq_topk_from_index(
    index_df: DataFrame,
    probe_df: DataFrame,
    dtab_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Relational downstream of IVF-PQ: broadcast probe equi-join over
    the CODES frame (the float corpus is never touched), ADC distance =
    m exact-integer table lookups summed (tables rebuilt from the — by
    construction bounded, nq·m·n_codes-row — ``dtab_df``, so a staged
    parquet roundtrip feeds Spark and the oracle identical bytes), and
    the (dist, id) window top-k."""
    rows = dtab_df.collect()  # bounded: nq * m * n_codes (e.g. 1280)
    q_ids = sorted({r.query_id for r in rows})
    qpos = {int(q): i for i, q in enumerate(q_ids)}
    mm = 1 + max(r.mi for r in rows)
    ncodes = 1 + max(r.code for r in rows)
    dtab = np.zeros((len(q_ids), mm, ncodes), dtype=np.int64)
    for r in rows:
        dtab[qpos[int(r.query_id)], r.mi, r.code] = r.d_micro

    @F.pandas_udf(T.LongType())
    def adc_dist(qid: pd.Series, codes: pd.Series) -> pd.Series:
        if len(qid) == 0:
            return pd.Series([], dtype="int64")
        cd = np.vstack([np.asarray(c, dtype=np.int64) for c in codes])
        qi = qid.map(qpos).to_numpy(dtype=np.int64)
        return pd.Series(
            dtab[qi[:, None], np.arange(mm)[None, :], cd].sum(axis=1)
        )

    cands = index_df.join(F.broadcast(probe_df), "__list").filter(
        F.col(id_col) != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            adc_dist(F.col("query_id"), F.col("codes")).alias("dist_micro"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_refine_codebooks(
    emb: DataFrame,
    codebooks: np.ndarray,
    m: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed per-subspace Lloyd refinement of PQ codebooks — the
    production step between ``pq_seed_codebooks`` and ``pq_encode``
    (Jégou et al. train each subspace's codebook with k-means). Same
    scalable shape as ``ext/cluster``: per iteration ONE linear
    mapInPandas corpus scan (codebooks broadcast in the closure) emits
    per-batch partial sums keyed (subspace, code, dim) — at most
    m * n_codes * sub rows per batch — and ONE map-side-combined
    groupBy reduces them to a bounded driver collect (m=8, n_codes=16,
    sub=8 -> 1024 rows, corpus-size independent).

    Refined codebooks are data-dependent (float means), so encodes
    built from them are rows-only territory — the seeded codebooks stay
    the SQL-replayable correctness path. Codebooks stay rounded to
    ROUND_DIGITS after every update (same determinism contract).

    Returns the refined (n_codes, dim) matrix; codes for empty
    (subspace, code) cells keep their previous centroid."""
    n_codes, dim = codebooks.shape
    sub = dim // m
    cur = codebooks.copy()

    part_schema = T.StructType(
        [
            T.StructField("s", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("d", T.IntegerType()),
            T.StructField("psum", T.DoubleType()),
            T.StructField("pcnt", T.LongType()),
        ]
    )
    src = emb.select(vec_col)

    for _ in range(iters):
        C = cur.reshape(n_codes, m, sub).transpose(1, 0, 2).copy()
        cc = np.einsum("mcs,mcs->mc", C, C)

        def partials(
            batches: Iterator[pd.DataFrame], C=C, cc=cc
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = _vstack(pdf[vec_col]).reshape(-1, m, sub)
                xx = np.einsum("nms,nms->nm", X, X)
                xc = np.einsum("nms,mcs->nmc", X, C)
                dist = np.round(
                    xx[:, :, None] - 2.0 * xc + cc[None, :, :], ROUND_DIGITS
                )
                codes = np.argmin(dist, axis=2)  # (n, m)
                frames = []
                for s in range(m):
                    for ci in np.unique(codes[:, s]):
                        mask = codes[:, s] == ci
                        frames.append(
                            pd.DataFrame(
                                {
                                    "s": np.full(sub, s, dtype=np.int32),
                                    "c": np.full(sub, ci, dtype=np.int32),
                                    "d": np.arange(sub, dtype=np.int32),
                                    "psum": X[mask, s, :].sum(axis=0),
                                    "pcnt": np.full(
                                        sub, int(mask.sum()), dtype=np.int64
                                    ),
                                }
                            )
                        )
                yield pd.concat(frames, ignore_index=True)

        rows = (
            src.mapInPandas(partials, schema=part_schema)
            .groupBy("s", "c", "d")
            .agg(F.sum("psum").alias("ss"), F.sum("pcnt").alias("n"))
            .collect()
        )
        nxt = cur.copy()
        for r in rows:
            s, c, d = int(r["s"]), int(r["c"]), int(r["d"])
            nxt[c, s * sub + d] = round(r["ss"] / r["n"], ROUND_DIGITS)
        cur = nxt
    return cur

def quantized_gram_matrix(
    emb: DataFrame,
    vec_col: str = "embedding",
    *,
    scale: int = 1000,
) -> DataFrame:
    """Exact Gram (co-moment) matrix of a quantized embedding corpus —
    the distributed heavy pass of PCA / whitening / covariance-based
    drift checks.  Each component is quantized ``q = floor(x · scale)``
    (int arithmetic from here on), and the output is the upper triangle
    ``G[i,j] = Σ_v q_i(v) · q_j(v)`` plus the per-dimension sums and
    count needed to center it into a covariance matrix driver-side.

    Plan shape — NOT the naive posexplode self-join (which shuffles
    n·d² rows): an Arrow-batched ``mapInPandas`` computes one d×d int64
    outer-product partial PER PARTITION (a single numpy matmul), so the
    only shuffle is |partitions| · d(d+1)/2 partial rows reduced by a
    map-side-combinable sum.  At 100 TB the corpus is scanned once,
    Python touches each batch once, and the reduction payload is
    independent of row count — the classic partial-aggregate shape for
    distributed linear algebra.

    Exactness: |q| ≤ scale for unit-normalized inputs ⇒ each product ≤
    scale², and int64 holds corpus sums up to ~9·10¹⁸ — no float
    summation order anywhere, so a SQL replay matches bit-for-bit."""
    d_probe = len(emb.select(vec_col).first()[0])

    part_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("gram", T.LongType()),
            T.StructField("dim_sum", T.LongType()),
            T.StructField("n_vecs", T.LongType()),
        ]
    )
    iu = np.triu_indices(d_probe)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d_probe, d_probe), dtype=np.int64)
        sums = np.zeros(d_probe, dtype=np.int64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.floor(
                _vstack(pdf[vec_col]).astype(np.float64) * scale
            ).astype(np.int64)
            acc += X.T @ X
            sums += X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        out = pd.DataFrame(
            {
                "i": iu[0].astype(np.int32),
                "j": iu[1].astype(np.int32),
                "gram": acc[iu],
                "dim_sum": 0,
                "n_vecs": 0,
            }
        )
        # carry the vector sums / count on the diagonal rows (i == j)
        diag = out["i"] == out["j"]
        out.loc[diag, "dim_sum"] = sums
        out.loc[diag, "n_vecs"] = n
        yield out

    return (
        emb.select(vec_col)
        .mapInPandas(partials, schema=part_schema)
        .groupBy("i", "j")
        .agg(
            F.sum("gram").alias("gram"),
            F.sum("dim_sum").alias("dim_sum"),
            F.sum("n_vecs").alias("n_vecs"),
        )
    )


def sign_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """1-bit (sign) embedding quantization: bit i set iff component i
    is strictly positive.  64 dims pack into TWO int32-range BIGINT
    halves (``code_lo`` = dims 0..31, ``code_hi`` = dims 32..63) —
    never one 64-bit word, because bit 63's weight is LONG_MIN and both
    engines reject/overflow ``1 << 63``; two half-words keep every
    value positive and the oracle SQL identical.  A zero-shuffle,
    zero-UDF projection: 64× compression of the corpus before any
    distance work."""
    assert dim <= 64

    def half(lo_bit: int, hi_bit: int) -> Column:
        # bits are disjoint, so SUM == OR — and unlike a folded
        # `when(c, acc|bit).otherwise(acc)` accumulator (which repeats
        # `acc` twice per step and grows the expression tree 2^dim), a
        # flat sum of per-bit CASE terms stays linear in dim
        terms = [
            F.when(
                F.element_at(F.col(vec_col), i + 1) > 0,
                F.lit(1 << (i - lo_bit)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(lo_bit, hi_bit)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    return emb.select(
        F.col(id_col),
        half(0, min(dim, 32)).alias("code_lo"),
        (
            half(32, dim) if dim > 32 else F.lit(0).cast("long")
        ).alias("code_hi"),
    )


def _popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized popcount for nonnegative int64 values (numpy < 2.0 has
    no bitwise_count)."""
    flat = a.astype(np.uint64).reshape(-1)
    bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1).reshape(a.shape)


def hamming_topk(
    codes: DataFrame,
    query_codes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by Hamming distance over sign codes, self-matches
    excluded. Same plan shape as ``brute_force_topk``: the bounded
    query codes ride in the UDF closure, ONE linear scan of the corpus
    codes, lossless per-batch prune (hamming asc, id asc — the final
    ordering), tiny final window. Output: (query_id, neighbor_id,
    hamming, rank)."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    rows = query_codes.select(id_col, "code_lo", "code_hi").collect()
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_lo = np.array([r[1] for r in rows], dtype=np.int64)
    q_hi = np.array([r[2] for r in rows], dtype=np.int64)
    nq = len(q_ids)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("hamming", T.IntegerType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            lo = pdf["code_lo"].to_numpy(dtype=np.int64)
            hi = pdf["code_hi"].to_numpy(dtype=np.int64)
            h = _popcount64(lo[:, None] ^ q_lo[None, :]) + _popcount64(
                hi[:, None] ^ q_hi[None, :]
            )
            frames = []
            for j in range(nq):
                keep = np.nonzero(ids != q_ids[j])[0]
                if keep.size == 0:
                    continue
                col = h[keep, j]
                order = np.lexsort((ids[keep], col))[:k]
                sel = keep[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids[sel],
                            "hamming": col[order].astype(np.int32),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pruned = ensure_parallelism(codes).mapInPandas(scan, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return pruned.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def maxsim_token_maxes(
    emb: DataFrame,
    query_vecs: DataFrame,
    group_size: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) building block: for every
    (candidate group, query token) pair, the MAXIMUM token-level cosine
    in exact integer micro-units (floor(cos·1e6 + 0.5)).  Groups are
    ``id // group_size`` — the multi-vector "document".  Per-batch
    maxima are combined with one (group, token) max aggregate, so the
    corpus streams through ONE linear scan with the query token matrix
    in the closure; nothing quadratic in corpus size is materialized
    (16·N pair rows never exist — each Arrow batch reduces to
    ≤ groups_in_batch × n_query_tokens rows before leaving the
    worker)."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    rows = query_vecs.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_mat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
    # zero-norm guard on BOTH sides of the cosine (mirrors _normalize and
    # the oracle's CASE-guarded denominators): a zero query token scores
    # exactly 0 against everything instead of NaN.
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm = np.where(q_norm == 0.0, 1.0, q_norm)
    nq = len(q_ids)

    out_schema = T.StructType(
        [
            T.StructField("cand_group", T.LongType()),
            T.StructField("q_id", T.LongType()),
            T.StructField("m", T.LongType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = _vstack(pdf[vec_col])
            xn = np.linalg.norm(X, axis=1)
            den = np.outer(np.where(xn == 0.0, 1.0, xn), q_norm)
            # the oracle's formula order: dot / (|x|·|q|), then the
            # exact half-up micro quantization
            m = np.floor((X @ q_mat.T) / den * 1e6 + 0.5).astype(np.int64)
            groups = ids // group_size
            frame = pd.DataFrame(
                {
                    "cand_group": np.repeat(groups, nq),
                    "q_id": np.tile(q_ids, len(ids)),
                    "m": m.reshape(-1),
                }
            )
            yield frame.groupby(
                ["cand_group", "q_id"], as_index=False
            ).max()

    partial = ensure_parallelism(emb).mapInPandas(scan, schema=out_schema)
    return partial.groupBy("cand_group", "q_id").agg(
        F.max("m").alias("m")
    )
