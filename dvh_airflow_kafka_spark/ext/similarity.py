"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact top-k cosine — the correctness baseline.
  The (small) query side is broadcast against the corpus, the per-pair
  cosine runs as zip_with/aggregate fold (JVM, no Python), and the top-k
  is a window over each query partition.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (SRP) LSH.
  Each vector gets a compact bucket id per hash table (sign bits of H
  seeded hyperplane projections, folded into a long); candidates are
  equi-joined per (table, bucket) and only candidates pay the exact
  cosine. At 100 TB the corpus is hashed once (linear scan, no shuffle
  beyond the candidate join) and queries touch ~|corpus| / 2^H vectors
  per table instead of the whole corpus.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict left-to-right double fold — the accumulation
    order is deterministic, which keeps results bit-identical across
    engines that fold in sequence."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double_vec(df: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(out)
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours (cosine) of each query vector against the
    corpus, self-matches excluded. Output: (query_id, neighbor_id, cosine,
    rank). The query side is broadcast — the corpus is scanned once."""
    corpus = _as_double_vec(emb, id_col, vec_col, "__cv").select(
        F.col(id_col).alias("neighbor_id"), "__cv"
    )
    q = _as_double_vec(queries, id_col, vec_col, "__qv").select(
        F.col(id_col).alias("query_id"), "__qv"
    )
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = cosine(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_bits, dim))


def srp_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id: bit j = [vec · plane_j > 0],
    folded into a long. ``planes`` is one table's (n_bits, dim) matrix,
    embedded as plan literals — broadcast once with the plan, no shuffle."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _probe_masks(n_bits: int, max_hamming: int) -> list[int]:
    """All XOR masks with popcount <= max_hamming — the multi-probe
    perturbation set (Lv et al., 'Multi-Probe LSH', VLDB'07). Probing
    near-miss buckets trades a small candidate-set growth (sum C(n_bits,i))
    for a large recall gain: a neighbour at angle θ agrees with the query
    on each bit w.p. 1-θ/π, so requiring ALL n_bits to agree is
    exponentially lossy while allowing <=m flips is not."""
    return [m for m in range(1 << n_bits) if bin(m).count("1") <= max_hamming]


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
) -> DataFrame:
    """Approximate top-k: SRP-LSH candidate generation + exact cosine
    re-rank. Candidates = vectors whose bucket is within ``probe_hamming``
    bit-flips of the query's bucket in ANY of ``n_tables`` tables
    (multi-probe). Only the QUERY side is expanded (x sum C(n_bits, <=m)
    probes) — the corpus is hashed exactly once per table, so the linear
    corpus scan that dominates at 100 TB is unchanged; recall rises from
    p^n_bits to P(Binomial(n_bits, p) >= n_bits-m) per table."""
    planes = _hyperplanes(dim, n_bits, n_tables, seed)

    def bucketize(df: DataFrame, role: str) -> DataFrame:
        v = _as_double_vec(df, id_col, vec_col, "__v")
        return v.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col("__v").alias(f"__{role}v"),
            F.posexplode(
                F.array(*[srp_bucket(F.col("__v"), planes[t]) for t in range(n_tables)])
            ).alias(f"__{role}_table", f"__{role}_bucket"),
        )

    c = bucketize(emb, "neighbor").drop("__neighborv")
    q = bucketize(queries, "query").drop("__queryv")
    if probe_hamming > 0:
        masks = F.array(
            *[F.lit(m) for m in _probe_masks(n_bits, probe_hamming)]
        )
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
    cands = cand_ids.join(
        _as_double_vec(emb, id_col, vec_col, "__neighborv").withColumnRenamed(
            id_col, "neighbor_id"
        ),
        "neighbor_id",
    ).join(
        F.broadcast(
            _as_double_vec(queries, id_col, vec_col, "__queryv").withColumnRenamed(
                id_col, "query_id"
            )
        ),
        "query_id",
    )
    sim = cosine(F.col("__queryv"), F.col("__neighborv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
