"""[EXT] Distributed fixed-iteration Lloyd's k-means over an embedding
column — the corpus-clustering primitive behind semantic curation
(SemDeDup's cluster-then-dedup, domain discovery, stratified corpus
mixing).

This is the FULL-corpus counterpart of ``ext/similarity._kmeans_cosine``
(which trains the IVF coarse quantizer on a driver-side sample): here the
assignment and the centroid update are both distributed —

- **assign**: centroids are a k x dim matrix broadcast in the UDF closure;
  one linear ``mapInPandas`` corpus scan computes every squared-L2
  distance with one numpy matmul per Arrow batch. No join, no cross
  product, no shuffle.
- **update**: the same scan emits per-batch partial sums
  ``(cluster, dim, partial_sum, partial_count)`` — at most k*dim rows per
  batch — and ONE map-side-combined ``groupBy(cluster, dim)`` reduces them
  to k*dim rows collected on the driver (bounded: k=8, dim=64 -> 512
  rows, independent of corpus size). This is the classic scalable
  k-means shape: per-iteration cost is one corpus scan plus a k*dim-row
  exchange, so it survives a 1000-executor 100 TB corpus unchanged.

Determinism contract (the catalog oracles this cross-engine):

- seeds: cluster j is seeded by the embedding of the MINIMUM id in residue
  class ``id % k == j`` (a groupBy-min, no global window);
- centroids are rounded to 6 decimals after seeding and after every mean
  update, so both engines iterate from IDENTICAL centroid values;
- distances are rounded to 6 decimals before the argmin; ties break to the
  lowest cluster id. Residual cross-engine risk is a true distance pair
  within ~1e-6 straddling the rounding boundary (~1e-10 per comparison) —
  the same documented fragility class as ``lsh_ann_topk``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROUND_DIGITS = 6


def _seed_centroids(
    emb: DataFrame, id_col: str, vec_col: str, k: int
) -> dict[int, np.ndarray]:
    """Deterministic seeds: cluster j <- vector of min(id) where id%k==j.

    One map-side-combined groupBy-min plus a semi-join — no global sort,
    no window. The collect is k rows (bounded by construction)."""
    seeds = (
        emb.groupBy((F.col(id_col) % k).cast("int").alias("__c"))
        .agg(F.min(id_col).alias("__sid"))
        .join(emb, F.col("__sid") == F.col(id_col))
        .select("__c", vec_col)
        .collect()
    )
    return {
        int(r["__c"]): np.round(
            np.asarray(r[vec_col], dtype=np.float64), ROUND_DIGITS
        )
        for r in seeds
    }


def _centroid_matrix(cents: dict[int, np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    ids = np.array(sorted(cents), dtype=np.int64)
    mat = np.vstack([cents[int(c)] for c in ids])
    return ids, mat


def _assign(X: np.ndarray, cmat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rounded squared-L2 argmin; ties -> first (= lowest cluster id,
    rows of ``cmat`` are in ascending cluster-id order)."""
    xx = np.einsum("ij,ij->i", X, X)
    cc = np.einsum("ij,ij->i", cmat, cmat)
    d = np.round(xx[:, None] - 2.0 * (X @ cmat.T) + cc[None, :], ROUND_DIGITS)
    a = np.argmin(d, axis=1)
    return a, d[np.arange(len(a)), a]


def kmeans_assignments(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Run ``iters`` assignment passes (with ``iters - 1`` centroid mean
    updates in between) and return the FINAL assignment frame
    ``(id_col, cluster int, sqdist double)`` — ``sqdist`` rounded to 6.

    Empty clusters are dropped from the next iteration's centroid set
    (mirrors the oracle, whose per-cluster mean CTE simply has no row for
    a memberless cluster)."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    spark = emb.sparkSession
    src = ensure_parallelism(emb.select(id_col, vec_col))
    cents = _seed_centroids(emb, id_col, vec_col, k)

    part_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("dim", T.IntegerType()),
            T.StructField("psum", T.DoubleType()),
            T.StructField("pcnt", T.LongType()),
        ]
    )

    for _ in range(iters - 1):
        cids, cmat = _centroid_matrix(cents)

        def partials(
            batches: Iterator[pd.DataFrame], cids=cids, cmat=cmat
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.vstack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                a, _d = _assign(X, cmat)
                frames = []
                dim = X.shape[1]
                for ci in np.unique(a):
                    mask = a == ci
                    frames.append(
                        pd.DataFrame(
                            {
                                "cluster": np.full(dim, cids[ci], dtype=np.int32),
                                "dim": np.arange(dim, dtype=np.int32),
                                "psum": X[mask].sum(axis=0),
                                "pcnt": np.full(
                                    dim, int(mask.sum()), dtype=np.int64
                                ),
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        rows = (
            src.mapInPandas(partials, schema=part_schema)
            .groupBy("cluster", "dim")
            .agg(F.sum("psum").alias("s"), F.sum("pcnt").alias("n"))
            .collect()
        )
        new_cents: dict[int, np.ndarray] = {}
        dims: dict[int, dict[int, float]] = {}
        for r in rows:
            dims.setdefault(int(r["cluster"]), {})[int(r["dim"])] = (
                r["s"] / r["n"]
            )
        for c, dvals in dims.items():
            vec = np.array([dvals[i] for i in range(len(dvals))], dtype=np.float64)
            new_cents[c] = np.round(vec, ROUND_DIGITS)
        cents = new_cents

    cids, cmat = _centroid_matrix(cents)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sqdist", T.DoubleType()),
        ]
    )

    def final(
        batches: Iterator[pd.DataFrame], cids=cids, cmat=cmat
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            a, d = _assign(X, cmat)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "cluster": cids[a].astype(np.int32),
                    "sqdist": d,
                }
            )

    return src.mapInPandas(final, schema=out_schema)
