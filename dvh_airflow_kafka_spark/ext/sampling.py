"""[EXT] Deterministic splits and sampling for training-data pipelines.

A training corpus needs reproducible, leakage-free partitioning: the
same document must land in the same split on every run, on every
cluster, regardless of partitioning or row order. Random `rand()` seeds
do not survive re-partitioning; the industry-standard answer is
content-hash bucketing — hash a stable key with a salt, compare the
prefix against a threshold.

The trick that keeps it cross-engine exact: the first 8 hex chars of
sha256 compare *lexicographically* exactly like the 32-bit integer they
encode (fixed-length lowercase hex), so `substr(sha256(k),1,8) <
'cccccccc'` selects P≈0.8 identically in Spark, DuckDB, or any engine
with a standard sha256 — no hex→int conversion, no engine-specific hash.

Changing the salt re-draws the assignment; keeping it pins the split
forever (add data, the old rows never move splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(frac: float) -> str:
    """frac in [0,1] → 8-hex lowercase threshold (P(prefix < t) ≈ frac)."""
    return format(min(int(frac * (1 << 32)), (1 << 32) - 1), "08x")


def split_bucket(key: Column, salt: str = "split-v1") -> Column:
    """The stable 8-hex bucket of a key (lexicographic-comparable)."""
    return F.substring(
        F.sha2(F.concat(F.lit(salt), key.cast("string")), 256), 1, 8
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    *,
    train_frac: float = 0.8,
    salt: str = "split-v1",
) -> DataFrame:
    """Append a deterministic 'train'/'test' split column keyed on
    ``key_col``. Pure Column expression — fused into the scan, no
    shuffle, reproducible across runs and engines."""
    t = _hex_threshold(train_frac)
    b = split_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split", F.when(b < F.lit(t), F.lit("train")).otherwise(F.lit("test"))
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    *,
    frac: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ~``frac`` of rows per key — the reproducible
    cousin of ``df.sampleBy``: same survivors every run, no seed/order
    sensitivity, exact-oracle-able. Stratification comes free: the hash
    is uniform within every stratum, so per-group retention concentrates
    around ``frac`` regardless of group skew."""
    t = _hex_threshold(frac)
    return df.filter(split_bucket(F.col(key_col), salt) < F.lit(t))


def sql_bucket_predicate(key_expr: str, frac: float, salt: str = "split-v1") -> str:
    """The DuckDB/ANSI rendering of the same bucket test — oracle-side
    mirror of :func:`split_bucket` (sha256 hex is lowercase in both
    engines)."""
    return (
        f"substr(sha256('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 8)"
        f" < '{_hex_threshold(frac)}'"
    )


def pack_into_shards(
    docs: DataFrame,
    id_col: str,
    size_col: Column,
    capacity: int,
) -> DataFrame:
    """Deterministic sequence packing: assign documents (in ``id_col``
    order) to fixed-capacity training shards by cumulative size —
    ``shard_id = floor(cum_size_before / capacity)`` — the standard
    prefix-sum approximation of bin packing used to build ~uniform token
    shards for pre-training. Returns (id, size, shard_id,
    offset_in_shard).

    Plan shape: ONE global window over the ordering key. At 100 TB a
    single unbounded ordering is the honest cost of a globally
    deterministic layout; shard *within* a partition key (date, source)
    instead when global order is not required — same expression under a
    partitionBy.
    """
    w = Window.orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(size_col).over(w)
    before = (cum - size_col).cast("long")
    return docs.select(
        F.col(id_col),
        size_col.cast("long").alias("size"),
        F.floor(before / F.lit(capacity)).cast("long").alias("shard_id"),
        (before % F.lit(capacity)).cast("long").alias("offset_in_shard"),
    )
