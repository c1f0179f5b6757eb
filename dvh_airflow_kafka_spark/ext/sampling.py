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
    """frac in [0,1] → 8-hex lowercase threshold (P(prefix < t) ≈ frac).

    A fraction of exactly 1.0 means "keep everything", so it returns a
    sentinel that sorts above every hex prefix ('g' > 'f') — the capped
    'ffffffff' under strict '<' would still drop prefixes equal to
    'ffffffff' (p ≈ 2⁻³²), contradicting the documented semantics.
    """
    if frac >= 1.0:
        return "g"
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


def with_prefix_sum(
    docs: DataFrame,
    id_col: str,
    size_col: Column,
    *,
    before_col: str = "before",
    num_partitions: int | None = None,
    carry_cols: tuple[str, ...] = (),
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Append the exact global running sum of ``size_col`` BEFORE each row
    under the total order ``order_by`` (default: ``ORDER BY id_col``) —
    the shared two-pass distributed prefix sum (range slices → per-slice
    totals → broadcast cumulative offsets → within-slice window; no
    single-partition ``WindowExec``). The order must be unique (append the
    id as the final tiebreaker); entries are ASCENDING expressions —
    express "descending" by negating/inverting the expression, so the
    range partitioner and the in-slice window agree on one sort direction.
    Returns (id, size, ``before_col``, carry_cols); consumers derive shard
    ids, byte offsets, or token spans from ``before`` with plain
    arithmetic."""
    spark = docs.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    if order_by is None:
        # default total order = the id itself; no extra sort-key columns
        onames = [id_col]
        extra = []
    else:
        onames = [f"_o{i}" for i in range(len(order_by))]
        extra = [c.alias(nm) for c, nm in zip(order_by, onames)]
    slim = docs.select(
        F.col(id_col),
        size_col.cast("long").alias("size"),
        *extra,
        *[F.col(c) for c in carry_cols],
    )
    sliced = (
        slim.repartitionByRange(n, *[F.col(nm) for nm in onames])
        .withColumn("_slice", F.spark_partition_id())
        .persist()
    )
    totals = sliced.groupBy("_slice").agg(F.sum("size").alias("_total")).collect()
    acc = 0
    offsets = []
    for sl, tot in sorted((r["_slice"], r["_total"]) for r in totals):
        offsets.append((sl, acc))
        acc += int(tot)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_slice INT, _offset BIGINT")
    w = Window.partitionBy("_slice").orderBy(
        *[F.col(nm) for nm in onames]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    before = (F.col("_offset") + F.sum("size").over(w) - F.col("size")).cast("long")
    return sliced.join(F.broadcast(off_df), "_slice").select(
        F.col(id_col),
        F.col("size"),
        before.alias(before_col),
        *[F.col(c) for c in carry_cols],
    )


def pack_into_shards(
    docs: DataFrame,
    id_col: str,
    size_col: Column,
    capacity: int,
    num_partitions: int | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic sequence packing: assign documents (in ``id_col``
    order) to fixed-capacity training shards by cumulative size —
    ``shard_id = floor(cum_size_before / capacity)`` — the standard
    prefix-sum approximation of bin packing used to build ~uniform token
    shards for pre-training. Returns (id, size, shard_id,
    offset_in_shard).

    Plan shape: DISTRIBUTED two-pass prefix sum (no global window).

    1. Project to the slim (id, size) pair and range-partition on the id
       so every task owns one contiguous slice of the global order; the
       slice id is materialised as a column and the frame persisted so
       both passes see the identical assignment.
    2. Pass 1: per-slice size totals — a map-side-combined aggregate
       producing ``num_partitions`` rows; the driver turns them into
       cumulative slice offsets (tiny, O(partitions)).
    3. Pass 2: broadcast-join the offsets back and window only WITHIN a
       slice (``partitionBy(_slice)``) — every task computes its local
       cumsum in parallel; offset + local cumsum == the exact global
       prefix sum, independent of where the range boundaries fell.

    The result is bit-identical to the single-window form (ids are the
    total order; any contiguous split of a total order preserves its
    prefix sums) but the largest task holds 1/num_partitions of the data
    instead of all of it — this is what survives 100 TB. Only the slim
    two-column pair is persisted (~16 B/row), not the documents.
    """
    pre = with_prefix_sum(
        docs,
        id_col,
        size_col,
        num_partitions=num_partitions,
        carry_cols=carry_cols,
    )
    before = F.col("before")
    return pre.select(
        F.col(id_col),
        F.col("size"),
        F.floor(before / F.lit(capacity)).cast("long").alias("shard_id"),
        (before % F.lit(capacity)).cast("long").alias("offset_in_shard"),
        *[F.col(c) for c in carry_cols],
    )


def temperature_mixture_filter(
    df: DataFrame,
    *,
    k: float = 2.0,
    salt: str = "mix-temp-v1",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic ~``k``·√count of each source's rows — α=0.5
    exponent sampling (XLM-R/mBERT style) with DATA-DEPENDENT fractions
    computed from the counts of ``df`` as passed (so pipelines sample
    the frame at its stage position, not the raw table). α is pinned to
    0.5: the fraction arithmetic is division + ``sqrt``, both correctly
    rounded IEEE ops in every engine (a general ``pow`` is only
    faithfully rounded — last-ulp libm differences would flip hex
    thresholds).

    Rows with a NULL source are DROPPED (the oracle-side inner join
    against the per-source thresholds has the same semantics; a NULL
    key also cannot hold a meaningful budget). One tiny per-source
    count aggregate (driver collect bounded by |sources|), then the
    keep predicate fuses into the scan. The single definition behind
    ``temperature_mixture_sample``, ``data_selection_factory`` and the
    corpus DSL's ``temperature_mixture`` stage."""
    import math

    counts = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(source_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
        if r["__s"] is not None
    }
    mapping = F.create_map(
        *[
            x
            for s in sorted(counts)
            for x in (
                F.lit(s),
                F.lit(_hex_threshold(min(k / math.sqrt(counts[s]), 1.0))),
            )
        ]
    )
    key = F.concat(
        F.col(source_col), F.lit("|"), F.col(id_col).cast("string")
    )
    # a NULL source misses the map -> NULL threshold -> predicate NULL
    # -> row dropped, matching the oracle's inner join
    return df.filter(split_bucket(key, salt) < mapping[F.col(source_col)])


def explode_token_spans(
    pre: DataFrame,
    length: int,
    *,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """GPT-style concat-and-split: given a ``with_prefix_sum`` frame
    (``before``/``size`` in tokens), emit one row per (document,
    fixed-``length``-sequence) overlap — documents SPAN sequence
    boundaries instead of being padded or truncated. Output per row:
    ``seq_id``, ``tok_start`` (offset into the document), ``offset_in_seq``
    and ``n_seq_tokens``; every sequence except the last tiles to exactly
    ``length`` tokens. Integer ``div`` arithmetic — token offsets stay
    exact past 2⁵³ where double division would silently round. The single
    definition behind the corpus DSL's ``pack_sequences`` stage,
    ``training_sequence_pack`` and ``bpe_tokenize_and_pack``."""
    e = pre.filter(F.col("size") > 0).withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.expr(f"before div {length}"),
                F.expr(f"(before + size - 1) div {length}"),
            )
        ),
    )
    end = F.col("before") + F.col("size")
    seq_start = F.col("seq_id") * length
    span_start = F.greatest(F.col("before"), seq_start)
    return e.select(
        *[F.col(c) for c in id_cols],
        F.col("seq_id").cast("bigint").alias("seq_id"),
        (span_start - F.col("before")).cast("bigint").alias("tok_start"),
        (span_start - seq_start).cast("bigint").alias("offset_in_seq"),
        (F.least(end, seq_start + length) - span_start)
        .cast("bigint")
        .alias("n_seq_tokens"),
    )
