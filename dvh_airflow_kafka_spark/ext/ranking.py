"""[EXT] Distributed total-order ranking.

A global ``row_number()``/``ntile()`` window with no partitionBy drags
the whole table through one task — the classic 100 TB scale-killer.
The rank of a row in a total order decomposes exactly like a prefix
sum: range-partition on the ordering key so each task owns a
contiguous slice, count rows per slice (tiny aggregate), turn the
counts into cumulative slice offsets on the driver, then rank WITHIN
each slice in parallel — ``offset + local row_number`` is the exact
global rank, independent of where the range boundaries fell.

Any rank-derived statistic (NTILE, percent_rank, top-k cutoffs)
follows from the rank plus the total count with plain arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Append the exact 1-based global rank of each row under
    ``ORDER BY order_cols`` without a single-partition window.

    ``order_cols`` must be a unique key (add a tiebreaker column if the
    sort key alone has duplicates) — ranks of tied rows would otherwise
    depend on physical order. Returns ``(frame, total_row_count)``; the
    count is a free by-product of the offsets pass. The slim frame is
    persisted so both passes see one slice assignment.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    sliced = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_slice", F.spark_partition_id())
        .persist()
    )
    counts = sliced.groupBy("_slice").count().collect()
    acc = 0
    offsets = []
    for sl, c in sorted((r["_slice"], r["count"]) for r in counts):
        offsets.append((sl, acc))
        acc += int(c)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_slice INT, _offset BIGINT")
    w = Window.partitionBy("_slice").orderBy(*order_cols)
    out = (
        sliced.join(F.broadcast(off_df), "_slice")
        .withColumn(
            rank_col, (F.col("_offset") + F.row_number().over(w)).cast("long")
        )
        .drop("_slice", "_offset")
    )
    return out, acc


def ntile_from_rank(rank, total: int, tiles: int):
    """The exact NTILE(tiles) bucket of a 1-based ``rank`` in a
    ``total``-row order — SQL-standard semantics: the first
    ``total % tiles`` buckets hold ``total // tiles + 1`` rows, the
    rest ``total // tiles``. Pure Column arithmetic, matches Spark and
    DuckDB NTILE bit-for-bit."""
    q, r = divmod(int(total), int(tiles))
    big = q + 1
    cut = r * big  # rows covered by the oversized leading buckets
    if q == 0:
        return F.ceil(rank / F.lit(big)).cast("int")
    return (
        F.when(rank <= cut, F.ceil(rank / F.lit(big)))
        .otherwise(F.lit(r) + F.ceil((rank - F.lit(cut)) / F.lit(q)))
        .cast("int")
    )


def length_batch_stats(
    df: DataFrame,
    *,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed batching: global (size, id) order via the
    distributed two-pass rank, consecutive ``batch_size``-row cuts, and
    per-batch padding accounting (n_docs · max − sum) — the
    padding-minimization loader layout. The single definition behind
    ``length_bucketed_batches``, ``data_selection_factory`` and the
    corpus DSL's ``length_batches`` stage."""
    ranked, _ = with_global_rank(
        df.select(F.col(id_col), F.col(size_col)),
        [size_col, id_col],
        rank_col="__rn",
    )
    b = ranked.withColumn(
        "batch_id", F.expr(f"(__rn - 1) div {batch_size}").cast("bigint")
    )
    return b.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(size_col).alias("max_tokens"),
        F.sum(size_col).alias("sum_tokens"),
        (F.count(F.lit(1)) * F.max(size_col) - F.sum(size_col)).alias(
            "padding_waste"
        ),
    )
