"""[EXT] Data-layout planning operators — compaction, multi-dimensional
clustering, encoding audits.

At 100 TB the dominant cost of most queries is decided before a single
task runs, by how the bytes are laid out: how many files a scan must
open, which row groups a predicate can skip, and how well each column
compresses under its encoding.  The operators here compute the layout
*plans* and *audits* a lakehouse maintenance loop runs continuously:

1. **Small-file compaction planning** (``plan_compaction_bins``): the
   bin-packing step of Delta/Iceberg ``OPTIMIZE``.  The input is a FILE
   INVENTORY (metadata — millions of rows for a 100 TB table, never the
   data itself), and the plan is one exclusive-prefix-sum window per
   partition group: file → bin = ``floor(bytes_before / target)``.
   Deterministic, single shuffle, and — unlike a driver-side greedy
   loop — distributed over groups.
2. **Z-order clustering audit** (``bit_interleave2`` + per-file span
   stats): interleaving the bit planes of two key columns gives a
   1-D sort order whose contiguous ranges bound BOTH dimensions, so
   parquet row-group min/max stats prune on either predicate.  The
   interleave is a closed-form integer expression (shifts + masks) that
   stays inside whole-stage codegen; the audit compares per-file
   (min, max) spans of a z-ordered layout against a linear sort.
3. **Column encoding statistics** (``encoding_stats``): per-group RLE
   run counts, dictionary cardinality, and delta bit-widths over a
   write-order window — the numbers that decide whether a column should
   be dictionary-, run-length- or delta-encoded at write time.  All
   integer arithmetic (bit widths via binary-string length, never
   ``log2``), so cross-engine checks are exact.

Reference parity note: the reference (navikt/dvh-airflow-kafka) writes
through a DB sink and has no file-layout layer; this module is part of
the [EXT] lake-maintenance surface its pipelines would need on object
storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "plan_compaction_bins",
    "bit_interleave2",
    "layout_span_audit",
    "encoding_stats",
]


def plan_compaction_bins(
    files: DataFrame,
    group_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign files to compaction bins of ~``target_bytes`` each, per
    ``group_col`` (a table partition), in ``file_col`` order.

    Spec (exactly SQL-mirrorable): ``bin = floor(prefix_bytes / target)``
    where ``prefix_bytes`` is the EXCLUSIVE prefix sum of ``bytes_col``
    over the group's file order — the first file of a group is always
    bin 0, every bin's first file starts at or before the target
    boundary, and a file larger than ``target_bytes`` owns the bins it
    spans.  Returns one row per (group, bin): file count, total bytes,
    first/last file id.

    Scale: the input is table METADATA (one row per file), so even a
    100 TB / million-file table plans in one keyed window + one
    aggregate; groups plan in parallel, and the output is the work list
    a compaction job fans out over."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(
        F.sum(F.col(bytes_col)).over(w), F.lit(0).cast("bigint")
    )
    binned = files.select(
        F.col(group_col),
        F.col(file_col),
        F.col(bytes_col).cast("bigint").alias("__bytes"),
        F.floor(before / F.lit(target_bytes)).cast("bigint").alias("bin"),
    )
    return binned.groupBy(group_col, "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("__bytes").alias("total_bytes"),
        F.min(file_col).alias("first_file"),
        F.max(file_col).alias("last_file"),
    )


def bit_interleave2(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton/Z-curve interleave of the low ``bits`` bits of two integer
    columns: bit i of ``x`` lands at position 2i, bit i of ``y`` at
    2i+1.  Delegates to ``operators/maintenance.interleave_bits`` (the
    rewrite path's interleave — same bit placement for two columns), so
    the audit here measures exactly the curve ``zorder_layout`` writes.
    Closed-form shift/mask expression — whole-stage codegen, no UDF —
    and the identical formula is writable in ANSI SQL, so layouts
    derived from it are cross-engine exact."""
    from dvh_airflow_kafka_spark.operators.maintenance import interleave_bits

    return interleave_bits([x, y], bits)


def layout_span_audit(
    df: DataFrame,
    x: Column,
    y: Column,
    *,
    bits: int = 8,
    n_files: int = 16,
) -> DataFrame:
    """Compare data-skipping quality of a z-ordered layout against a
    linear (sort-by-x) layout over the same ``n_files`` equal-key-range
    files.

    Both layouts assign each row to a file by dividing its 2*``bits``-
    (resp. ``bits``-) bit key space into ``n_files`` fixed equal ranges
    — closed-form, no sampling, so the audit is deterministic and
    SQL-mirrorable.  Output: one row per (layout, file) holding the
    per-file min/max of BOTH dimensions — exactly the parquet row-group
    stats a reader prunes on.  A z-ordered file bounds both spans at
    ~sqrt scale; the linear layout bounds only x and leaves y's span at
    full domain width — the measurable reason Z-ORDER BY exists.

    Scale: one projection + two aggregations over (file) — the audit a
    maintenance loop runs AFTER clustering 100 TB to prove the rewrite
    actually tightened the stats readers skip on."""
    xb = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    yb = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    zspan = (1 << (2 * bits)) // n_files
    lspan = (1 << bits) // n_files
    keyed = df.select(
        xb.alias("__x"),
        yb.alias("__y"),
        F.floor(bit_interleave2(xb, yb, bits) / F.lit(zspan))
        .cast("bigint")
        .alias("__zfile"),
        F.floor(xb / F.lit(lspan)).cast("bigint").alias("__lfile"),
    )

    def spans(file_col: str, layout: str) -> DataFrame:
        return keyed.groupBy(F.col(file_col).alias("file_id")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        ).select(F.lit(layout).alias("layout"), "*")

    return spans("__zfile", "zorder").unionByName(spans("__lfile", "linear"))


def encoding_stats(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value: Column,
) -> DataFrame:
    """Per-group encodability profile of an integer column in write
    order: RLE run count, dictionary cardinality, delta-encoding
    bit-width, and the ascending-delta fraction numerator/denominator.

    ``n_runs`` counts value-change boundaries over the ``order_col``
    window (what RLE would store); ``n_distinct`` is the dictionary
    size; ``delta_bits`` is the bit-length of the largest absolute
    row-to-row delta (``length(bin(x))`` — integer-exact, never a
    float ``log2``); ``n_nonneg_deltas``/``n_deltas`` give the sorted-
    ness a delta encoder exploits.  Everything is integer arithmetic,
    so the profile is bit-identical to an ANSI-SQL replay.

    Scale: one keyed window (single exchange) + one aggregate; the
    output is one row per group — the table a writer consults to pick
    parquet encodings per column chunk."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    rows = df.select(
        F.col(group_col),
        F.col(order_col),
        value.cast("bigint").alias("__v"),
    ).select(
        F.col(group_col),
        "__v",
        (F.col("__v") - F.lag("__v").over(w)).alias("__d"),
    )
    return rows.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.when(F.col("__d") != 0, 1).otherwise(0)) + F.lit(1))
        .cast("bigint")
        .alias("n_runs"),
        F.countDistinct("__v").alias("n_distinct"),
        F.when(F.max(F.abs(F.col("__d"))).isNull(), F.lit(0))
        .otherwise(F.length(F.bin(F.max(F.abs(F.col("__d"))))))
        .cast("int")
        .alias("delta_bits"),
        F.sum(F.when(F.col("__d") >= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonneg_deltas"),
        F.count(F.col("__d")).alias("n_deltas"),
    )
