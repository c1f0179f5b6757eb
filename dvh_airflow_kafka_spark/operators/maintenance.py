"""Lake-maintenance operators: small-file compaction and keyed
merge/upsert on parquet paths.

Any streaming or frequently-appending pipeline (the reference appends a
batch per poll; this engine's streaming spine appends a file per
micro-batch) accretes small files, and small files are the quiet killer
at 100 TB — a scan pays per-file open/footer costs and the driver pays
per-file listing, so a million 1 MB files can cost more than the data
read. These two operators are the standard maintenance pair a lake table
needs between appends.

No table format (Delta/Iceberg) ships in this environment, so both
operate on plain parquet directories with a write-to-side → atomic-swap
protocol; on a real deployment the same call shape maps onto
``OPTIMIZE`` / ``MERGE INTO``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _swap_into_place(spark: SparkSession, tmp_out: str, path: str) -> None:
    """Replace ``path`` with ``tmp_out`` as atomically as the underlying
    store allows — Hadoop FS API, so the swap works on HDFS/S3A, not
    just a driver-local filesystem view (io.swap_into_place)."""
    from dvh_airflow_kafka_spark.io import swap_into_place

    swap_into_place(spark, tmp_out, path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Sizes from the on-disk bytes (not row counts, which mis-size wide vs
    narrow rows). ``sort_within_by`` re-sorts rows inside each output
    file while writing — restoring scan locality (min/max row-group
    pruning) that interleaved appends destroyed. Returns the number of
    files written.
    """
    from dvh_airflow_kafka_spark.io import HadoopFs, recover_interrupted_swap

    recover_interrupted_swap(spark, path)
    total = HadoopFs(spark, path).total_bytes()
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp_out = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp_out)
    _swap_into_place(spark, tmp_out, path)
    return n_files


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> None:
    """Keyed upsert into a parquet path: rows whose key matches an update
    are replaced, new keys are appended, untouched rows are preserved —
    ``MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` on a
    format without transaction support.

    Plan shape: one left-anti join of target against the (deduplicated)
    update keys, then a union — the target is scanned once. The anti-join
    broadcasts whenever the update batch is dimension-sized (the common
    CDC case); a bucketed target (io.write_bucketed) makes it
    shuffle-free on the target side.

    Duplicate-key updates pick a DETERMINISTIC survivor: the row with the
    greatest ``version_col`` (CDC last-write-wins; pass the batch's
    sequence/timestamp column), ties and the no-version case broken by
    every remaining column descending — never ``dropDuplicates``, whose
    survivor depends on partition order and varies run to run.
    """
    from dvh_airflow_kafka_spark.io import recover_interrupted_swap

    recover_interrupted_swap(spark, target_path)
    order_cols = [version_col] if version_col else []
    order_cols += [c for c in updates.columns if c not in keys and c != version_col]
    if order_cols:
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in order_cols])
        last = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:  # key-only frame: any duplicate is identical
        last = updates.dropDuplicates(keys)
    target = spark.read.parquet(target_path)
    kept = target.join(last.select(*keys), on=keys, how="left_anti")
    merged = kept.unionByName(last.select(*target.columns))
    tmp_out = f"{target_path}.__merge_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp_out)
    _swap_into_place(spark, tmp_out, target_path)


def file_stats(path: str) -> dict:
    """(n_files, total_bytes, min/max file bytes) for a parquet dir —
    the before/after evidence for compaction."""
    sizes = [
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def interleave_bits(cols: list, bits: int = 16):
    """Morton/Z-value of already-bucketed non-negative ints: bit i of
    column j lands at position ``i*len(cols)+j``. Pure shift/or codegen —
    ``bits*len(cols)`` terms, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(c.cast("long"), i).bitwiseAND(
                        F.lit(1).cast("long")
                    ),
                    i * len(cols) + j,
                )
            )
    return z


def zorder_layout(
    spark: SparkSession,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Rewrite a parquet directory clustered on the Z-order curve of
    ``cols`` — the data-skipping layout: after the rewrite, every file
    covers a narrow range of EACH clustering column simultaneously, so
    parquet min/max footer stats prune files/row-groups for predicates
    on ANY of the columns (a plain sort only skips on its leading
    column).

    Plan shape: a 1-row min/max aggregate per column (broadcast scalar,
    the documented O(n·1) pattern) normalises each column into a
    ``bits``-bit bucket; the Morton interleave is pure codegen; then ONE
    range shuffle on the z-value with a sort-within-partition. At 100 TB
    that is the same cost as any global sort-rewrite — one pass, one
    exchange — and the range partitioner keeps output files evenly
    sized regardless of key skew."""
    from dvh_airflow_kafka_spark.io import recover_interrupted_swap

    recover_interrupted_swap(spark, path)
    df = spark.read.parquet(path)
    mm = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    scale = (1 << bits) - 1
    with_mm = df.crossJoin(F.broadcast(mm))
    buckets = [
        F.when(
            F.col(f"__mx_{c}") > F.col(f"__mn_{c}"),
            F.floor(
                (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                / (F.col(f"__mx_{c}") - F.col(f"__mn_{c}"))
                * scale
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        for c in cols
    ]
    z = with_mm.withColumn("__z", interleave_bits(buckets, bits))
    n = n_files or max(1, spark.sparkContext.defaultParallelism)
    out = (
        z.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
    )
    tmp_out = f"{path}.__zorder_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp_out)
    _swap_into_place(spark, tmp_out, path)


def column_range_stats(path: str, cols: list[str]) -> dict:
    """Per-file min/max footer stats for ``cols`` — the evidence that a
    layout clusters: sum over files of (file range / global range) per
    column. 1.0·n_files means every file spans the whole domain (no
    skipping possible); values near 1.0 total mean near-perfect
    clustering. Reads only parquet footers via pyarrow."""
    import pyarrow.parquet as pq

    per_file: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for dirpath, _, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, fname)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for c in cols:
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or st.min is None:
                        continue
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    per_file[c].append((float(lo), float(hi)))
    out = {}
    for c, ranges in per_file.items():
        if not ranges:
            out[c] = {"n_files": 0, "relative_coverage": 0.0}
            continue
        glo = min(r[0] for r in ranges)
        ghi = max(r[1] for r in ranges)
        width = (ghi - glo) or 1.0
        out[c] = {
            "n_files": len(ranges),
            "relative_coverage": sum((hi - lo) / width for lo, hi in ranges),
        }
    return out


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
) -> tuple[int, int]:
    """Hard-delete every row matching ``predicate`` from a parquet path —
    the right-to-be-forgotten primitive the reference's kode-6/7 duty
    implies but its insert-only sink cannot express. Rewrites the
    surviving rows to the side and swaps atomically (same protocol as
    compaction; on Delta/Iceberg this maps to ``DELETE WHERE``).
    Returns (rows_before, rows_deleted).

    At 100 TB the rewrite cost is one scan + one write of survivors; on
    a date/bucket-partitioned layout only the partitions that can match
    need rewriting (partition-prune the predicate first) — pair with
    ``zorder_layout``/``write_bucketed`` so erasure targets stay
    clustered in few files."""
    from dvh_airflow_kafka_spark.io import recover_interrupted_swap

    recover_interrupted_swap(spark, path)
    df = spark.read.parquet(path)
    total = df.count()
    keep = df.filter(~predicate | predicate.isNull())
    kept = keep.count()
    tmp_out = f"{path}.__delete_{uuid.uuid4().hex[:8]}"
    keep.write.mode("overwrite").parquet(tmp_out)
    _swap_into_place(spark, tmp_out, path)
    return total, total - kept
