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


def _swap_into_place(tmp_out: str, path: str) -> None:
    """Replace ``path`` with ``tmp_out`` as atomically as a local FS
    allows (rename of the old dir out of the way, new one in)."""
    trash = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    os.rename(tmp_out, path)
    shutil.rmtree(trash)


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
    total = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp_out = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp_out)
    _swap_into_place(tmp_out, path)
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
    _swap_into_place(tmp_out, target_path)


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
