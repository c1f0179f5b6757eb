"""[EXT] Dataset profiling + vector aggregation — the "know your corpus"
operators a training-data pipeline runs before and after every curation
step.

Both operators are pure Column expressions (whole-stage codegen, no
Python on the hot path) and aggregate in one pass over the input:

- :func:`profile_table` — per-column row/null/distinct counts and numeric
  min/max in a single scan. The multi-column ``count(DISTINCT …)`` plans
  as one Expand + aggregate (one shuffle total, map-side partials); at
  100 TB swap exact distincts for ``approx_count_distinct`` — same plan
  shape, HLL-bounded state (see :func:`profile_table_approx`).

- :func:`label_centroids` — per-label mean embedding via posexplode →
  groupBy(label, pos). The explode widens rows ×dim, but the aggregate is
  codegen'd and combines map-side, so the shuffle carries only
  |labels|·dim partial sums per task — the scalable layout for vector
  reductions (contrast: collecting vectors to the driver, or a Python UDF
  averaging per group).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    other_cols: Sequence[str] = (),
) -> DataFrame:
    """Long-format profile: one row per column with
    (col_name, n_rows, n_null, n_distinct, min_d, max_d).

    min/max surface as DOUBLE for numeric columns and NULL otherwise, so
    the output schema is uniform across column types.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in [*numeric_cols, *other_cols]:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    one = df.agg(*aggs)

    rows = []
    for c in [*numeric_cols, *other_cols]:
        is_num = c in numeric_cols
        rows.append(
            [
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "min_d"
                ),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "max_d"
                ),
            ]
        )
    # one aggregated row fanned out into per-column rows — the fan-out is
    # over a 1-row frame, so the union is free
    out = one.select(*rows[0])
    for r in rows[1:]:
        out = out.unionByName(one.select(*r))
    return out


def profile_table_approx(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    other_cols: Sequence[str] = (),
    rsd: float = 0.05,
) -> DataFrame:
    """The 100 TB variant of :func:`profile_table`: HLL++ approximate
    distincts (bounded sketch state instead of an exact distinct
    Expand). Same output schema; n_distinct is approximate."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in [*numeric_cols, *other_cols]:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=rsd).alias(f"__nd_{c}")
        )
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in [*numeric_cols, *other_cols]:
        is_num = c in numeric_cols
        rows.append(
            [
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "min_d"
                ),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "max_d"
                ),
            ]
        )
    out = one.select(*rows[0])
    for r in rows[1:]:
        out = out.unionByName(one.select(*r))
    return out


def label_centroids(
    emb: DataFrame, *, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean embedding, long format (label, pos, centroid).

    posexplode → groupBy(label, pos) keeps everything in codegen; the
    mean is rounded to 6 digits so the float summation order (Spark's
    partial-aggregate tree vs any oracle's) cannot surface in the last
    bits. pos is 1-based to match SQL ``generate_subscripts``.
    """
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos0", "v"),
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
    )
