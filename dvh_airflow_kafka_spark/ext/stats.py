"""[EXT] Exact order statistics on quantized domains — by counting, not
sorting.

Spark's exact ``percentile``/``median`` aggregate buffers every value of a
group in executor memory, which collapses when a 100 TB corpus has a
handful of giant groups (five event types → five multi-TB buffers).  The
operators here exploit that pipeline metrics are *quantized* (cents,
token counts, byte sizes): the heavy pass is a map-side-combinable
``groupBy(key, value) → count`` whose output is bounded by the DOMAIN
cardinality (|keys| × |distinct values|), not the corpus row count.  All
subsequent rank arithmetic — cumulative bounds, median interpolation,
two-sample CDF distance — runs windows over that *small counts frame*,
so per-task state is O(distinct values per key) regardless of data size.

Determinism: every statistic is integer arithmetic plus exact dyadic
halving (medians of integers are worst-case ``x.5`` — exactly
representable doubles), so results are bit-identical to an ANSI-SQL
replay (DuckDB ``quantile_cont`` at 0.5 interpolates the same two middle
order statistics).

Reference parity note: the reference pipeline (navikt/dvh-airflow-kafka)
has no statistics layer at all — this module is part of the [EXT]
large-scale curation surface (robust outlier flagging, winsorized KPI
rollups, drift monitoring between ingest windows).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "keyed_dyadic_ewma",
    "keyed_rank_bounds",
    "keyed_values_at_ranks",
    "keyed_median",
    "keyed_median_mad",
    "keyed_ks_two_sample",
]


def _keys(key_cols: Union[str, list]) -> list:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def keyed_rank_bounds(
    df: DataFrame, key_cols: Union[str, list], val_col: str
) -> DataFrame:
    """Per-key rank interval of every distinct value: one combinable
    ``groupBy(key, value)`` counts shuffle, then a cumulative window
    over the counts frame.  Emits (keys…, val, ``__cnt``, ``__lo``,
    ``__hi``) where rows with that value occupy 1-based sort ranks
    [lo, hi] — the building block for order statistics, tie-averaged
    ranks ((lo+hi)/2), Gini rank sums and CDFs without ever sorting or
    buffering raw rows."""
    keys = _keys(key_cols)
    cnt = df.groupBy(*keys, val_col).agg(F.count(F.lit(1)).alias("__cnt"))
    return _bounds_over_counts(cnt, keys, val_col)


def _bounds_over_counts(cnt: DataFrame, keys: list, val_col: str) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(val_col)
    return cnt.withColumn("__hi", F.sum("__cnt").over(w)).withColumn(
        "__lo", F.col("__hi") - F.col("__cnt") + 1
    )


def keyed_values_at_ranks(
    df: DataFrame,
    key_cols: Union[str, list],
    val_col: str,
    rank_sqls: dict,
    with_total: Optional[str] = None,
) -> DataFrame:
    """Per-key order statistics at integer ranks, via counting.

    ``rank_sqls`` maps output column name → a SQL expression over the
    per-key total ``__n`` (BIGINT) that yields a 1-based target rank
    (e.g. ``"(5 * __n + 99) div 100"`` = ceil(0.05·n), the nearest-rank
    5th percentile).  Integer rank arithmetic only — no float quantile
    positions, so the selected element is identical in any engine.

    ``val_col`` must be integral (quantize floats first).  With
    ``with_total`` set, the per-key count is emitted under that name.

    Plan: one combinable shuffle on (key, value) → cumulative-rank
    window over the counts frame (bounded by domain cardinality) → one
    per-key reduce.  No raw row is ever sorted or buffered.
    """
    keys = _keys(key_cols)
    cnt = df.groupBy(*keys, val_col).agg(F.count(F.lit(1)).alias("__cnt"))
    bounds = _bounds_over_counts(cnt, keys, val_col)
    # totals aggregate the PRE-window counts frame: an unused window is
    # not pruned by Catalyst, and this branch doesn't need the ranks
    tot = cnt.groupBy(*keys).agg(F.sum("__cnt").alias("__n"))
    j = bounds.join(tot, keys)
    aggs = []
    for out, rank_sql in rank_sqls.items():
        r = F.expr(rank_sql)
        aggs.append(
            F.max(
                F.when((F.col("__lo") <= r) & (r <= F.col("__hi")), F.col(val_col))
            ).alias(out)
        )
    if with_total is not None:
        aggs.append(F.max("__n").alias(with_total))
    return j.groupBy(*keys).agg(*aggs)


def keyed_median(
    df: DataFrame,
    key_cols: Union[str, list],
    val_col: str,
    out: str = "median",
    with_total: Optional[str] = None,
) -> DataFrame:
    """Exact per-key median of an integral column: average of the two
    middle order statistics (== ``quantile_cont(x, 0.5)`` for integer
    input — linear interpolation at the exact midpoint).  Worst case is
    ``x.5``: an exactly-representable double, so cross-engine bit-equal.
    """
    keys = _keys(key_cols)
    v = keyed_values_at_ranks(
        df,
        keys,
        val_col,
        {"__v1": "(__n + 1) div 2", "__v2": "__n div 2 + 1"},
        with_total=with_total,
    )
    cols = [*keys, ((F.col("__v1") + F.col("__v2")) / F.lit(2.0)).alias(out)]
    if with_total is not None:
        cols.append(F.col(with_total))
    return v.select(*cols)


def keyed_median_mad(
    df: DataFrame,
    key_cols: Union[str, list],
    val_col: str,
    med_out: str = "median",
    mad_out: str = "mad",
) -> DataFrame:
    """Per-key (median, MAD) where MAD = median(|x − median|) — the
    robust location/scale pair (Hampel, 'The influence curve and its
    role in robust estimation', JASA 1974): a 3σ z-score threshold moves
    with every outlier it is meant to catch, while median/MAD have a 50%
    breakdown point.

    Two counting passes: one on the value domain, one on the deviation
    domain ``|2x − 2·median|`` (doubled to stay integral when the median
    is a half).  All quantities are dyadic rationals — deviations are
    halves, the MAD is worst-case a quarter — so doubles carry them
    exactly and any engine's 0.5-interpolating median agrees bit-for-bit.
    """
    keys = _keys(key_cols)
    # localCheckpoint: the median frame (one row per key) feeds both the
    # deviation pass and the final stats join; without materialization
    # the second consumer re-runs the whole counting pass over the fact
    med = keyed_median(df, keys, val_col, "__med").localCheckpoint(
        eager=False
    )
    dev = df.join(med, keys).select(
        *keys,
        F.abs(
            2 * F.col(val_col) - (2 * F.col("__med")).cast("bigint")
        ).alias("__d2"),
    )
    mad2 = keyed_median(dev, keys, "__d2", "__mad2")
    return (
        med.join(mad2, keys)
        .select(
            *keys,
            F.col("__med").alias(med_out),
            (F.col("__mad2") / F.lit(2.0)).alias(mad_out),
        )
    )


def keyed_ks_two_sample(
    df: DataFrame,
    key_cols: Union[str, list],
    val_col: str,
    side_col: str,
    n_a: str = "n_a",
    n_b: str = "n_b",
    ks_num: str = "ks_num",
    ks_stat: str = "ks_stat",
) -> DataFrame:
    """Per-key two-sample Kolmogorov–Smirnov statistic between the rows
    where boolean ``side_col`` is true (sample A) and false (sample B):
    ``D = max_v |F_A(v) − F_B(v)|`` — the standard distribution-drift
    monitor between ingest windows / sources.

    Computed integer-exactly as ``max |cumA·n_B − cumB·n_A|`` over the
    per-key quantized-value CDF (one combinable counts shuffle + a
    window over the counts frame), emitted both as the integer numerator
    (engine-independent) and as ``round(·/(n_A·n_B), 6)``.
    """
    keys = _keys(key_cols)
    side = F.col(side_col).cast("int")
    cnt = df.groupBy(*keys, val_col).agg(
        F.sum(side).alias("__a"), F.sum(1 - side).alias("__b")
    )
    w = Window.partitionBy(*keys).orderBy(val_col)
    cum = cnt.select(
        *keys,
        F.sum("__a").over(w).alias("__ca"),
        F.sum("__b").over(w).alias("__cb"),
    )
    tot = cnt.groupBy(*keys).agg(
        F.sum("__a").alias("__na"), F.sum("__b").alias("__nb")
    )
    j = cum.join(tot, keys)
    num = F.abs(F.col("__ca") * F.col("__nb") - F.col("__cb") * F.col("__na"))
    return j.groupBy(*keys).agg(
        F.max("__na").alias(n_a),
        F.max("__nb").alias(n_b),
        F.max(num).alias(ks_num),
        F.round(
            F.max(num).cast("double")
            / (F.max("__na") * F.max("__nb")).cast("double"),
            6,
        ).alias(ks_stat),
    )

def keyed_dyadic_ewma(
    df: DataFrame,
    key_cols: Union[str, list],
    order_cols: list,
    value: Column,
    taps: int = 30,
) -> DataFrame:
    """Exact k-tap exponentially-weighted moving average (α = 1/2) per
    key: the smoothing recurrence ``S_1 = x_1, S_i = (S_{i-1} + x_i)/2``
    truncated to the last ``taps`` observations in ``order_cols`` order.

    EWMA looks float-bound, but with α = 1/2 the unrolled form is a
    dyadic rational: ``S_s · 2^{s-1} = x_1 + Σ_{j=2..s} x_j · 2^{j-2}``
    — an INTEGER whenever the inputs are integers (cents, counts).  The
    operator emits that scaled integer plus ``s-1`` (the log2 of the
    denominator), and the double quotient, which is exact because the
    scaled sum fits well under 2^53 (|value| < 2^20, taps ≤ 30 ⇒ sum <
    2^50) and dividing by a power of two only shifts the exponent.
    Cross-engine comparison is therefore bit-exact, never
    tolerance-checked.

    Plan shape: one keyed window to keep the last ``taps`` rows, one to
    number them oldest-first (same exchange — both windows hash on the
    key), one aggregate — O(taps) rows per key past the first window
    and no sequential recurrence anywhere (the same unrolling family as
    the CUSUM operator's reflection identity).

    API CONTRACT: ``order_cols`` must be a TOTAL order within each key
    group (append a unique tiebreaker column — the catalog caller
    passes ``(ts, event_id)``).  ``row_number`` over a non-unique order
    picks an arbitrary permutation of ties, so both the taps-window cut
    and the dyadic weights would vary run to run and the bit-exact
    contract above would not hold."""
    keys = _keys(key_cols)
    wdesc = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    wasc = Window.partitionBy(*keys).orderBy(*order_cols)
    recent = (
        df.withColumn("__rnd", F.row_number().over(wdesc))
        .filter(F.col("__rnd") <= taps)
        .drop("__rnd")
    )
    numbered = recent.select(
        *keys,
        value.cast("bigint").alias("__x"),
        F.row_number().over(wasc).alias("__j"),
    )
    # SQL shiftleft takes a column shift amount; the Python wrapper
    # (F.shiftleft) only accepts a literal int
    weight = F.when(F.col("__j") == 1, F.lit(1).cast("bigint")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), __j - 2)")
    )
    return numbered.groupBy(*keys).agg(
        F.max("__j").cast("int").alias("n_taps"),
        F.sum(F.col("__x") * weight).alias("ewma_scaled"),
        (F.max("__j") - 1).cast("int").alias("denom_log2"),
        (
            F.sum(F.col("__x") * weight).cast("double")
            / F.expr(
                "shiftleft(CAST(1 AS BIGINT), max(__j) - 1)"
            ).cast("double")
        ).alias("ewma"),
    )
