"""Extended relational coverage: the rest of the TPC-H-shaped query
surface (adapted to the testdata schema — no partsupp / commitdate /
shipmode columns) plus an as-of join operator.

Every query follows the catalog's parity discipline:

- money/quantity math in DECIMAL(18,2)-derived exact arithmetic, cast to
  DOUBLE only at the output edge (bit-identical across Spark and DuckDB,
  immune to float summation order);
- integer SUMs cast to BIGINT in the DuckDB oracle (DuckDB yields
  HUGEINT; driver hashing is type-sensitive);
- threshold comparisons against an average rewritten as exact
  cross-multiplications (``5*qty*cnt < sum`` instead of
  ``qty < 0.2*sum/cnt``) so no engine-specific division rounding can
  flip a row in or out of the result;
- top-k always ordered with a unique tiebreak key so LIMIT is
  deterministic on both engines.

Scale notes (100 TB / 1000-executor mental model):

- part/supplier/nation/region/customer are dimension-sized → broadcast
  joins everywhere they appear; lineitem/orders shuffle at most once on
  their join key per query;
- aggregates are expressed as groupBy so Spark plans partial (map-side)
  aggregation before the exchange;
- scalar subqueries (q17 per-part avg, q22 global avg) become broadcast
  frames, never driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# _core, not the catalog package: relational is imported from inside the
# package's own initialization (q11_layout), so the package namespace is
# not yet populated at this point.
from dvh_airflow_kafka_spark.catalog._core import register
from dvh_airflow_kafka_spark.ext.profile import label_centroids, profile_table
from dvh_airflow_kafka_spark.ext.sampling import (
    hash_split,
    sql_bucket_predicate,
    stratified_hash_sample,
)
from dvh_airflow_kafka_spark.io import load_table
from dvh_airflow_kafka_spark.operators.skew import salted_join


def _dec(col) -> F.Column:
    return col.cast("decimal(18,2)")


def _rev() -> F.Column:
    """Exact-decimal extendedprice*(1-discount)."""
    return _dec(F.col("l_extendedprice")) * (
        F.lit(1) - _dec(F.col("l_discount"))
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))"
)


# ==========================================================================
# Q4 — order-priority checking (EXISTS semi-join)
# ==========================================================================


@register(
    "tpch_q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count per priority.
    (Adapted: no l_commitdate/l_receiptdate in the testdata, so "late"
    means shipped >30 days after the order date.)

    Plan: orders filtered at the scan (predicate pushdown on o_orderdate),
    semi-join on l_orderkey carries the non-equi lateness predicate in the
    join condition; one shuffle, then partial+final count.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ==========================================================================
# Q6 — forecasting revenue change (pure scan-aggregate)
# ==========================================================================


@register(
    "tpch_q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown test — every predicate reaches the
    parquet scan (`PushedFilters`), only 4 columns read, single partial →
    final SUM with no shuffle beyond the 1-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# ==========================================================================
# Q7 — volume shipping between two nations
# ==========================================================================


@register(
    "tpch_q7_volume_shipping",
    sql=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: lineitem⋈orders is the only big-big join (one shuffle on
    the orderkey); supplier/customer/nation are broadcast. The disjunctive
    two-nation filter is applied after the dimension joins, exactly where
    Catalyst can still prune rows before the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(F.sum(_rev()).cast("double").alias("revenue"))


# ==========================================================================
# Q8 — national market share within a region
# ==========================================================================


@register(
    "tpch_q8_market_share",
    sql=f"""
    WITH all_nations AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               {_REV_SQL} AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1999-01-01')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN volume END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of PROMO-part revenue sold into ASIA.
    Share = exact-decimal SUMs cast to DOUBLE, then a single IEEE division
    — identical on both engines. lineitem⋈orders is the one shuffle; all
    five dimension joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    vol = _rev().alias("volume")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                vol, F.col("supp_nation"))
    )
    share_num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
    ).cast("double")
    share_den = F.sum(F.col("volume")).cast("double")
    return joined.groupBy("o_year").agg(
        (share_num / share_den).cast("double").alias("mkt_share")
    )


# ==========================================================================
# Q12 — priority lines per linestatus (conditional aggregation)
# ==========================================================================


@register(
    "tpch_q12_priority_lines",
    sql="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode in testdata → grouped by
    l_linestatus): orders⋈lineitem on the orderkey, CASE-counting urgent
    vs non-urgent order priorities. One shuffle; the CASE sums fold into
    the partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


# ==========================================================================
# Q13 — customer order-count distribution (outer join + double groupBy)
# ==========================================================================


@register(
    "tpch_q13_order_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join keeps order-less customers (c_count=0),
    the join-side filter lives in the join condition (not a WHERE, which
    would turn the outer join inner). Two aggregations: per-customer count
    (shuffle on custkey) then the tiny distribution rollup."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, on=cond, how="left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ==========================================================================
# Q14 — promotion revenue share
# ==========================================================================


@register(
    "tpch_q14_promo_revenue",
    sql=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN {_REV_SQL} END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: one broadcast join (part is a dimension), date filter
    pushed to the lineitem scan, exact-decimal sums → one IEEE division at
    the edge."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev())).cast("double")
    total = F.sum(_rev()).cast("double")
    return joined.agg(
        (F.lit(100.0) * promo / total).cast("double").alias("promo_revenue")
    )


# ==========================================================================
# Q17 — small-quantity-order revenue (per-part average as broadcast frame)
# ==========================================================================


@register(
    "tpch_q17_small_qty_revenue",
    sql="""
    WITH brand_parts AS (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
    per_part AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem l JOIN brand_parts b ON l.l_partkey = b.p_partkey
        GROUP BY l.l_partkey)
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN per_part a ON l.l_partkey = a.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * a.cnt < a.sum_qty
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated ``l_quantity < 0.2*avg(l_quantity)``
    subquery becomes a per-part (sum, count) aggregate joined back —
    broadcast, since only one brand's parts survive. The threshold is the
    exact cross-multiplication ``5*qty*cnt < sum`` so no division rounding
    differs between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    brand_li = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = brand_li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_dec(F.col("l_quantity"))).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = brand_li.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("a_partkey")
    ).filter(_dec(F.col("l_quantity")) * 5 * F.col("cnt") < F.col("sum_qty"))
    return small.agg(
        (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly")
    )


# ==========================================================================
# Q18 — large-volume customers (HAVING over a fact aggregate)
# ==========================================================================


@register(
    "tpch_q18_large_volume",
    sql="""
    WITH big AS (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(b.sum_qty AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: aggregate lineitem per order (map-side partial sums),
    HAVING keeps the rare >300-quantity orders, then the small survivor
    set broadcast-joins to orders and customer — the big fact is touched
    exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        F.broadcast(big)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


# ==========================================================================
# Q19 — disjunctive predicate revenue (OR-of-ANDs join filter)
# ==========================================================================


@register(
    "tpch_q19_disjunct_revenue",
    sql=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (brand, size, quantity) triples on a
    broadcast part join. Catalyst extracts the common `p_partkey` equi-key
    so this stays a hash join with the OR as a post-join filter; the
    brand/size disjunction also prunes the broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 20) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 30) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ==========================================================================
# Q21 — suppliers who alone shipped late in multi-supplier orders
# ==========================================================================


@register(
    "tpch_q21_late_sole_supplier",
    sql="""
    WITH fo AS (
        SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
    flag AS (
        SELECT l.l_orderkey, l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > fo.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
        GROUP BY l.l_orderkey, l.l_suppkey),
    per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_supp,
               CAST(SUM(is_late) AS BIGINT) AS n_late
        FROM flag GROUP BY l_orderkey)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flag f
    JOIN per_order p ON f.l_orderkey = p.l_orderkey
    JOIN supplier s  ON f.l_suppkey = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE f.is_late = 1 AND p.n_supp >= 2 AND p.n_late = 1
      AND n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
    GROUP BY s.s_name
    """,
)
def tpch_q21_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped >60 days after the order
    date): the EXISTS / NOT EXISTS pair over sibling lineitems becomes two
    stacked aggregates — per-(order,supplier) lateness flags, then
    per-order supplier/late counts — followed by broadcast dimension
    joins. The fact shuffles once on the orderkey and the two aggregates
    reuse that partitioning (no second exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    fo = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"), 1
    ).otherwise(0)
    # One explicit hash partitioning on the orderkey, then every
    # downstream step reuses it: groupBy(orderkey, suppkey) and
    # groupBy(orderkey) both satisfy their clustering from the subset
    # rule, and the flag⋈per_order self-join co-locates for free —
    # 2 total shuffles instead of 5.
    flag = (
        li.join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
        # both sides of the flag⋈per_order self-join read this frame;
        # localCheckpoint materialises the scan+join+agg once instead of
        # twice and, unlike cache(), frees its blocks when the frame is
        # collected (no CacheManager pin in long sessions)
        .localCheckpoint(eager=False)
    )
    per_order = flag.groupBy(F.col("l_orderkey").alias("p_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").cast("bigint").alias("n_late"),
    )
    return (
        flag.filter(F.col("is_late") == 1)
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("p_orderkey"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ==========================================================================
# Q22 — idle high-balance customers (scalar subquery + anti-join)
# ==========================================================================


@register(
    "tpch_q22_idle_customers",
    sql="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)),
    avg_pos AS (
        SELECT SUM(bal) AS sum_bal, COUNT(*) AS cnt
        FROM pool WHERE bal > 0)
    SELECT p.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(p.bal) AS DOUBLE) AS totacctbal
    FROM pool p, avg_pos a
    WHERE p.bal * a.cnt > a.sum_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY p.c_nationkey
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: every testdata customer has at least one
    order, so "idle" means no orders since 2000-06-01): the scalar AVG
    subquery becomes a broadcast 1-row (sum, count) frame and the
    comparison the exact cross-multiplication ``bal*cnt > sum``; lapsed
    customers survive a left-anti join (NOT EXISTS) against the recent
    order scan — whose date predicate pushes down to parquet."""
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select("c_custkey", "c_nationkey", _dec(F.col("c_acctbal")).alias("bal"))
    )
    avg_pos = pool.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("sum_bal"), F.count(F.lit(1)).alias("cnt")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("bal") * F.col("cnt") > F.col("sum_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


# ==========================================================================
# As-of join — each purchase matched to the latest strictly-prior view
# ==========================================================================


@register(
    "events_asof_join",
    sql="""
    WITH tagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind_rank,
               CASE WHEN event_type = 'view' THEN event_id END AS v_id,
               CASE WHEN event_type = 'view' THEN ts END AS v_ts
        FROM events WHERE event_type IN ('purchase', 'view')),
    matched AS (
        SELECT user_id, ts, event_id, kind_rank,
               LAST_VALUE(v_id IGNORE NULLS) OVER w AS view_event_id,
               LAST_VALUE(v_ts IGNORE NULLS) OVER w AS view_ts
        FROM tagged
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts, kind_rank, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts,
           view_event_id, view_ts
    FROM matched WHERE kind_rank = 0
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, strict): every 'purchase' event paired with
    the same user's latest 'view' whose ts is strictly earlier.

    Spark has no ASOF JOIN operator; the scalable composition is the
    union-tag trick — one shuffle on user_id, one sort inside each
    partition, no range-join explosion:

    1. tag both sides into one frame (purchases sort *before* views at
       equal ts, making the match strictly-prior);
    2. window `last(view_cols, ignorenulls=True)` over
       rowsBetween(unboundedPreceding, -1);
    3. keep the purchase rows.

    At 100 TB this is a single repartition by user_id — contrast with the
    O(n·m) theta-join a naive `l.ts >= r.ts` range join would plan.
    event_id breaks ordering ties deterministically on both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind_rank"),
        F.when(is_view, F.col("event_id")).alias("v_id"),
        F.when(is_view, F.col("ts")).alias("v_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind_rank", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "kind_rank",
        F.last("v_id", ignorenulls=True).over(w).alias("view_event_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
    )
    return matched.filter(F.col("kind_rank") == 0).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "view_event_id",
        "view_ts",
    )


# ==========================================================================
# [EXT] corpus profiling, vector centroids, skew-safe join
# ==========================================================================


@register(
    "table_profile_events",
    sql="""
    SELECT 'user_id' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(user_id) AS n_null,
           COUNT(DISTINCT user_id) AS n_distinct,
           CAST(MIN(user_id) AS DOUBLE) AS min_d,
           CAST(MAX(user_id) AS DOUBLE) AS max_d
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT("value"),
           COUNT(DISTINCT "value"),
           CAST(MIN("value") AS DOUBLE), CAST(MAX("value") AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
           COUNT(DISTINCT props),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM events
    """,
)
def table_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] One-pass dataset profile of the events table (row/null/
    distinct counts, numeric min/max) — the pre-curation corpus check.
    ``profile_table_approx`` is the same operator with HLL distincts for
    the 100 TB path (pytest-bounded; exact version is the oracle here)."""
    ev = load_table(spark, sf_dir, "events")
    return profile_table(
        ev, numeric_cols=["user_id", "value"], other_cols=["event_type", "props"]
    )


@register(
    "embedding_label_centroids",
    sql="""
    SELECT label, pos, ROUND(AVG(v), 6) AS centroid
    FROM (
        SELECT label,
               CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings)
    GROUP BY label, pos
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-label mean embedding via posexplode → groupBy(label,
    pos): vector reduction entirely in codegen, map-side partial sums,
    one shuffle of |labels|·dim partials. The building block for IVF
    coarse centroids and class prototypes."""
    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb)


@register(
    "salted_segment_revenue",
    sql="""
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Market-segment revenue through the skew-safe salted join:
    the fact side salted into 8 sub-keys, the dimension exploded ×8, join
    on (key, salt) — a hot customer's orders spread over 8 tasks instead
    of one. The plain-join oracle proves result equivalence."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = salted_join(orders, cust, on=["o_custkey"], n_salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ==========================================================================
# Ordered-statistics, pivot, session_window, ntile coverage
# ==========================================================================


@register(
    "events_value_percentiles",
    sql="""
    SELECT event_type,
           quantile_cont("value", 0.5)  AS p50,
           quantile_cont("value", 0.90) AS p90,
           quantile_cont("value", 0.99) AS p99,
           median("value") AS med,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ordered statistics per group: Spark ``percentile``/``median``
    and DuckDB ``quantile_cont`` share the linear-interpolation definition,
    so the values are bit-identical (probed, not assumed). At 100 TB the
    exact sort-based percentile becomes ``approx_percentile`` (KLL/GK
    sketch) — same call shape, bounded state."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("value"), F.lit(0.90)).alias("p90"),
        F.percentile(F.col("value"), F.lit(0.99)).alias("p99"),
        F.median("value").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_session_window",
    sql="""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    s AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS sid
        FROM t)
    SELECT user_id, MIN(us) AS start_us,
           MAX(us) + 1800000000 AS end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE gap-session operator — ``F.session_window`` groupBy —
    oracled against the same lag/cumsum SQL as the stateful streaming
    variant (a session window's end is last_event + gap by definition).
    One shuffle on (user, session); Spark merges overlapping candidate
    windows inside the aggregate. The third sessionization in the repo:
    batch lag/cumsum == this native operator == applyInPandasWithState
    stream, all provably equal on the same data."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )


@register(
    "user_event_pivot",
    sql="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
)
def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event-type counts. The explicit
    value list keeps the plan a single-pass conditional aggregate — an
    unlisted pivot needs an extra distinct-values job first, a full scan
    a 100 TB pipeline shouldn't pay."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


@register(
    "customer_acctbal_deciles",
    sql="""
    WITH d AS (
        SELECT c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer)
    SELECT decile, COUNT(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
           CAST(MAX(c_acctbal) AS DOUBLE) AS hi
    FROM d GROUP BY decile
    """,
)
def customer_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile profile of customer balances (unique tiebreak key
    makes the tile assignment deterministic on both engines). No global
    window: the exact global rank comes from the distributed two-pass
    form (range slices + broadcast offsets, ``ext/ranking.py``) and the
    NTILE bucket is plain arithmetic on (rank, total) — bit-identical to
    the oracle's NTILE, largest task holds one slice, not the table."""
    from dvh_airflow_kafka_spark.ext.ranking import ntile_from_rank, with_global_rank

    cust = load_table(spark, sf_dir, "customer")
    ranked, total = with_global_rank(
        cust.select("c_acctbal", "c_custkey"),
        ["c_acctbal", "c_custkey"],
        rank_col="_rank",
    )
    return (
        ranked.select(
            "c_acctbal",
            ntile_from_rank(F.col("_rank"), total, 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").cast("double").alias("lo"),
            F.max("c_acctbal").cast("double").alias("hi"),
        )
    )


# ==========================================================================
# [EXT] training-data splits, stratified sampling, TF-IDF terms
# ==========================================================================


@register(
    "documents_train_test_split",
    sql=f"""
    SELECT CASE WHEN {sql_bucket_predicate('doc_id', 0.8)}
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1
    """,
)
def documents_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic leakage-free train/test split: sha256-prefix
    bucketing on doc_id (lexicographic hex compare == 32-bit numeric
    compare, so Spark and the oracle agree bit-for-bit). No shuffle, no
    seed/order sensitivity; adding documents never moves old ones."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", train_frac=0.8)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@register(
    "events_stratified_sample",
    sql=f"""
    SELECT event_type, COUNT(*) AS n_kept
    FROM events
    WHERE {sql_bucket_predicate('event_id', 0.1, salt='sample-v1')}
    GROUP BY event_type
    """,
)
def events_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic ~10% downsample, uniform within every stratum
    — the reproducible replacement for ``sampleBy`` (whose survivors
    depend on seed + partitioning). Scan-fused predicate, zero shuffle
    before the count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        stratified_hash_sample(ev, "event_id", frac=0.1, salt="sample-v1")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "doc_tfidf_top_terms",
    sql="""
    WITH toks AS (
        SELECT doc_id,
               lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS term
        FROM documents),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks GROUP BY doc_id, term),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, score
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf DESC, df ASC, term) <= 3
    """,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Top-3 TF-IDF terms per document.

    Plan: tokenize (regexp, scan-fused) → explode → TF aggregate (one
    shuffle on (doc, term)) → DF aggregate reusing the same frame →
    broadcast the term-DF back → per-doc window top-k. Ranking is on
    integers (tf desc, df asc, term) so cross-engine float `ln` ulps
    cannot reorder rows; the score itself is rounded to 6 digits at the
    edge. ASCII-only token regex sidesteps locale-dependent unicode
    lowercasing differences between engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), 0)
        ).alias("tok"),
    ).select("doc_id", F.lower(F.col("tok")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # TF feeds both the DF aggregate and the score join; localCheckpoint
    # (not cache) so blocks release when the frame is collected
    tf = tf.localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # driver-side scalar: one tiny jobs, literal after
    scored = tf.join(F.broadcast(df_), on="term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ==========================================================================
# [EXT] connected components: near-dup pairs -> dedup clusters
# ==========================================================================


@register(
    "ngram_dedup_clusters",
    sql=r"""
    WITH RECURSIVE w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS wl FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(wl) >= 3
                   THEN list_transform(range(1, len(wl) - 1),
                                       i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
                   ELSE [array_to_string(wl, ' ')] END) AS s
        FROM w
    ), inv AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), sizes AS (SELECT doc_id, len(s) AS n FROM sh
    ), pairs AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.2
    ), edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(node, lbl) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node
    )
    SELECT node AS doc_id, MIN(lbl) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def ngram_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The full dedup closure: exact n-gram Jaccard pairs →
    distributed connected components → (doc_id, cluster_id = min doc of
    the transitive cluster). The oracle recomputes the same pairs and
    closes them with a recursive CTE — Spark's iterative min-label
    propagation must land on the identical fixpoint."""
    from dvh_airflow_kafka_spark.ext import dedup as xdedup
    from dvh_airflow_kafka_spark.ext.components import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = xdedup.ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.2)
    return dedup_clusters(pairs.select("id_a", "id_b"), shuffle_partitions=8)


@register(
    "revenue_cube",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping-set levels in
    one pass — Spark plans a single Expand + aggregate, not four scans.
    Complements the ROLLUP already covered by revenue_rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "split_contamination_pairs",
    sql=rf"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS wl FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(wl) >= 3
                   THEN list_transform(range(1, len(wl) - 1),
                                       i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])
                   ELSE [array_to_string(wl, ' ')] END) AS s
        FROM w
    ), inv AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), sizes AS (SELECT doc_id, len(s) AS n FROM sh
    ), pairs AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.2
    ), split AS (
        SELECT doc_id,
               CASE WHEN {sql_bucket_predicate('doc_id', 0.8)}
                    THEN 'train' ELSE 'test' END AS split
        FROM documents)
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
    FROM pairs p
    JOIN split sa ON sa.doc_id = p.id_a
    JOIN split sb ON sb.doc_id = p.id_b
    WHERE sa.split <> sb.split
    """,
)
def split_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Train/test decontamination: near-duplicate pairs that
    straddle the split boundary — the documents whose test-set membership
    leaks training signal. Composes the exact n-gram Jaccard detector
    with the deterministic hash split; at 100 TB the same composition
    runs with MinHash-LSH candidates in place of the exact detector.
    The fix is then one anti-join of the test split against ``id_b``."""
    from dvh_airflow_kafka_spark.ext import dedup as xdedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = xdedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", ngram=3, threshold=0.2
    ).select("id_a", "id_b")
    split = hash_split(docs.select("doc_id"), "doc_id", train_frac=0.8)
    sa = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(F.broadcast(sa), on="id_a")
        .join(F.broadcast(sb), on="id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b")
    )


@register(
    "lang_balanced_sample",
    sql=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY substr(sha256('balance-v1' ||
                                          CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id) AS rn
        FROM documents)
    SELECT doc_id, lang FROM ranked WHERE rn <= 40
    """,
)
def lang_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Class-balanced downsample: at most 40 documents per
    language, chosen by deterministic hash order (not arbitrary row
    order), so over-represented classes shrink while the selection stays
    reproducible across runs, partitionings, and engines. One shuffle on
    the class key; per-class state is a row counter."""
    docs = load_table(spark, sf_dir, "documents")
    from dvh_airflow_kafka_spark.ext.sampling import split_bucket

    w = Window.partitionBy("lang").orderBy(
        split_bucket(F.col("doc_id"), "balance-v1"), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 40)
        .select("doc_id", "lang")
    )


@register(
    "events_value_histogram",
    sql="""
    WITH b AS (
        SELECT MIN("value") AS lo, MAX("value") AS hi FROM events)
    SELECT LEAST(CAST(FLOOR(("value" - b.lo) / (b.hi - b.lo) * 20)
                      AS INT), 19) AS bucket,
           COUNT(*) AS n
    FROM events, b
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bucket histogram of event values: global min/max as
    a broadcast 1-row frame (no driver collect), bucket arithmetic in
    IEEE doubles — identical inputs give identical buckets on both
    engines. The two-pass shape (bounds, then bucketing) is the standard
    distributed histogram; a single-pass approx variant would use
    approx_percentile cutpoints."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.floor(
            (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 20
        ).cast("int"),
        F.lit(19),
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ==========================================================================
# Q2 / Q15 / Q16 shapes — the remaining expressible TPC-H surface
# (q9/q11/q20 need the partsupp table, which the testdata does not have)
# ==========================================================================


@register(
    "tpch_q2_best_supplier",
    sql="""
    WITH ps AS (
        SELECT DISTINCT l.l_partkey, l.l_suppkey
        FROM lineitem l),
    cand AS (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
               n.n_name
        FROM ps
        JOIN part p     ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND r.r_name = 'EUROPE')
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY p_partkey
                               ORDER BY s_acctbal DESC, s_suppkey) = 1
    """,
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp, so part↔supplier pairs come
    from distinct lineitem shipments, and "best" is max account balance
    instead of min supply cost): the correlated min-subquery becomes a
    per-part window rank — one pass, no re-join against the aggregate.
    The distinct pair projection shuffles once on (part, supp); all
    dimension joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        ps.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@register(
    "tpch_q15_top_supplier",
    sql=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_REV_SQL}) AS total_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_dec AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON r.supplier_no = s.s_suppkey
    WHERE r.total_dec = (SELECT MAX(total_dec) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the revenue "view" aggregates once (exact decimal), the
    scalar MAX subquery becomes a broadcast 1-row frame, and equality on
    the exact decimal keeps ties — the same rows the SQL MAX-subquery
    form returns. No second pass over the fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_dec")
    )
    # feeds both the max probe and the result join; localCheckpoint (not
    # cache) so blocks release when the frame is collected
    rev = rev.localCheckpoint(eager=False)
    mx = rev.agg(F.max("total_dec").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q16_part_supplier_counts",
    sql="""
    WITH ps AS (
        SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    with NOT-predicates pruning the broadcast part side (no complaint
    suppliers to exclude — the testdata has no comment column, so the
    anti-join leg drops out). COUNT(DISTINCT) over the pre-distincted
    pair projection keeps the expand bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "purchasers_without_errors",
    sql="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND "value" > 200
    """,
)
def purchasers_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage: (purchasers ∩ viewers) ∖ big-error users.
    INTERSECT/EXCEPT plan as semi/anti hash joins over pre-distincted
    keys — one shuffle each, no full-row comparison."""
    ev = load_table(spark, sf_dir, "events")
    of = lambda t: ev.filter(F.col("event_type") == t).select("user_id")
    big_err = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 200))
        .select("user_id")
        .distinct()
    )
    return of("purchase").intersect(of("view")).exceptAll(big_err).distinct()


@register(
    "signup_to_purchase_funnel",
    sql="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_signed_up,
           CAST(SUM(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_viewed_after,
           CAST(SUM(CASE WHEN t_buy > t_view AND t_view > t_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM per_user WHERE t_signup IS NOT NULL
    """,
)
def signup_to_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → view → purchase): per-user
    first-occurrence timestamps via conditional MIN in ONE pass over the
    fact (no per-step self-joins — the naive 3-way join shape shuffles
    the fact three times; this shuffles once on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("view").alias("t_view"),
        first("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view") > F.col("t_signup")
    converted = (F.col("t_buy") > F.col("t_view")) & viewed
    return per_user.filter(F.col("t_signup").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.sum(viewed.cast("int")).cast("bigint").alias("n_viewed_after"),
        F.sum(converted.cast("int")).cast("bigint").alias("n_converted"),
    )


# ==========================================================================
# Synthesized partsupp: the testdata ships no partsupp table, so the three
# TPC-H shapes that need one (q9/q11/q20) derive it deterministically from
# lineitem's distinct (l_partkey, l_suppkey) pairs — consistent with the
# fact by construction — plus pure integer arithmetic on the keys for
# availqty/supplycost. The same arithmetic runs on both engines, so the
# derived table is bit-identical to the oracle's CTE. supplycost is
# integer-valued dollars (1..999) to keep every money product exact in
# DECIMAL with no cross-engine division.
# ==========================================================================

_PARTSUPP_SQL = """
    partsupp AS (
        SELECT l_partkey AS ps_partkey,
               l_suppkey AS ps_suppkey,
               CAST((l_partkey * 31 + l_suppkey * 7) % 9999 + 1 AS INTEGER)
                   AS ps_availqty,
               CAST((l_partkey * 37 + l_suppkey * 11) % 999 + 1
                    AS DECIMAL(18,2)) AS ps_supplycost
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    )
"""


def synthesized_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of the partsupp synthesis (see `_PARTSUPP_SQL`)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return pairs.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 7) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        ((F.col("l_partkey") * 37 + F.col("l_suppkey") * 11) % 999 + 1)
        .cast("decimal(18,2)")
        .alias("ps_supplycost"),
    )


@register(
    "tpch_q9_product_profit",
    sql="WITH " + _PARTSUPP_SQL + f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({_REV_SQL}
                    - ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey
                    AND ps.ps_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year) over the
    synthesized partsupp. Plan: lineitem shuffles once on the agg key;
    part/supplier/nation broadcast; partsupp (a distinct projection of
    lineitem pairs) joins on the composite (partkey, suppkey) — at scale
    a real partsupp would be a bucketed dimension and this join
    shuffle-free. Profit math stays in DECIMAL end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    ps = synthesized_partsupp(spark, sf_dir)
    profit = _rev() - F.col("ps_supplycost") * _dec(F.col("l_quantity"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    sql="WITH " + _PARTSUPP_SQL + """
    , vals AS (
        SELECT ps.ps_partkey,
               SUM(CAST(ps.ps_supplycost AS BIGINT) * ps.ps_availqty)
                   AS part_value
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = (SELECT min(n_name) FROM nation)
        GROUP BY ps.ps_partkey
    )
    SELECT ps_partkey, CAST(part_value AS BIGINT) AS part_value
    FROM vals
    WHERE part_value * (SELECT COUNT(*) FROM vals)
          > 2 * (SELECT SUM(part_value) FROM vals)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): one nation's
    partsupp value per part, kept when it exceeds 1/2000 of that
    nation's total. supplycost is integer-valued by construction so
    part_value is an exact BIGINT; the global total is a 1-row broadcast
    (never a driver collect) and the threshold is the exact
    cross-multiplication ``value*2000 > total``."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ps = synthesized_partsupp(spark, sf_dir)
    pick = nation.agg(F.min("n_name").alias("__pick"))
    nat = nation.join(
        F.broadcast(pick), F.col("n_name") == F.col("__pick")
    ).select("n_nationkey")
    vals = (
        ps.join(F.broadcast(supp), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost").cast("bigint") * F.col("ps_availqty")
            ).alias("part_value")
        )
        # consumed twice (threshold scan + global total); pinning the
        # per-part aggregate (one row per partkey) avoids re-deriving
        # the whole partsupp lineage for the 1-row total
        .persist()
    )
    total = vals.agg(
        F.sum("part_value").alias("__total"),
        F.count(F.lit(1)).alias("__nparts"),
    )
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("part_value") * F.col("__nparts") > 2 * F.col("__total"))
        .select("ps_partkey", F.col("part_value").cast("bigint").alias("part_value"))
    )


@register(
    "tpch_q20_potential_promotion",
    sql="WITH " + _PARTSUPP_SQL + """
    , shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) = 1996
        GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM partsupp ps
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                   AND sh.l_suppkey = ps.ps_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    WHERE p.p_name LIKE 'sm%'
      AND 2 * ps.ps_availqty > sh.qty
    """,
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    available stock of 'sm%' parts exceeds half the quantity they
    shipped in 1996. The half-threshold is the exact cross-multiplied
    ``2*availqty > qty`` (quantities are integer-valued doubles; the
    comparison is exact below 2^52). One shuffle for the shipped agg;
    part/supplier broadcast; DISTINCT collapses per-part hits."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("sm%"))
    supp = load_table(spark, sf_dir, "supplier")
    ps = synthesized_partsupp(spark, sf_dir)
    shipped = (
        li.filter(F.year("l_shipdate") == 1996)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    return (
        ps.join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("ps_suppkey"))
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
