"""Catalog family module (mechanical split of catalog.py, round 10).

See ``catalog/__init__.py`` for the module map.  Registration order is
preserved by import order; do not reorder modules or @register blocks.
"""
from __future__ import annotations

from dvh_airflow_kafka_spark.io import load_table
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from dvh_airflow_kafka_spark.catalog._core import (
    register,
)

# ==========================================================================
# Relational coverage beyond the reference (TPC-H-shaped + window/set ops)
# ==========================================================================


def _dec(col) -> F.Column:
    return col.cast("decimal(18,2)")


@register(
    "tpch_q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2))) *
                    (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan → partial agg → final agg.
    DECIMAL-exact arithmetic, cast to DOUBLE at the edge."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, ep, disc, tax = (
        _dec(F.col("l_quantity")),
        _dec(F.col("l_extendedprice")),
        _dec(F.col("l_discount")),
        _dec(F.col("l_tax")),
    )
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ep * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(ep).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3_topk_orders",
    sql="""
    WITH rev AS (
        SELECT l.l_orderkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev_dec,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT l_orderkey, CAST(rev_dec AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM rev
    QUALIFY row_number() OVER (ORDER BY rev_dec DESC, l_orderkey) <= 10
    """,
)
def tpch_q3_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join (customer broadcast), grouped revenue,
    deterministic top-10 (rank on the exact DECIMAL, tie-break orderkey)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * (F.lit(1) - _dec(F.col("l_discount"))))
            .alias("rev_dec")
        )
    )
    # global top-10 as orderBy+limit -> TakeOrderedAndProject: each
    # partition keeps its local top-10, the driver merges 10×partitions
    # rows — no all-rows-to-one-partition window exchange at 100 TB
    return (
        rev.orderBy(F.col("rev_dec").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "tpch_q5_regional_revenue",
    sql="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join; dimension chain broadcast, fact side
    shuffles once on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.sum(_dec(F.col("l_extendedprice")) * (F.lit(1) - _dec(F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q10_returned_items",
    sql="""
    WITH rev AS (
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev_dec
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    )
    SELECT c_custkey, c_name, CAST(rev_dec AS DOUBLE) AS revenue, c_acctbal, n_name
    FROM rev
    QUALIFY row_number() OVER (ORDER BY rev_dec DESC, c_custkey) <= 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: returned-item revenue per customer, top 20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * (F.lit(1) - _dec(F.col("l_discount"))))
            .alias("rev_dec")
        )
    )
    # TakeOrderedAndProject (see tpch_q3): distributed partial top-20,
    # no single-partition window exchange
    return (
        rev.orderBy(F.col("rev_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@register(
    "events_topk_per_user",
    sql="""
    SELECT user_id, event_id, "value" AS event_value,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY "value" DESC, event_id) AS BIGINT) AS rank
    FROM events
    QUALIFY rank <= 3
    """,
)
def events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — window row_number over a hash-partitioned sort
    (the 100 TB-safe top-k: no global sort, one shuffle on the group key)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.col("value").alias("event_value"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


@register(
    "events_sessionization",
    sql="""
    WITH g AS (
        SELECT user_id,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag+gap (30 min), the batch analogue of
    ``session_window`` — epoch-ms integer arithmetic on both engines."""
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ms.asc(), F.col("event_id").asc())
    prev = F.lag(ms).over(w)
    new_session = F.when(
        prev.isNull() | ((ms - prev) > 1800000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.select("user_id", "event_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "revenue_rollup",
    sql="""
    SELECT event_type,
           CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM events
    GROUP BY ROLLUP(event_type)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (subtotals + grand total) — grouping-set coverage
    the reference lacks entirely (SURVEY.md §2.9)."""
    events = load_table(spark, sf_dir, "events")
    return events.rollup("event_type").agg(
        F.sum(_dec(F.col("value"))).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "signup_no_purchase",
    sql="""
    SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'
    """,
)
def signup_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT DISTINCT) — (user, day) pairs with a click but
    no purchase."""
    events = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("d")
    click = events.filter(F.col("event_type") == "click").select("user_id", day)
    purchase = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    # subtract == EXCEPT DISTINCT (set semantics, matching SQL EXCEPT);
    # exceptAll would keep pairs whose click count merely exceeds purchases
    return click.subtract(purchase)


