"""Differential query fuzzing: hypothesis composes random
filter/group/aggregate specs over the events table; each spec is
rendered BOTH as a Spark DataFrame plan and as DuckDB SQL and the
results must agree exactly. This sweeps the composition space the
hand-written catalog can't enumerate — predicate pushdown interactions,
empty groups, all-filtered inputs, modular bucketing edge cases."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"
EVENTS_PARQUET = f"{SF_DIR}/events.parquet"

_TYPES = ["click", "view", "purchase", "signup", "error"]


@st.composite
def query_specs(draw):
    preds = []
    if draw(st.booleans()):
        thr = draw(st.integers(min_value=0, max_value=500))
        op = draw(st.sampled_from([">", "<=", "="]))
        preds.append(("value", op, float(thr)))
    if draw(st.booleans()):
        subset = draw(
            st.lists(st.sampled_from(_TYPES), min_size=1, max_size=3, unique=True)
        )
        preds.append(("type_in", None, subset))
    if draw(st.booleans()):
        k = draw(st.integers(min_value=2, max_value=9))
        r = draw(st.integers(min_value=0, max_value=8)) % k
        preds.append(("user_mod", k, r))
    group = draw(st.sampled_from(["event_type", "user_bucket", None]))
    aggs = draw(
        st.lists(
            st.sampled_from(["n", "sum_cents", "min_id", "max_id", "n_users"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    return {"preds": preds, "group": group, "aggs": aggs}


_AGG_SQL = {
    "n": "COUNT(*) AS n",
    "sum_cents": "CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
    " AS sum_cents",
    "min_id": "MIN(event_id) AS min_id",
    "max_id": "MAX(event_id) AS max_id",
    "n_users": "COUNT(DISTINCT user_id) AS n_users",
}


def _spark_aggs(names):
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    m = {
        "n": F.count(F.lit(1)).alias("n"),
        "sum_cents": F.sum(cents).cast("bigint").alias("sum_cents"),
        "min_id": F.min("event_id").alias("min_id"),
        "max_id": F.max("event_id").alias("max_id"),
        "n_users": F.count_distinct("user_id").alias("n_users"),
    }
    return [m[n] for n in names]


def _render(spec):
    """spec -> (spark_fn, sql_text) over the same logical query."""
    wheres = []
    sparks = []
    for p in spec["preds"]:
        if p[0] == "value":
            _, op, thr = p
            wheres.append(f"value {op} {thr}")
            col = F.col("value")
            sparks.append(
                {">": col > thr, "<=": col <= thr, "=": col == thr}[op]
            )
        elif p[0] == "type_in":
            vals = ", ".join(f"'{v}'" for v in p[2])
            wheres.append(f"event_type IN ({vals})")
            sparks.append(F.col("event_type").isin(*p[2]))
        elif p[0] == "user_mod":
            _, k, r = p
            wheres.append(f"user_id % {k} = {r}")
            sparks.append(F.col("user_id") % k == r)
    where_sql = (" WHERE " + " AND ".join(wheres)) if wheres else ""
    agg_sql = ", ".join(_AGG_SQL[a] for a in spec["aggs"])
    if spec["group"] == "event_type":
        group_sql = "event_type, "
        sql = (
            f"SELECT event_type AS g, {agg_sql} FROM events{where_sql} "
            "GROUP BY event_type"
        )
        gcol = F.col("event_type").alias("g")
    elif spec["group"] == "user_bucket":
        sql = (
            f"SELECT user_id % 7 AS g, {agg_sql} FROM events{where_sql} "
            "GROUP BY user_id % 7"
        )
        gcol = (F.col("user_id") % 7).alias("g")
    else:
        sql = f"SELECT {agg_sql} FROM events{where_sql}"
        gcol = None

    def run(spark):
        df = load_table(spark, SF_DIR, "events")
        for c in sparks:
            df = df.filter(c)
        if gcol is not None:
            return df.groupBy(gcol).agg(*_spark_aggs(spec["aggs"]))
        return df.agg(*_spark_aggs(spec["aggs"]))

    return run, sql


@settings(max_examples=20, deadline=None)
@given(spec=query_specs())
def test_differential_spec(spark, spec):
    run, sql = _render(spec)
    got = sorted(tuple(r) for r in run(spark).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS_PARQUET}')"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    # SUM over zero rows: Spark/Duck both NULL; COUNT 0 — tuples equal
    assert got == want, f"spec={spec}\nsql={sql}"


_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_STATUS = ["O", "F", "P"]


@st.composite
def join_specs(draw):
    preds = []
    if draw(st.booleans()):
        preds.append(
            ("status", draw(st.lists(st.sampled_from(_STATUS), min_size=1,
                                     max_size=2, unique=True)))
        )
    if draw(st.booleans()):
        preds.append(
            ("segment", draw(st.lists(st.sampled_from(_SEGS), min_size=1,
                                      max_size=3, unique=True)))
        )
    if draw(st.booleans()):
        thr = draw(st.integers(min_value=1000, max_value=300000))
        preds.append(("price", thr))
    group = draw(st.sampled_from(["segment", "status", None]))
    return {"preds": preds, "group": group}


@settings(max_examples=15, deadline=None)
@given(spec=join_specs())
def test_differential_join_spec(spark, spec):
    """Random orders⋈customer filter/group specs, DataFrame vs SQL."""
    wheres, fs = [], []
    for p in spec["preds"]:
        if p[0] == "status":
            vals = ", ".join(f"'{v}'" for v in p[1])
            wheres.append(f"o.o_orderstatus IN ({vals})")
            fs.append(F.col("o_orderstatus").isin(*p[1]))
        elif p[0] == "segment":
            vals = ", ".join(f"'{v}'" for v in p[1])
            wheres.append(f"c.c_mktsegment IN ({vals})")
            fs.append(F.col("c_mktsegment").isin(*p[1]))
        elif p[0] == "price":
            wheres.append(f"o.o_totalprice > {p[1]}")
            fs.append(F.col("o_totalprice") > p[1])
    where_sql = (" WHERE " + " AND ".join(wheres)) if wheres else ""
    aggs_sql = (
        "COUNT(*) AS n, CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5)"
        " AS BIGINT)) AS BIGINT) AS cents"
    )
    gmap = {"segment": "c.c_mktsegment", "status": "o.o_orderstatus"}
    if spec["group"]:
        g = gmap[spec["group"]]
        sql = (
            f"SELECT {g} AS g, {aggs_sql} FROM orders o "
            f"JOIN customer c ON c.c_custkey = o.o_custkey{where_sql} "
            f"GROUP BY {g}"
        )
    else:
        sql = (
            f"SELECT {aggs_sql} FROM orders o "
            f"JOIN customer c ON c.c_custkey = o.o_custkey{where_sql}"
        )

    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    df = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
    for c in fs:
        df = df.filter(c)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("bigint").alias("cents"),
    ]
    if spec["group"]:
        gc = {"segment": "c_mktsegment", "status": "o_orderstatus"}[spec["group"]]
        out = df.groupBy(F.col(gc).alias("g")).agg(*aggs)
    else:
        out = df.agg(*aggs)
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"spec={spec}\nsql={sql}"


@st.composite
def window_specs(draw):
    part = draw(st.sampled_from(["event_type", "user_mod"]))
    k = draw(st.integers(min_value=2, max_value=9))
    fns = draw(
        st.lists(
            st.sampled_from(["rn", "lag_diff", "run_sum", "cnt_frame"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    preceding = draw(st.integers(min_value=0, max_value=25))
    lag_off = draw(st.integers(min_value=1, max_value=5))
    return {"part": part, "k": k, "fns": fns, "preceding": preceding,
            "lag": lag_off}


@settings(max_examples=15, deadline=None)
@given(spec=window_specs())
def test_differential_window_spec(spark, spec):
    """Random window-function specs (partition key, ROWS frame, lag
    offset) rendered as both a Spark plan and DuckDB SQL — frame-bound
    and tie-break semantics must agree exactly. Order is pinned to the
    unique (ts, event_id) so both engines rank identically; values are
    cent-quantized so running sums are integer-exact."""
    from pyspark.sql import Window

    p = spec["preceding"]
    part_sql = (
        "event_type" if spec["part"] == "event_type" else f"user_id % {spec['k']}"
    )
    frame_sql = f"ROWS BETWEEN {p} PRECEDING AND CURRENT ROW"
    over = f"OVER (PARTITION BY {part_sql} ORDER BY ts, event_id {frame_sql})"
    over_nofr = f"OVER (PARTITION BY {part_sql} ORDER BY ts, event_id)"
    cents_sql = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    fn_sql = {
        "rn": f"row_number() {over_nofr} AS rn",
        "lag_diff": f"{cents_sql} - lag({cents_sql}, {spec['lag']}) "
        f"{over_nofr} AS lag_diff",
        "run_sum": f"CAST(SUM({cents_sql}) {over} AS BIGINT) AS run_sum",
        "cnt_frame": f"CAST(COUNT(*) {over} AS BIGINT) AS cnt_frame",
    }
    sql = (
        "SELECT event_id, "
        + ", ".join(fn_sql[f] for f in spec["fns"])
        + " FROM events"
    )

    pcol = (
        F.col("event_type")
        if spec["part"] == "event_type"
        else F.col("user_id") % spec["k"]
    )
    w = Window.partitionBy(pcol).orderBy("ts", "event_id")
    wf = w.rowsBetween(-p, Window.currentRow)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    fn_spark = {
        "rn": F.row_number().over(w).alias("rn"),
        "lag_diff": (cents - F.lag(cents, spec["lag"]).over(w)).alias("lag_diff"),
        "run_sum": F.sum(cents).over(wf).cast("bigint").alias("run_sum"),
        "cnt_frame": F.count(F.lit(1)).over(wf).cast("bigint").alias("cnt_frame"),
    }
    df = load_table(spark, SF_DIR, "events").select(
        "event_id", *[fn_spark[f] for f in spec["fns"]]
    )
    got = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS_PARQUET}')"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, f"spec={spec}\nsql={sql}"
