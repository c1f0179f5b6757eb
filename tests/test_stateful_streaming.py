"""Stateful streaming: watermarked tumbling-window aggregation (built-in
state store) and applyInPandasWithState gap sessionization, both checked
against their batch equivalents on the same data — the batch plan is the
oracle for the streaming operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.streaming.stateful import (
    drain_to_memory,
    drain_to_parquet,
    read_event_stream,
    sessionize_with_state,
    windowed_event_counts,
)

GAP_MIN = 30


def _mk_events(spark, rows):
    """rows: (event_id, user_id, minute_offset, event_type, value)"""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (eid, uid, base + dt.timedelta(minutes=m), etype, float(v))
        for (eid, uid, m, etype, v) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


@pytest.fixture()
def session_log(spark, tmp_path):
    """Two micro-batch files; user 1 has two gap-split sessions inside
    file A plus a continuation in file B; user 2 is a single session."""
    src = str(tmp_path / "log")
    # file A: user1 session1 (0,10min), session2 starts at 60min;
    #         user2 session (5,15min)
    a = _mk_events(
        spark,
        [
            (1, 1, 0, "view", 1.0),
            (2, 1, 10, "click", 2.0),
            (3, 1, 60, "view", 3.0),
            (4, 2, 5, "view", 4.0),
            (5, 2, 15, "purchase", 5.0),
        ],
    )
    # file B: user1 continues session2 at 70min, then far-future events
    # push the watermark beyond every open session's timeout
    b = _mk_events(
        spark,
        [
            (6, 1, 70, "purchase", 6.0),
            (7, 3, 600, "view", 0.5),
            (8, 3, 1200, "view", 0.5),
        ],
    )
    a.coalesce(1).write.parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    return src


def _batch_sessions(spark, source_dir):
    """Batch lag/cumsum sessionization — the oracle."""
    ev = spark.read.parquet(source_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    new_s = F.when(gap.isNull() | (gap > GAP_MIN * 60), 1).otherwise(0)
    sess = ev.withColumn("s", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "s")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("s")
    )


def test_stateful_sessionization_matches_batch_oracle(spark, session_log, tmp_path):
    stream = read_event_stream(spark, session_log)
    sessions = sessionize_with_state(stream, gap=f"{GAP_MIN} minutes")
    got = drain_to_memory(
        spark, sessions, "sessions_t1", str(tmp_path / "ckpt")
    ).collect()
    # Every session whose timeout the final watermark passed must be out.
    # The far-future events (user 3 at +600/+1200min) push the watermark
    # past every user-1/user-2 session end + gap.
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in _batch_sessions(spark, session_log).collect()
        if r["user_id"] in (1, 2)
    }
    got_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in got
        if r["user_id"] in (1, 2)
    }
    assert got_keys == want
    # user 1 must have exactly two sessions and the second one spans the
    # micro-batch boundary (events 3, 6: 60min..70min)
    u1 = sorted((r for r in got if r["user_id"] == 1), key=lambda r: r["session_start"])
    assert len(u1) == 2
    assert u1[1]["n_events"] == 2 and u1[1]["sum_value"] == 9.0


def test_stateful_sessionization_resumes_from_checkpoint(
    spark, session_log, tmp_path
):
    """The state store survives a stop/restart: draining twice with the
    same checkpoint emits each session at most once, and a new late file
    closes the remaining open sessions."""
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sessions")
    stream = read_event_stream(spark, session_log)
    sessions = sessionize_with_state(stream, gap=f"{GAP_MIN} minutes")
    drain_to_parquet(sessions, sink, ckpt)
    first = spark.read.parquet(sink).collect()
    assert len(first) >= 3  # u1 two sessions + u2 one

    # a third file far in the future times out user 3's open sessions
    extra = _mk_events(spark, [(9, 4, 5000, "view", 1.0)])
    extra.coalesce(1).write.mode("append").parquet(session_log)
    drain_to_parquet(
        sessionize_with_state(
            read_event_stream(spark, session_log), gap=f"{GAP_MIN} minutes"
        ),
        sink,
        ckpt,
    )
    combined = spark.read.parquet(sink).collect()
    # the second drain only processes the new file: no re-emission of the
    # first run's sessions, but user 3's two sessions now close
    u3 = [r for r in combined if r["user_id"] == 3]
    assert len(u3) == 2
    emitted = [(r["user_id"], r["session_start"]) for r in combined]
    assert len(emitted) == len(set(emitted))  # exactly-once per session


def test_windowed_counts_match_batch_groupby(spark, session_log, tmp_path):
    stream = read_event_stream(spark, session_log)
    counts = windowed_event_counts(stream, window="1 hour", watermark="0 seconds")
    got = drain_to_memory(spark, counts, "win_t1", str(tmp_path / "ckpt"))

    ev = spark.read.parquet(session_log)
    final_wm = ev.agg(F.max("ts")).collect()[0][0]
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        # append mode only emits windows the final watermark closed
        .filter(F.col("window_end") <= F.lit(final_wm))
    )
    got_set = {tuple(r) for r in got.collect()}
    want_set = {tuple(r) for r in want.collect()}
    assert got_set == want_set
    assert len(got_set) > 0


def test_dedup_stream_drops_cross_batch_replays(spark, tmp_path):
    """A duplicate of batch A's row replayed in batch B (the at-least-once
    case) is dropped by keyed state; distinct keys all pass."""
    from dvh_airflow_kafka_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "log")
    a = _mk_events(spark, [(1, 1, 0, "view", 1.0), (2, 1, 5, "click", 2.0)])
    # batch B replays event 2 and adds event 3 within the watermark window
    b = _mk_events(spark, [(2, 1, 5, "click", 2.0), (3, 2, 10, "view", 3.0)])
    a.coalesce(1).write.parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    deduped = dedup_stream(
        read_event_stream(spark, src), keys=["event_id"], watermark="2 hours"
    )
    got = drain_to_memory(spark, deduped, "dedup_t1", str(tmp_path / "ckpt"))
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [1, 2, 3]  # replayed id=2 emitted exactly once


def test_anomaly_detector_matches_batch_window(spark, sf_dir, tmp_path):
    """Multi-batch streaming anomaly detection == the batch window query,
    and the per-user value ring demonstrably carries across batches."""
    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.streaming.stateful import (
        detect_anomalies_with_state,
        drain_to_memory,
        read_event_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    src = str(tmp_path / "src")
    # three ts-ordered slices -> three micro-batches
    n = ev.count()
    lo, hi = n // 3, 2 * n // 3
    for pred in (
        F.col("event_id") < lo,
        (F.col("event_id") >= lo) & (F.col("event_id") < hi),
        F.col("event_id") >= hi,
    ):
        ev.filter(pred).coalesce(1).write.mode("append").parquet(src)

    out = drain_to_memory(
        spark,
        detect_anomalies_with_state(read_event_stream(spark, src)),
        "anom_test",
        str(tmp_path / "ckpt"),
    )
    got = {r.event_id: r.n_prior for r in out.collect()}

    # batch reference: integer-exact rolling window
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = ev.select(
        "event_id",
        c.alias("c"),
        F.count("value").over(w).alias("n"),
        F.sum(c).over(w).alias("s"),
        F.sum(c * c).over(w).alias("ss"),
    )
    dev = F.col("n") * F.col("c") - F.col("s")
    want = {
        r.event_id: r.n
        for r in stats.filter(
            (F.col("n") >= 8)
            & (dev * dev * (F.col("n") - 1) > 9 * F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")))
        ).collect()
    }
    assert got == want
    # cross-batch carry: some anomaly must be flagged in batches 2/3 with
    # n_prior proving state from an earlier batch (full 20-ring only
    # forms after 20 events, and slices hold ~1/3 of each user's events)
    assert any(eid >= lo for eid in got)


def test_interval_join_matches_across_batches(spark, tmp_path):
    """A purchase in batch 2 must join an error from batch 1 — the match
    can only come from the stream-stream join state store."""
    import datetime as pdt

    from dvh_airflow_kafka_spark.streaming.stateful import (
        drain_to_memory,
        interval_join_streams,
        read_event_stream,
    )

    t0 = pdt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )

    src = str(tmp_path / "src")
    # batch 1: the error (user 7) + noise
    mk(
        [
            (1, 7, "error", t0),
            (2, 8, "purchase", t0 + pdt.timedelta(minutes=1)),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: the purchase 10 min later (in-window) and one 40 min
    # later (out-of-window)
    mk(
        [
            (3, 7, "purchase", t0 + pdt.timedelta(minutes=10)),
            (4, 7, "purchase", t0 + pdt.timedelta(minutes=40)),
        ]
    ).coalesce(1).write.mode("append").parquet(src)

    purchases = read_event_stream(spark, src).filter(
        F.col("event_type") == "purchase"
    )
    errors = read_event_stream(spark, src).filter(F.col("event_type") == "error")
    joined = interval_join_streams(
        purchases, errors, key="user_id", max_lag="30 minutes"
    ).select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("error_id"),
    )
    out = drain_to_memory(
        spark, joined, "ij_test", str(tmp_path / "ckpt")
    ).collect()
    pairs = {(r.purchase_id, r.error_id) for r in out}
    assert pairs == {(3, 1)}  # in-window cross-batch match only


def test_watermark_drops_late_rows_observably(spark, tmp_path):
    """Late-data accounting: rows older than the watermark are dropped by
    the stateful window aggregation and the drop is OBSERVABLE in the
    query progress (numRowsDroppedByWatermark) — silent data loss is the
    failure mode; this pins the metric that makes it visible."""
    import datetime as pdt
    import json

    t0 = pdt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )

    src = str(tmp_path / "src")
    # batch 1: on-time events advancing the watermark far ahead
    mk(
        [(i, t0 + pdt.timedelta(hours=i), "a") for i in range(6)]
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: an on-time spacer — the watermark computed from batch 1
    # only becomes the FILTER for batches after the next commit
    mk([(99, t0 + pdt.timedelta(hours=6), "a")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # batch 3: a row 6 hours older than the max seen -> behind the
    # 1-minute watermark -> must be dropped
    mk([(100, t0, "late")]).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_drop_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = 0
    for p in q.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else p
        for op in prog.get("stateOperators", []):
            dropped += int(op.get("numRowsDroppedByWatermark", 0))
    assert dropped >= 1
    # and the late row's window never appears in the emitted result
    out = spark.table("wm_drop_test")
    assert out.filter(F.col("event_type") == "late").count() == 0


def test_transform_with_state_running_totals(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas running totals: the last
    emission per user over an availableNow drain must equal the batch
    groupBy totals exactly. GATED on protobuf (the transformWithState
    Python worker's wire format), absent from this sandbox."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.streaming.stateful import (
        read_event_stream,
        running_totals_with_state,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events")
    ev.limit(300).repartition(3).write.mode("overwrite").parquet(src)
    out = running_totals_with_state(read_event_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = {}
    for r in spark.table("tws_totals").collect():
        last[r.user_id] = (r.n_events, r.sum_cents)
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c")
    batch = {
        r.user_id: (r.n, r.cents)
        for r in spark.read.parquet(src)
        .select("user_id", c)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("cents"))
        .collect()
    }
    assert last == batch and batch
