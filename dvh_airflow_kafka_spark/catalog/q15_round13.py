"""Round-13 composition: the OPTIMIZE-style auto-compaction policy loop
(VERDICT r12 item 8) — the PLANNING side the catalog already certifies
(``small_file_compaction_plan``, the bin-packing window of Delta/Iceberg
``OPTIMIZE``) unified with the EXECUTION side the ingest pipeline
already carries (``streaming/ingest.compact_sink``) into one certified
maintenance chain: drain -> inventory the sink layout off the
pipeline's own artifacts -> bin-pack a compaction plan -> a threshold
policy decides -> ``compact_sink`` executes -> the post-layout audit
and content-preservation totals close the loop.

Reference anchor: the reference has no storage maintenance at all — its
sink is an Oracle table and the database compacts for it
(src/oracle_target.py:40-76).  The Spark twin owns its parquet layout,
so the weekly OPTIMIZE pass is part of the equivalent operating duty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.catalog._core import (
    _staged_stream_src,
    register,
)
from dvh_airflow_kafka_spark.io import load_table

# fixed slice count for the staged micro-batch layout (one file -> one
# batch -> one sink dir; 4 batches keeps the fixture drain ~capstone-
# priced while still reaching the policy threshold), the dir-count
# threshold above which the
# policy fires, and the divisor sizing each compaction bin at ~1/3 of
# the corpus — all part of the closed-form spec the oracle replays
_N_SLICES = 4
_MIN_DIRS = 4
_BIN_DIV = 3


@register(
    "auto_compaction_policy",
    sql=f"""
    WITH p AS (
        SELECT CAST((MAX(event_id) + {_N_SLICES}) // {_N_SLICES} AS BIGINT)
                   AS w,
               CAST((COUNT(*) + {_BIN_DIV - 1}) // {_BIN_DIV} AS BIGINT)
                   AS target
        FROM events
    ), inv AS (
        SELECT CAST(MIN(e.event_id) AS BIGINT) AS first_off,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events e CROSS JOIN p
        GROUP BY e.event_id // p.w
    ), binned AS (
        SELECT first_off, n_rows,
               COALESCE(SUM(n_rows) OVER (ORDER BY first_off
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS prefix_rows
        FROM inv
    ), plan AS (
        SELECT CAST(b.prefix_rows // p.target AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(b.n_rows) AS BIGINT) AS bin_rows,
               MIN(b.first_off) AS lo, MAX(b.first_off) AS hi
        FROM binned b CROSS JOIN p
        GROUP BY 1
    )
    SELECT 'inventory' AS section, 'n_dirs' AS dim,
           CAST(COUNT(*) AS BIGINT) AS n FROM inv
    UNION ALL
    SELECT 'inventory', 'slice|' || CAST(first_off AS VARCHAR), n_rows
    FROM inv
    UNION ALL
    SELECT 'plan', 'bin' || CAST(bin AS VARCHAR) || '|files', n_files
    FROM plan
    UNION ALL
    SELECT 'plan', 'bin' || CAST(bin AS VARCHAR) || '|rows', bin_rows
    FROM plan
    UNION ALL
    SELECT 'plan', 'bin' || CAST(bin AS VARCHAR) || '|lo', lo FROM plan
    UNION ALL
    SELECT 'plan', 'bin' || CAST(bin AS VARCHAR) || '|hi', hi FROM plan
    UNION ALL
    SELECT 'policy', 'fired',
           CAST(CASE WHEN COUNT(*) >= {_MIN_DIRS} THEN 1 ELSE 0 END
                AS BIGINT)
    FROM inv
    UNION ALL
    SELECT 'layout_after', r.root, CAST(1 AS BIGINT)
    FROM (VALUES ('sink'),('bits'),('hll'),('dd'),('mg')) AS r(root)
    UNION ALL
    SELECT 'layout_after', 'tag_id', CAST(COUNT(*) - 1 AS BIGINT) FROM inv
    UNION ALL
    SELECT 'content', 'total_rows', CAST(COUNT(*) AS BIGINT) FROM events
    UNION ALL
    SELECT 'content', 'users|' || event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events GROUP BY event_type
    """,
)
def auto_compaction_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] THE OPTIMIZE LOOP AS ONE CERTIFIED CHAIN (VERDICT r12 item
    8): a rate-limited drain (``maxFilesPerTrigger=1`` over 4 staged
    equal-width event-id slices) fragments the ingest sink into 4
    per-batch dirs — the small-file problem every streaming sink
    accretes — then the maintenance pass runs OFF THE PIPELINE'S OWN
    ARTIFACTS:

    1. **Inventory**: one metadata-scale aggregate over the sink dirs
       (``input_file_name`` parent tag -> per-dir row count + first
       offset) — the file-listing a real OPTIMIZE starts from, here
       derived from the data so the oracle can replay it exactly.
    2. **Plan**: ``ext/layout.plan_compaction_bins`` — the SAME
       bin-packing kernel ``small_file_compaction_plan`` certifies —
       packs the dirs into ~``total/3``-row bins in first-offset order
       (exclusive-prefix-sum binning, exactly SQL-mirrorable).
    3. **Policy**: compact when the dir count reaches ``_MIN_DIRS`` —
       the auto-OPTIMIZE trigger a table service runs on a schedule.
    4. **Execution**: ``streaming/ingest.compact_sink`` folds all five
       per-batch roots (sink + Bloom bits + HLL/ddsketch/MG monitor
       partials) to ONE consolidated dir each under its crash-rollback
       marker protocol (rollback law pytest-pinned in round 12).
    5. **Audit**: post-compaction layout (one dir per root, tag =
       highest folded batch) and content preservation (total rows,
       exact distinct users per type off the compacted sink).

    The drain runs the scrub/filter spine with an EMPTY kode-6 lookup
    and no allow-filters — the privacy path is certified by the five
    round-12 ingest queries; this chain certifies the STORAGE
    MAINTENANCE duty those queries only exercise mechanically.

    Scale: the inventory and plan are metadata-sized (one row per
    file/dir — a million rows at 100 TB), the policy is a count
    threshold, and ``compact_sink``'s rewrite is the one full-data pass
    a real OPTIMIZE also pays, amortized by running only when the
    policy fires.  Nothing here is driver-side except the bounded
    (|dirs|-row) inventory collect that parameterizes the plan."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from dvh_airflow_kafka_spark.catalog.q13_round11 import _ingest_lookup
    from dvh_airflow_kafka_spark.ext.layout import plan_compaction_bins
    from dvh_airflow_kafka_spark.streaming.ingest import (
        _batch_dirs,
        compact_sink,
        run_ingest_pipeline,
    )
    from dvh_airflow_kafka_spark.streaming.stateful import read_event_stream

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )

    def _write(src: str) -> None:
        # _N_SLICES equal-width event-id slices, one FILE each (one file -> one
        # micro-batch -> one sink dir): fixed integer boundaries so the
        # oracle replays the slice assignment with `event_id // w`
        os.makedirs(src, exist_ok=True)
        base = events.localCheckpoint()
        max_id = int(base.agg(F.max("event_id")).collect()[0][0])
        w = (max_id + _N_SLICES) // _N_SLICES  # ceil((max_id+1)/n)
        for s in range(_N_SLICES):
            tmp = tempfile.mkdtemp(prefix="ac_slice_")
            (
                base.filter(
                    (F.col("event_id") >= s * w)
                    & (F.col("event_id") < (s + 1) * w)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(src, f"slice-{s:02d}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)

    src = _staged_stream_src("auto_compact", sf_dir, _write)
    work = tempfile.mkdtemp(prefix="auto_compact_")
    ckpt = tempfile.mkdtemp(prefix="auto_compact_ckpt_")
    try:
        dirs = run_ingest_pipeline(
            spark,
            read_event_stream(spark, src, max_files_per_trigger=1),
            work_dir=work,
            checkpoint_dir=ckpt,
            initial_sink=events.filter(F.lit(False)),
            lookup=_ingest_lookup(spark, sf_dir).filter(F.lit(False)),
            message_filters=[],
        )
        fs = dirs.fs(spark)
        bdirs = _batch_dirs(fs, dirs.sink)
        inv = (
            spark.read.parquet(*bdirs)
            .select(
                F.element_at(
                    F.split(F.input_file_name(), "/"), -2
                ).alias("__tag"),
                "kafka_offset",
            )
            .groupBy("__tag")
            .agg(
                F.min("kafka_offset").cast("bigint").alias("first_off"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
            .select("first_off", "n_rows")
            .localCheckpoint()
        )
        total = int(
            inv.agg(F.sum("n_rows").alias("t")).collect()[0]["t"]
        )
        target = (total + _BIN_DIV - 1) // _BIN_DIV
        plan = plan_compaction_bins(
            inv.withColumn("g", F.lit("sink")),
            "g",
            "first_off",
            "n_rows",
            target,
        )
        fired = len(bdirs) >= _MIN_DIRS
        if fired:
            compact_sink(spark, dirs)

        s_ninv = inv.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit("inventory").alias("section"),
            F.lit("n_dirs").alias("dim"),
            "n",
        )
        s_inv = inv.select(
            F.lit("inventory").alias("section"),
            F.concat(
                F.lit("slice|"), F.col("first_off").cast("string")
            ).alias("dim"),
            F.col("n_rows").alias("n"),
        )
        bindim = F.concat(F.lit("bin"), F.col("bin").cast("string"))
        p = plan.localCheckpoint()
        s_pf = p.select(
            F.lit("plan").alias("section"),
            F.concat(bindim, F.lit("|files")).alias("dim"),
            F.col("n_files").cast("long").alias("n"),
        )
        s_pr = p.select(
            F.lit("plan").alias("section"),
            F.concat(bindim, F.lit("|rows")).alias("dim"),
            F.col("total_bytes").cast("long").alias("n"),
        )
        s_plo = p.select(
            F.lit("plan").alias("section"),
            F.concat(bindim, F.lit("|lo")).alias("dim"),
            F.col("first_file").cast("long").alias("n"),
        )
        s_phi = p.select(
            F.lit("plan").alias("section"),
            F.concat(bindim, F.lit("|hi")).alias("dim"),
            F.col("last_file").cast("long").alias("n"),
        )
        init = spark.read.parquet(dirs.initial)
        roots_after = {
            "sink": dirs.sink,
            "bits": dirs.bits,
            "hll": dirs.hll,
            "dd": dirs.dd,
            "mg": dirs.mg,
        }
        after_rows = [
            ("layout_after", name, len(_batch_dirs(fs, root)))
            for name, root in roots_after.items()
        ]
        sink_tags = [
            int(d.rstrip("/").rsplit("/", 1)[-1][1:])
            for d in _batch_dirs(fs, dirs.sink)
        ]
        after_rows.append(("layout_after", "tag_id", sink_tags[-1]))
        after_rows.append(("policy", "fired", int(fired)))
        s_after = spark.createDataFrame(
            after_rows, "section string, dim string, n long"
        )
        adm = dirs.admitted(spark, init).localCheckpoint()
        s_tot = adm.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit("content").alias("section"),
            F.lit("total_rows").alias("dim"),
            "n",
        )
        s_users = adm.groupBy("event_type").agg(
            F.count_distinct("user_id").cast("long").alias("n")
        ).select(
            F.lit("content").alias("section"),
            F.concat(F.lit("users|"), F.col("event_type")).alias("dim"),
            "n",
        )
        report = (
            s_ninv.unionByName(s_inv)
            .unionByName(s_pf)
            .unionByName(s_pr)
            .unionByName(s_plo)
            .unionByName(s_phi)
            .unionByName(s_after)
            .unionByName(s_tot)
            .unionByName(s_users)
        )
        rows = report.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        rows, "section string, dim string, n long"
    )
