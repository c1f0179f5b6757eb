"""Catalog family module (mechanical split of catalog.py, round 10).

See ``catalog/__init__.py`` for the module map.  Registration order is
preserved by import order; do not reorder modules or @register blocks.
"""
from __future__ import annotations

from dvh_airflow_kafka_spark.config import AllowRule
from dvh_airflow_kafka_spark.functions import registry as fns
from dvh_airflow_kafka_spark.io import ensure_parallelism, load_table
from dvh_airflow_kafka_spark.operators import dedup_against_existing, full_summary_frame, scrub_flagged_persons
from dvh_airflow_kafka_spark.plans import Transform
from dvh_airflow_kafka_spark.sources import events_as_kafka_frame, with_envelope
from pyspark.sql import DataFrame, SparkSession, functions as F
from dvh_airflow_kafka_spark.catalog._core import (
    BATCH_TIME,
    _ntz,
    _oslo,
    register,
)

# ==========================================================================
# Reference surface — SURVEY.md §2
# ==========================================================================

_FLAGSHIP_RULES = [
    {"src": "kafka_key", "dst": "kafka_key"},
    {"src": "kafka_offset", "dst": "kafka_offset"},
    {"src": "kafka_partition", "dst": "kafka_partition"},
    {"src": "kafka_timestamp", "dst": "kafka_timestamp", "fun": "int-unix-ms -> datetime-no"},
    {"src": "kafka_topic", "dst": "kafka_topic"},
    {"src": "kafka_hash", "dst": "kafka_hash"},
    {"src": "kafka_message", "dst": "kafka_message"},
    {"src": "$TESTDATA", "dst": "kildesystem"},
    {"src": "$$BATCH_TIME", "dst": "lastet_tid"},
]

_FLAGSHIP_FILTERS = [
    AllowRule(key="k", allowed_value=87),
    AllowRule(key="k", allowed_value=12),
]


_FLAGSHIP_SQL = f"""
    SELECT CAST(user_id AS VARCHAR) AS kafka_key,
           event_id AS kafka_offset,
           CAST(user_id % 2 AS INT) AS kafka_partition,
           {_oslo("make_timestamp(epoch_ms(ts) * 1000)")} AS kafka_timestamp,
           'events' AS kafka_topic,
           sha256(props) AS kafka_hash,
           CASE WHEN json_extract_string(props, '$.k') IN ('87', '12')
                THEN props ELSE NULL END AS kafka_message,
           'TESTDATA' AS kildesystem,
           TIMESTAMP '2025-06-01 12:00:00' AS lastet_tid
    FROM events
    """


@register("flagship_etl_pipeline", sql=_FLAGSHIP_SQL)
def flagship_etl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole spine in one plan: Kafka-shaped scan →
    envelope (S3/S6/F9/F10) → allow-filter (P3) → transform DSL (P5 +
    F5). One narrow projection fused into one codegen stage, fed by an
    input-balance repartition: the spine's per-row work (sha256 +
    canonical-JSON re-serialisation) is CPU-bound, and a single-row-group
    parquet input scans as ONE task (guide §2.5 input skew — "one huge
    unsplittable file: repartition immediately after the read").
    ``ensure_parallelism`` is a no-op whenever the source layout already
    parallelises the scan, so at production multi-file scale no shuffle
    is added.  Row-level output → order-insensitive, oracle-identical."""
    events = ensure_parallelism(load_table(spark, sf_dir, "events"))
    env = with_envelope(
        events_as_kafka_frame(events), message_filters=_FLAGSHIP_FILTERS
    )
    out = Transform(_FLAGSHIP_RULES, batch_time=BATCH_TIME).apply(env)
    return out.withColumn("kafka_timestamp", _ntz(F.col("kafka_timestamp"))).withColumn(
        "lastet_tid", _ntz(F.col("lastet_tid"))
    )


@register(
    "envelope_projection",
    sql="""
    SELECT CAST(user_id AS VARCHAR) AS kafka_key,
           epoch_ms(ts) AS kafka_timestamp,
           event_id AS kafka_offset,
           CAST(user_id % 2 AS INT) AS kafka_partition,
           'events' AS kafka_topic,
           sha256(props) AS kafka_hash,
           props AS kafka_message
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    """,
)
def envelope_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 timestamp-interval scan + S3/S6 envelope: the bounded
    ``[DATA_INTERVAL_START, DATA_INTERVAL_END)`` read (reference
    src/kafka_source.py:68-72, 220-265) as a pushed-down timestamp filter."""
    events = load_table(spark, sf_dir, "events")
    bounded = events.filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp_ntz"))
    )
    return with_envelope(events_as_kafka_frame(bounded))


@register(
    "string_schema_envelope",
    sql="""
    SELECT event_id AS kafka_offset,
           sha256(props) AS kafka_hash,
           to_json(props) AS kafka_message
    FROM events
    """,
)
def string_schema_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 ``schema: string`` (reference src/kafka_source.py:121-127):
    the payload is stored JSON-quoted (``json.dumps(text)``) while the
    hash stays over the raw bytes. ``json_quote`` escapes JVM-side via
    ``to_json``; DuckDB's ``to_json(VARCHAR)`` emits byte-identical
    escaping (verified incl. quotes/backslash/newline/non-ASCII)."""
    from dvh_airflow_kafka_spark.sources.envelope import json_quote

    events = load_table(spark, sf_dir, "events")
    env = with_envelope(
        events_as_kafka_frame(events),
        canonical_message=json_quote(F.col("value").cast("string")),
    )
    return env.select("kafka_offset", "kafka_hash", "kafka_message")


@register(
    "payload_flag_fields",
    sql="""
    SELECT event_id,
           to_json(struct_pack(
               event_type := event_type,
               k := CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                         THEN 1 ELSE 0 END)) AS kafka_message
    FROM events
    """,
)
def payload_flag_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 presence-flag on a typed payload (reference
    src/kafka_source.py:94-100): listed keypaths become 1/0."""
    from dvh_airflow_kafka_spark.operators import flag_fields
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("k", T.IntegerType()),
        ]
    )
    payload = F.struct(
        F.col("event_type"),
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
    )
    flagged = flag_fields(payload, schema, ["k"])
    return events.select(
        "event_id", F.to_json(flagged).alias("kafka_message")
    )


@register(
    "payload_drop_fields",
    sql="""
    SELECT event_id,
           to_json(struct_pack(event_type := event_type)) AS kafka_message
    FROM events
    """,
)
def payload_drop_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 field-drop on a typed payload (reference
    src/kafka_source.py:84-92): listed keypaths removed, rest preserved."""
    from dvh_airflow_kafka_spark.operators import drop_fields
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("k", T.IntegerType()),
        ]
    )
    payload = F.struct(
        F.col("event_type"),
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
    )
    dropped = drop_fields(payload, schema, ["k"])
    return events.select("event_id", F.to_json(dropped).alias("kafka_message"))


@register(
    "message_allow_filter",
    sql="""
    SELECT event_id,
           CASE WHEN event_type IN ('purchase', 'click')
                THEN to_json(struct_pack(
                    event_type := event_type,
                    k := CAST(json_extract_string(props, '$.k') AS INT)))
                ELSE NULL END AS kafka_message
    FROM events
    """,
)
def message_allow_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 message-filters (reference src/kafka_source.py:207-218): OR-list
    of top-level equality predicates; non-matching rows keep their
    envelope but the payload is NULLed — a CASE projection, not a filter.
    Input-balanced like the flagship: the JSON re-serialisation is
    CPU-bound row-level work on a one-task scan at fixture layout."""
    from dvh_airflow_kafka_spark.sources.envelope import allow_filter_condition

    events = ensure_parallelism(load_table(spark, sf_dir, "events"))
    payload = F.to_json(
        F.struct(
            F.col("event_type"),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
        )
    )
    rules = [
        AllowRule(key="event_type", allowed_value="purchase"),
        AllowRule(key="event_type", allowed_value="click"),
    ]
    keep = allow_filter_condition(payload, rules)
    return events.select(
        "event_id", F.when(keep, payload).otherwise(F.lit(None)).alias("kafka_message")
    )


@register(
    "privacy_scrub_k6",
    sql="""
    SELECT e.event_id,
           e.user_id,
           CASE WHEN l.off_id IS NOT NULL THEN NULL ELSE e.props END AS kafka_message
    FROM events e
    LEFT JOIN (
        SELECT c_custkey AS off_id,
               DATE '1900-01-01' AS f,
               CASE WHEN c_custkey <= 75 THEN DATE '2024-06-30'
                    ELSE DATE '9999-12-31' END AS t
        FROM customer WHERE c_custkey % 10 = 0
    ) l ON e.user_id = l.off_id AND CAST(e.ts AS DATE) BETWEEN l.f AND l.t
    """,
)
def privacy_scrub_k6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/J2 kode-6/7 scrub (reference src/oracle_target.py:46-93): flagged
    person-ids with a valid interval at the event date get a NULL payload.
    Lookup synthesized from ``customer`` (FIXTURES.md F-5 mapping)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    lookup = customer.filter((F.col("c_custkey") % 10) == 0).select(
        F.col("c_custkey").alias("off_id"),
        F.lit("1900-01-01").cast("date").alias("gyldig_fra_dato"),
        F.when(F.col("c_custkey") <= 75, F.lit("2024-06-30"))
        .otherwise(F.lit("9999-12-31"))
        .cast("date")
        .alias("gyldig_til_dato"),
        F.when(F.col("c_custkey") <= 50, F.lit(6)).otherwise(F.lit(7)).alias(
            "skjermet_kode"
        ),
    )
    scrubbed = scrub_flagged_persons(
        events.withColumn("kafka_message", F.col("props")),
        lookup,
        person_id=F.col("user_id"),
        event_ts=F.col("ts"),
    )
    return scrubbed.select("event_id", "user_id", "kafka_message")


@register(
    "dedup_insert_antijoin",
    sql="""
    WITH incoming AS (
        SELECT * FROM events WHERE event_id < 600
        UNION ALL
        SELECT * FROM events WHERE event_id < 100
    ),
    existing AS (SELECT event_id FROM events WHERE event_id < 300)
    SELECT DISTINCT i.event_id, i.user_id, i.event_type, i.props
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM existing x WHERE x.event_id = i.event_id)
    """,
)
def dedup_insert_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 skip-duplicates-with (reference src/oracle_target.py:97-104):
    incoming batch (with in-batch duplicates) anti-joined against the
    sink's key set; re-runs write nothing new (laws 4/5)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "props"
    )
    incoming = events.filter(F.col("event_id") < 600).unionAll(
        events.filter(F.col("event_id") < 100)
    )
    existing = events.filter(F.col("event_id") < 300)
    return dedup_against_existing(incoming, existing, ["event_id"])


@register(
    "delta_watermark",
    sql="""
    SELECT max(ts) AS watermark_ts,
           epoch_ms(max(ts)) AS watermark_ms,
           count(*) AS n_rows
    FROM events
    """,
)
def delta_watermark_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/A1 delta probe (reference src/oracle_target.py:30-43):
    MAX(delta_column) of the sink → epoch-ms incremental lower bound."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.max("ts").alias("watermark_ts"),
        F.unix_millis(F.max("ts").cast("timestamp")).alias("watermark_ms"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "process_summary",
    sql="""
    SELECT count(*) AS event_count,
           count(*) AS data_count,
           CAST(0 AS BIGINT) AS error_count,
           count(*) AS written_to_db_count,
           CAST(-1 AS BIGINT) AS committed_to_producer_count,
           CAST(0 AS BIGINT) AS empty_count,
           count(*) AS non_empty_count,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k') IN ('87', '12')
                         THEN 0 ELSE 1 END) AS BIGINT) AS filtered_count
    FROM events
    """,
)
def process_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 ProcessSummary — the reference's FULL counter contract
    (src/kafka_source.py:24-45, xcom src/main.py:40-53): in a bounded
    assign-mode run every scanned message is a proper data message, the
    allow-filter NULLs payloads without dropping rows (filtered_count is
    the engine-extension count of those), and committed stays -1."""
    events = load_table(spark, sf_dir, "events")
    env = with_envelope(
        events_as_kafka_frame(events), message_filters=_FLAGSHIP_FILTERS
    )
    return full_summary_frame(env)


_PIPELINE_YAML = """
source:
  type: parquet
  topic: events
  schema: json
  key-decoder: utf-8
  batch-size: 5000
  message-filters:
    - key: k
      allowed_value: 87
    - key: k
      allowed_value: 12
  path: "{path}"
target:
  type: memory
  table: pipeline_out
transform:
  - src: kafka_key
    dst: kafka_key
  - src: kafka_offset
    dst: kafka_offset
  - src: kafka_partition
    dst: kafka_partition
  - src: kafka_timestamp
    dst: kafka_timestamp
    fun: "int-unix-ms -> datetime-no"
  - src: kafka_topic
    dst: kafka_topic
  - src: kafka_hash
    dst: kafka_hash
  - src: kafka_message
    dst: kafka_message
  - src: $TESTDATA
    dst: kildesystem
  - src: $$BATCH_TIME
    dst: lastet_tid
"""


@register("pipeline_from_yaml_config", sql=_FLAGSHIP_SQL)
def pipeline_from_yaml_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ONLY entry point, end-to-end: a YAML
    ``CONSUMER_CONFIG`` string (reference src/main.py:33-38) drives
    ``run_pipeline`` (reference ``Mapping.run()``, src/mapping.py:49-57)
    through source → envelope → allow-filter → transform → sink. Must
    hash-match the hand-built flagship plan exactly."""
    import os

    from dvh_airflow_kafka_spark.runner import run_pipeline

    yaml_text = _PIPELINE_YAML.format(
        path=os.path.join(sf_dir, "events.parquet")
    )
    result = run_pipeline(spark, yaml_text, batch_time=BATCH_TIME)
    out = result.dataframe
    return out.withColumn("kafka_timestamp", _ntz(F.col("kafka_timestamp"))).withColumn(
        "lastet_tid", _ntz(F.col("lastet_tid"))
    )


# --------------------------------------------------------------------------
# Scalar functions F2-F7
# --------------------------------------------------------------------------

_STR_CODE_SQL = """
    WITH y AS (
        SELECT doc_id,
               regexp_replace(
                   replace(translate(
                       regexp_replace(
                           regexp_replace(upper(substr(text, 1, 40)),
                                          '^\\s+|\\s+$', '', 'g'),
                           '\\s+', '_', 'g'),
                       'ÆØ', 'AO'), 'Å', 'AA'),
                   '[^0-9A-Z_]', '', 'g') AS code0
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN code0 IS NULL OR code0 = '' THEN 'UKJENT' ELSE code0 END AS code
    FROM y
"""


@register("fn_str_code", sql=_STR_CODE_SQL)
def fn_str_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 ``str -> str-code`` (reference src/transform.py:33-46) applied to
    document prefixes."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fns.str_to_code(F.substring(F.col("text"), 1, 40)).alias("code")
    )


@register(
    "fn_epoch_to_oslo",
    sql=f"""
    SELECT event_id,
           {_oslo("ts")} AS oslo_wall,
           {_oslo("make_timestamp((epoch_ms(ts) // 1000) * 1000000)")} AS oslo_from_s,
           {_oslo("make_timestamp(epoch_ms(ts) * 1000)")} AS oslo_from_ms
    FROM events
    """,
)
def fn_epoch_to_oslo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5/F7 epoch/datetime → Europe/Oslo wall clock (reference
    src/transform.py:63-87, 101-109), DST-aware."""
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return events.select(
        "event_id",
        _ntz(fns.to_oslo_wall_clock(F.col("ts"))).alias("oslo_wall"),
        _ntz(fns.epoch_s_to_oslo((ms / 1000).cast("long"))).alias("oslo_from_s"),
        _ntz(fns.epoch_ms_to_oslo(ms)).alias("oslo_from_ms"),
    )


@register(
    "fn_str_parse_datetime",
    sql=f"""
    SELECT event_id,
           {_oslo("TRY_CAST(CASE WHEN event_type = 'error' THEN 'not a date' "
           "ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS TIMESTAMP)")} AS parsed_oslo
    FROM events
    """,
)
def fn_str_parse_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 ``str -> datetime-no`` (reference src/transform.py:49-60):
    parseable strings → Oslo wall clock; garbage → NULL.  Input-balanced:
    the try_to_timestamp cascade is exception-driven on misses (CPU), and
    the fixture layout scans as one task (guide §2.5)."""
    events = ensure_parallelism(load_table(spark, sf_dir, "events"))
    s = F.when(F.col("event_type") == "error", F.lit("not a date")).otherwise(
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")
    )
    return events.select(
        "event_id", _ntz(fns.str_to_oslo_datetime(s)).alias("parsed_oslo")
    )


@register(
    "fn_bool_to_int",
    sql="""
    SELECT event_id,
           CAST(CASE WHEN event_type = 'error' THEN NULL
                     ELSE "value" > 100 END AS INT) AS flag
    FROM events
    """,
)
def fn_bool_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 ``bool -> int`` — NULL-safe (reference src/transform.py:90-98)."""
    events = load_table(spark, sf_dir, "events")
    b = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value") > 100
    )
    return events.select("event_id", fns.bool_to_int(b).alias("flag"))


