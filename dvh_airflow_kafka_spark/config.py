"""Declarative pipeline configuration.

Mirrors the reference's YAML ``CONSUMER_CONFIG`` surface (reference
src/config.py:44-117, README.md:74-169) so an existing consumer config can
drive this engine unchanged, while extending the enums with Spark-native
source/sink kinds (parquet, jdbc, console, memory).

Everything is validated up front by pydantic — the validated config plus
the compiled transform rules *is* the logical plan handed to Spark
(the reference likewise treats config as the whole plan, SURVEY.md §3.1);
Catalyst then owns physical planning.
"""

from __future__ import annotations

import enum
from typing import Any, Optional

import yaml
from pydantic import BaseModel, ConfigDict, Field


class PayloadSchema(str, enum.Enum):
    """Value-deserialization mode (reference src/config.py:44-47)."""

    AVRO = "avro"
    JSON = "json"
    STRING = "string"


class KeyCodec(str, enum.Enum):
    """Kafka key decoding (reference src/config.py:54-56)."""

    INT_64 = "int-64"
    UTF_8 = "utf-8"


class ReadStrategy(str, enum.Enum):
    """assign = timestamp-bounded batch read; subscribe = consumer-group
    incremental (reference src/config.py:63-65)."""

    ASSIGN = "assign"
    SUBSCRIBE = "subscribe"


class SourceKind(str, enum.Enum):
    KAFKA = "kafka"
    # Spark-native extensions: a parquet/json file source can stand in for
    # the Kafka log (the driver's `events` table plays this role).
    PARQUET = "parquet"
    JSON_FILES = "json-files"


class SinkKind(str, enum.Enum):
    ORACLE = "oracle"  # reference target (src/config.py:59-60); JDBC-backed here
    JDBC = "jdbc"
    KAFKA = "kafka"
    PARQUET = "parquet"
    CONSOLE = "console"
    MEMORY = "memory"


class AllowRule(BaseModel):
    """One OR-branch of the message allow-filter (reference
    src/config.py:68-70): keep payload iff ``message[key] == allowed_value``.
    """

    key: str
    allowed_value: Any


class SourceSpec(BaseModel):
    """Source half of the pipeline config (reference src/config.py:73-95).

    Field aliases keep the kebab-case YAML surface byte-compatible,
    including the reference's historical misspelling ``keypath-seperator``.
    """

    model_config = ConfigDict(use_enum_values=True, populate_by_name=True)

    type: SourceKind = SourceKind.KAFKA
    topic: str = ""
    group_id: str = Field("", alias="group-id")
    schema_type: PayloadSchema = Field(PayloadSchema.JSON, alias="schema")
    batch_size: int = Field(5000, alias="batch-size")
    key_decoder: KeyCodec = Field(KeyCodec.UTF_8, alias="key-decoder")
    keypath_separator: Optional[str] = Field(None, alias="keypath-seperator")
    message_fields_filter: Optional[list[str]] = Field(
        None, alias="message-fields-filter"
    )
    flag_field_config: Optional[list[str]] = Field(None, alias="flag-field-config")
    message_filters: Optional[list[AllowRule]] = Field(None, alias="message-filters")
    poll_timeout: int = Field(10, alias="poll-timeout")
    strategy: ReadStrategy = ReadStrategy.ASSIGN
    # Spark extensions
    path: Optional[str] = None  # for file-backed sources
    starting_timestamp_ms: Optional[int] = None  # DATA_INTERVAL_START analogue
    ending_timestamp_ms: Optional[int] = None  # DATA_INTERVAL_END analogue
    # Declared payload schema (DDL string, e.g. "k INT, user STRUCT<id:
    # BIGINT>"). When set, the transform DSL parses payloads with it
    # directly — no driver-side sampling job, and fields that appear late
    # in the stream still resolve. At 100 TB this is the required mode;
    # inference exists for ad-hoc exploration only.
    payload_schema: Optional[str] = Field(None, alias="payload-schema")
    # Avro writer schema (Avro schema JSON) for `schema: avro` sources.
    # When omitted, run_pipeline resolves it from the schema registry
    # (reference fetches per message id, src/kafka_source.py:153-161 — one
    # writer schema per run here; see runner docstring).
    avro_schema: Optional[str] = Field(None, alias="avro-schema")
    # Broker/security passthrough (reference src/kafka_source.py:163-180:
    # security.protocol, SSL cert/key locations, SASL credentials). Keys
    # are consumer config names (`security.protocol`,
    # `ssl.truststore.location`, ...); the readers prefix them with
    # `kafka.` as the Spark connector requires. Values land verbatim on
    # the reader — secrets should be injected by the deployment layer,
    # never inlined in committed YAML.
    kafka_options: dict[str, str] = Field(default_factory=dict, alias="kafka-options")


class PrivacyFilterSpec(BaseModel):
    """k6/k7 privacy-scrub config (reference src/config.py:98-104):
    rows whose (possibly nested) person-id appears in the lookup table with
    ``skjermet_kode IN (6,7)`` and a valid date interval get their payload
    NULLed (reference src/oracle_target.py:46-93).
    """

    model_config = ConfigDict(populate_by_name=True)

    filter_table: str = Field(alias="filter-table")
    filter_col: str = Field(alias="filter-col")
    col: str
    col_keypath_separator: str = Field(".", alias="col-keypath-separator")
    timestamp: str


class SinkSpec(BaseModel):
    """Target half of the pipeline config (reference src/config.py:106-117).

    ``skip_duplicates_with`` drives the idempotent dedup-on-insert anti-join
    (reference src/oracle_target.py:97-104). The reference's
    ``custom-config`` used ``eval`` on config strings (src/base.py:35-42);
    here it is a plain whitelisted option dict — never evaluated.
    """

    model_config = ConfigDict(use_enum_values=True, populate_by_name=True)

    type: SinkKind = SinkKind.PARQUET
    table: str = ""
    delta: Optional[dict[str, str]] = None  # {"delta-table":…, "delta-column":…}
    skip_duplicates_with: Optional[list[str]] = Field(
        default_factory=list, alias="skip-duplicates-with"
    )
    k6_filter: Optional[PrivacyFilterSpec] = Field(None, alias="k6-filter")
    options: dict[str, str] = Field(default_factory=dict)  # jdbc url etc.
    path: Optional[str] = None  # for file sinks


class TransformRuleSpec(BaseModel):
    """One transform-DSL rule (reference src/transform.py:141-148):
    ``src`` is a dotted keypath, ``$literal`` or ``$$BATCH_TIME``;
    ``fun`` names a scalar function from the registry; missing paths are an
    error unless ``allow_undefined``.
    """

    model_config = ConfigDict(populate_by_name=True)

    src: str
    dst: str
    fun: Optional[str] = None
    allow_undefined: bool = Field(False, alias="allow-undefined")
    # F3 escape hatch: with `fun: str -> datetime-no`, also parse
    # relative free-form dates ("2 days ago") against the run's frozen
    # batch time (functions.registry.str_to_oslo_datetime_fuzzy)
    fuzzy: bool = False


_ENV_REF_RE = __import__("re").compile(r"^\$\{([A-Z][A-Z0-9_]*)\}$")


def resolve_env_refs(options: dict[str, str]) -> dict[str, str]:
    """The secrets-indirection CONTRACT (engine side of the reference's
    secret-manager flow, src/config.py:10-41: a secret JSON payload is
    loaded into ``os.environ`` by the DEPLOYMENT layer, then config reads
    env): an option value written exactly ``${ENV_NAME}`` resolves from
    ``os.environ`` at spec-load time.  Committed YAML therefore never
    holds credentials — it names the variable the deployment layer must
    populate (from whatever secret store it uses; fetching is out of
    engine scope on purpose, secret-store SDKs are deployment concerns).
    Unset variables fail LOUDLY here, at config load, not deep inside a
    JDBC/Kafka connection attempt.  Literal values (no ``${...}`` form)
    pass through verbatim."""
    import os

    out: dict[str, str] = {}
    for k, v in options.items():
        m = _ENV_REF_RE.match(v) if isinstance(v, str) else None
        if m:
            name = m.group(1)
            if name not in os.environ:
                raise KeyError(
                    f"option `{k}` references ${{{name}}} but the "
                    f"environment variable is not set — the deployment "
                    f"layer must inject it before loading the pipeline"
                )
            out[k] = os.environ[name]
        else:
            out[k] = v
    return out


class PipelineSpec(BaseModel):
    """Full pipeline: one source, one sink, ordered transform rules
    (reference src/mapping.py:10-47 — strictly one-source/one-target)."""

    source: SourceSpec
    target: SinkSpec
    transform: list[TransformRuleSpec]

    @classmethod
    def from_yaml(cls, text: str) -> "PipelineSpec":
        raw = yaml.safe_load(text)
        spec = cls(
            source=SourceSpec.model_validate(raw["source"]),
            target=SinkSpec.model_validate(raw["target"]),
            transform=[TransformRuleSpec.model_validate(r) for r in raw["transform"]],
        )
        # env-var indirection for secret-bearing option maps (see
        # resolve_env_refs) — applied once, at load
        spec.source.kafka_options = resolve_env_refs(spec.source.kafka_options)
        spec.target.options = resolve_env_refs(spec.target.options)
        return spec
