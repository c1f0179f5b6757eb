"""A2 — ProcessSummary run counters.

The reference accumulates counters in a mutable dataclass threaded through
the poll loop (src/kafka_source.py:24-45) and reports them to Airflow xcom
(src/main.py:40-53). Exact reference semantics (src/kafka_source.py:296-352):

- ``event_count`` / ``non_empty_count``: every real message polled
  (incremented together, :306-307);
- ``data_count``: proper (non-error) messages collected into batches
  (:328) — rows whose payload was NULLed by the allow-filter still count;
- ``written_to_db_count``: sum of batch lengths handed to the sink
  (:344) — the sink's NOT-EXISTS dedup does not decrement it;
- ``committed_to_producer_count``: -1 in assign mode (:295), batch length
  accumulated after each commit in subscribe mode (:394);
- ``empty_count``: empty *polls* (:301) — structurally zero for a bounded
  batch read, counts empty micro-batches in streaming;
- ``error_count``: non-critical broker errors (:323) — zero for file-backed
  sources.

Spark equivalents:

- ``observe_summary``: ``df.observe(Observation, ...)`` — counters are
  computed as a side effect of the *existing* job, no extra pass over the
  data (the right tool at 100 TB).
- ``summary_frame``: the data-shaped counters as a 1-row DataFrame for
  oracle-checked batch queries.
- ``ProcessSummary``: the xcom-parity result record.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class ProcessSummary:
    """Run counters, field-for-field the reference's xcom contract
    (reference src/main.py:40-53, README.md:60-66)."""

    event_count: int = 0
    data_count: int = 0
    error_count: int = 0
    written_to_db_count: int = 0
    committed_to_producer_count: int = -1
    empty_count: int = 0
    non_empty_count: int = 0

    def as_xcom(self) -> dict:
        return asdict(self)


def _counter_cols(message_col: str):
    return [
        F.count(F.lit(1)).alias("event_count"),
        F.count(F.col(message_col)).alias("data_count"),
        F.sum(F.when(F.col(message_col).isNull(), 1).otherwise(0)).alias(
            "filtered_count"
        ),
    ]


def observe_summary(df: DataFrame, message_col: str = "kafka_message", name: str = "process_summary"):
    """Attach run counters to a plan; returns (df, Observation). Read
    ``observation.get`` after the first action on ``df``."""
    obs = Observation(name)
    return df.observe(obs, *_counter_cols(message_col)), obs


def summary_frame(df: DataFrame, message_col: str = "kafka_message") -> DataFrame:
    """Payload-sensitive counters as a single-row DataFrame: total rows,
    rows that kept a payload, rows the allow-filter NULLed."""
    return df.agg(*_counter_cols(message_col))


def full_summary_frame(
    df: DataFrame,
    message_col: str = "kafka_message",
    subscribe: bool = False,
) -> DataFrame:
    """The complete reference counter row for a bounded batch run
    (semantics table in the module docstring): event = non_empty = data =
    written = |rows|; empty/error = 0; committed = -1 (assign) or written
    (subscribe). ``filtered_count`` is an engine extension counting
    allow-filtered rows."""
    n = F.count(F.lit(1))
    committed = n if subscribe else F.lit(-1).cast("long")
    return df.agg(
        n.alias("event_count"),
        n.alias("data_count"),
        F.lit(0).cast("long").alias("error_count"),
        n.alias("written_to_db_count"),
        committed.alias("committed_to_producer_count"),
        F.lit(0).cast("long").alias("empty_count"),
        n.alias("non_empty_count"),
        F.sum(F.when(F.col(message_col).isNull(), 1).otherwise(0)).alias(
            "filtered_count"
        ),
    )
