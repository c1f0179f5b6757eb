"""A2 — ProcessSummary run counters.

The reference accumulates event/data/error/written counts in a mutable
dataclass threaded through the poll loop (src/kafka_source.py:24-45) and
reports them to Airflow xcom (src/main.py:40-53). Spark equivalents:

- ``observe_summary``: ``df.observe(Observation, ...)`` — counters are
  computed as a side effect of the *existing* job, no extra pass over the
  data (the right tool at 100 TB).
- ``summary_frame``: the counters as a 1-row DataFrame for oracle-checked
  batch queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_COUNTERS = (
    "event_count",
    "data_count",
    "filtered_count",
)


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
    """The same counters as a single-row DataFrame (xcom analogue,
    reference README.md:60-66)."""
    return df.agg(*_counter_cols(message_col))
