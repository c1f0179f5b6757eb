"""S10/A1 — delta watermark: incremental-load lower bound derived from the
sink.

Reference behaviour (src/oracle_target.py:17-20, 30-43): before reading,
``SELECT MAX(delta_column) FROM delta_table``; the Oslo-localized result
becomes the epoch-ms ``DATA_INTERVAL_START``. In Spark this is a scalar
aggregate on the sink table — for a JDBC sink the MAX is pushed down to
the database; for a parquet/lake sink it is a metadata-cheap column max.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_watermark(sink: DataFrame, column: str):
    """MAX(column) of the sink table (reference src/oracle_target.py:35),
    or None when the sink is empty."""
    row = sink.agg(F.max(F.col(column)).alias("wm")).collect()[0]
    return row["wm"]


def delta_watermark_epoch_ms(sink: DataFrame, column: str) -> Optional[int]:
    """The watermark as epoch ms — the reference feeds this into
    ``DATA_INTERVAL_START`` (src/oracle_target.py:30-43); here it feeds
    ``SourceSpec.starting_timestamp_ms`` / Kafka
    ``startingOffsetsByTimestamp``."""
    wm = delta_watermark(sink, column)
    if wm is None:
        return None
    if isinstance(wm, dt.datetime):
        if wm.tzinfo is None:
            wm = wm.replace(tzinfo=dt.timezone.utc)
        return int(wm.timestamp() * 1000)
    return int(wm)
