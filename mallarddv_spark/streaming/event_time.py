"""Event-time column normalization for Structured Streaming.

Watermarks (and therefore every stateful streaming operator) require the
event-time column to be TIMESTAMP — Spark rejects TIMESTAMP_NTZ with
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Parquet columns written without
timezone metadata (``timestamp[us]``, the common lake layout) surface as
TIMESTAMP_NTZ under Spark 4's NTZ inference, so any stream reading such
files needs this coercion. The cast interprets the naive value in the
session timezone; ``session.get_spark`` pins that to UTC, which makes the
coercion a pure relabeling (no instant shift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Return ``df`` with ``ts_col`` usable as a watermark column: NTZ
    timestamps are cast to TIMESTAMP (session tz), everything else passes
    through untouched."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
