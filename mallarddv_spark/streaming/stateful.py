"""Custom stateful streaming operators via ``applyInPandasWithState``.

Structured Streaming's built-in aggregations cover windowed counts; custom
per-key state machines (running profiles, session carriers, dedup caches)
need the arbitrary-state API. The pattern here — Arrow-batched pandas
per key-group, explicit GroupState handle, update-mode output — is the
production shape; swap the state transition function for any per-key logic.

At scale: state lives in the state store (RocksDB on executors), partitioned
by the grouping key — uniform hash keys again mean no hot state partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_purchases", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType()),
        StructField("total_purchases", LongType()),
    ]
)


def _update_user_profile(
    key, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate a running per-user profile across micro-batches."""
    (user_id,) = key
    total, purchases = state.get if state.exists else (0, 0)
    last_ts = None
    for pdf in batches:
        total += len(pdf)
        purchases += int((pdf["event_type"] == "purchase").sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((total, purchases))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "total_events": total,
                "total_purchases": purchases,
                "last_ts": last_ts,
            }
        ]
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile: event/purchase totals carried in
    group state across micro-batches (emitted in update mode every batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
