"""Stream-stream joins: watermarked interval joins between event streams.

Structured Streaming executes a stream-stream join by buffering both sides
in the state store; the join TIME BOUND plus the two watermarks is what
lets it evict state (without them state grows forever and the query is
rejected for outer joins). The canonical shape here — "match each purchase
to the user's clicks in the preceding hour" — is the attribution join every
event pipeline needs:

* both sides are watermarked (bounded disorder),
* the join condition carries an explicit interval
  (``click_ts BETWEEN purchase_ts - <window> AND purchase_ts``),
* state eviction follows from watermark + interval; at 100 TB/day the
  state per key is bounded by (window + watermark) of data, partitioned by
  the equality key — uniform user ids shuffle evenly.

The same function works on batch DataFrames (identical code path, minus
watermarks) — that twin is oracle-checked by the driver gate
(``events_purchase_attribution``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows with the same ``on`` key whose
    ``right_ts`` falls in ``[left_ts - lookback, left_ts]``.

    Streaming inputs get watermarks applied (required for state eviction;
    for outer joins Spark enforces them). ``lookback`` accepts a SQL
    interval string ("1 hour", "90 minutes").
    """
    from mallarddv_spark.streaming.event_time import ensure_event_time

    lw = (
        ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
        if left.isStreaming
        else left
    )
    rw = (
        ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= F.expr(f"{left_ts} - interval {lookback}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, how).drop(rw[on])


def purchase_attribution(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Attribution: every (purchase, prior click within ``lookback``) pair
    per user, with the click-to-purchase latency in seconds.

    Input is the canonical events frame (event_id, user_id, ts,
    event_type). Streaming or batch — same plan shape; streaming buffers
    at most (lookback + watermark) of per-user state.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = interval_join(
        purchases, clicks, on="user_id",
        left_ts="purchase_ts", right_ts="click_ts",
        lookback=lookback, watermark=watermark,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        # timestampdiff is timezone-free and legal on both TIMESTAMP and
        # TIMESTAMP_NTZ inputs (a direct cast-to-double is rejected for NTZ).
        F.expr(
            "cast(floor(timestampdiff(MICROSECOND, click_ts, purchase_ts) / 1e6)"
            " as bigint)"
        ).alias("latency_sec"),
    )
