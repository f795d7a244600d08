"""Event-stream operators (batch over the events table; the Structured
Streaming twins live in ``streaming/``).

The events table is TIMESTAMP_NTZ; all time arithmetic is done on formatted
strings or tz-free deltas so results are independent of any session timezone
(portable across engines and driver configs).

- ``hourly_rollup``: tumbling 1h window count + exact integer sum (values as
  cents, so the aggregate is order-independent — a raw double sum is not
  reproducible under shuffle).
- ``sessionize``: 30-minute-gap sessionization via lag + running sum — the
  classic stateful-shaped computation expressed with window functions.
- ``enrich_with_customer``: broadcast dimension join (events.user_id ->
  customer.c_custkey) + per-segment rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "timestamp_ntz'1970-01-01 00:00:00'"


def epoch_seconds_ntz(col: str):
    """tz-free seconds since epoch for a TIMESTAMP_NTZ column."""
    return F.expr(f"timestampdiff(SECOND, {_EPOCH_NTZ}, {col})")


def hourly_rollup(events: DataFrame) -> DataFrame:
    hour = F.date_format("ts", "yyyy-MM-dd HH").alias("hour")
    return events.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-user sessions: a new session starts when the gap from the previous
    event exceeds ``gap_seconds``. Returns per-user session stats."""
    sec = epoch_seconds_ntz("ts")
    w = Window.partitionBy("user_id").orderBy("sec")
    with_gap = events.select(
        "user_id",
        "event_id",
        sec.alias("sec"),
    ).withColumn("prev_sec", F.lag("sec").over(w))
    flagged = with_gap.withColumn(
        "new_session",
        (F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > gap_seconds))
        .cast("int"),
    )
    with_session = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("duration_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.max("duration_s").alias("max_session_duration_s"),
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Broadcast dim join + rollup by market segment."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
    )
