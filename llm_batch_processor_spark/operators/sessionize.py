"""Event-time windowing computed batch-side (streaming twins live in
``streaming/``): gap-based sessionization and tumbling windows.

All epoch math is integer (floor division on epoch seconds) so results
are bit-identical to any SQL oracle — no float seconds, no timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    epoch_col: str = "epoch_s",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user.

    A new session starts when the gap to the previous event exceeds
    ``gap_seconds``. Adds ``session_seq`` (1-based per user). One
    window (shuffle by user) for lag + one running sum over the same
    partitioning — Catalyst reuses the sort."""
    w = Window.partitionBy(user_col).orderBy(epoch_col, order_tiebreak)
    gap = F.col(epoch_col) - F.lag(epoch_col).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(wsum)
    ).drop("__new")


def session_aggregate(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    return sessions.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("epoch_s").alias("sess_start"),
        F.max("epoch_s").alias("sess_end"),
    )


def tumbling_window(
    events: DataFrame,
    width_seconds: int = 600,
    epoch_col: str = "epoch_s",
) -> DataFrame:
    """Per-bucket counts/aggregates; bucket = floor(epoch / width) * width
    (epoch-aligned, identical to Structured Streaming's window())."""
    bucket = (F.col(epoch_col) - (F.col(epoch_col) % width_seconds)).alias("bucket_start")
    return (
        events.groupBy(bucket)
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").try_cast("DECIMAL(18,6)")).cast("double").alias("sum_value"),
        )
    )
