"""Watermarked event-time windows over a streaming events source.

Batch twins live in queries/pipeline_ext.py (``tumbling_window``,
``session_window`` — oracle-checked by the driver). These are the same
aggregations under readStream with a watermark bounding state:

- tumbling: ``groupBy(window(ts, width))`` — state per open window,
  dropped once the watermark passes window end; late rows beyond the
  watermark are discarded rather than reopening state (the 100 TB
  posture: bounded state regardless of stream length).
- session: ``session_window(ts, gap)`` — Spark's native gap-merge
  session state (merging session windows per key as events arrive).

Append mode emits a window only when the watermark closes it — tests
drive two micro-batches (maxFilesPerTrigger=1) so batch 2's events
advance the watermark past batch 1's windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    window_width: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-window event counts with bounded late-data state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_width).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window_width: str = "20 minutes",
    slide: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping (sliding) windows: each event lands in
    width/slide concurrent windows — the streaming twin of the batch
    ``sliding_distinct_users`` contribute-then-count rewrite (Spark's
    ``window(ts, width, slide)`` performs exactly that bounded fan-out
    inside the state store). Watermark bounds open-window state the
    same way as tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_width, slide).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def session_counts_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per user via native session_window state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
        )
    )
