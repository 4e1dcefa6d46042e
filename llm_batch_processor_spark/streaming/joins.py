"""Streaming joins: stream-static enrichment and stream-stream
interval joins.

- Stream-static: each micro-batch hash-joins against a static (or
  slowly-refreshed) dimension; Spark re-plans the static side per
  batch, so a small dim BROADCASTs into every batch — no state store
  involved, unbounded stream, bounded memory.
- Stream-stream: both sides buffer in the state store; the join
  REQUIRES (a) watermarks on both inputs and (b) an event-time range
  condition, which together bound how long either side is retained —
  without the range bound the state grows with the stream. This is
  Spark's micro-batch realization of an interval join (the batch twin
  is ``join_interval_overlap`` / ``join_asof`` in queries/relational).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_static(
    events: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Enrich a stream with a static dimension via broadcast hash join.

    ``dim`` must carry ``key``; all its other columns attach to every
    matching event. Left join keeps events with no dimension row
    (their dim columns become NULL) — enrichment must not drop data.
    """
    return events.join(F.broadcast(dim), on=key, how="left")


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Join each purchase to the clicks that preceded it within
    ``max_gap`` for the same user (attribution-style interval join).

    Both sides are watermarked and the join condition carries the
    event-time range ``click.ts <= purchase.ts <= click.ts + gap``,
    so the state store evicts rows once the watermark passes their
    horizon — bounded state on an unbounded stream.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"""
            c_user = p_user AND
            p_ts >= c_ts AND
            p_ts <= c_ts + interval {max_gap}
            """
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "c_ts",
        "p_ts",
        "c_value",
        "p_value",
    )
