"""Streaming exact deduplication with bounded state.

Batch ``exact_dedup`` (operators/dedup.py) sees the whole corpus; an
unbounded stream cannot hold every seen key forever. Spark's
``dropDuplicatesWithinWatermark`` keeps a key in state only until the
event-time watermark passes it: duplicates arriving within the
watermark window are dropped, state is O(keys per window) regardless of
stream length — the 100 TB/day ingest answer, where duplicate records
(retries, replays, at-least-once sources) cluster in time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    records: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark window.

    ``records`` must be a streaming DataFrame with an event-time
    column. Exactly-once within the window; duplicates separated by
    more than the watermark delay are NOT deduplicated (that is the
    state bound, by design — widen the watermark to widen the
    guarantee)."""
    return records.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
