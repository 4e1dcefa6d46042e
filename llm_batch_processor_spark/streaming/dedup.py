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


def dedup_stream_against_corpus(
    records: DataFrame,
    seen_digests: DataFrame,
    content_col: str = "text",
    digest_col: str = "h",
) -> DataFrame:
    """Drop incoming records whose content the static corpus already
    holds — the streaming twin of the batch ``dedup_incremental`` query.

    A STREAM-STATIC join: ``seen_digests`` is a bounded batch table of
    content digests (16-byte md5 keys, never the corpus text) that
    Spark re-resolves per micro-batch; the stream side anti-joins
    against it, so state is ZERO (no watermark needed — the seen-set
    lives in the static table, not in streaming state). At 100 TB the
    digest table is a bucketed parquet table (sources/bucketed.py) so
    each micro-batch joins without a shuffle of the static side.

    Combine with :func:`dedup_stream` upstream to also drop
    within-stream duplicates that are not yet in the corpus."""
    from pyspark.sql import functions as F

    keyed = records.withColumn(digest_col, F.md5(F.col(content_col)))
    return keyed.join(
        seen_digests.select(digest_col).distinct(), digest_col, "left_anti"
    ).drop(digest_col)
