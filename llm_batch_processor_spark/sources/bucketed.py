"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

At 100 TB the same fact tables join on the same keys every day; paying
the fact-fact shuffle per query is the single largest avoidable cost.
Writing both sides bucketed by the join key (same bucket count) lets
Spark's scan report a compatible output partitioning, so the join plans
with ZERO Exchange on either side — the shuffle was paid once at write
time and amortizes over every subsequent join (the classic warehouse
layout; see the Spark SQL bucketing docs).

Bucket pruning also applies: an equality predicate on the bucket key
scans 1/n of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    Sorting within buckets additionally enables merge-join without the
    per-task sort. ``path`` makes it an external table (data at path,
    metadata in the session catalog)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata only survives the table API
    (``spark.read.parquet`` on the same files loses the layout)."""
    return spark.table(table)
