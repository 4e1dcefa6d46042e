"""Streaming CDC MERGE apply (the continuous twin of ``cdc_merge_apply``).

A change stream (op ∈ {U, D, I} rows with an event-time column) folds
into a key→latest-state snapshot with ``foreachBatch``: each
micro-batch first resolves *within itself* (several changes to one key
can share a batch — latest timestamp wins, delete beats same-timestamp
upsert), then merges into the managed snapshot with the same
precedence aggregate the batch query uses. The snapshot lives in a
parquet directory the caller owns; at scale that directory is a
partitioned/bucketed table and each merge rewrites only the partitions
the batch touches (here: whole-snapshot rewrite, documented as the
local-mode simplification).

Why foreachBatch and not a stateful operator: MERGE needs the previous
*snapshot*, not per-key running state in the stream engine — the
snapshot must be queryable between batches and survive restarts, which
a sink directory gives for free (plus exactly-once via the batch id).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def resolve_batch(changes: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Collapse a change batch to one winning row per key.

    Precedence: later ``ts_col`` wins; on equal timestamps a delete
    beats an upsert (a replayed delete must stay deleted). One
    map-side-combinable max(struct) per key."""
    op_rank = F.when(F.col("op") == "D", 2).otherwise(1)
    return (
        changes.groupBy(key_col)
        .agg(
            F.max(
                F.struct(F.col(ts_col).alias("ts"), op_rank.alias("rank"), "op", "payload")
            ).alias("w")
        )
        .select(
            key_col,
            F.col("w.op").alias("op"),
            F.col("w.ts").alias("ts"),
            F.col("w.payload").alias("payload"),
        )
    )


def merge_snapshot(
    snapshot: DataFrame, batch: DataFrame, key_col: str
) -> DataFrame:
    """Next snapshot = snapshot ⊎ resolved batch, change rows winning."""
    base = snapshot.select(
        key_col, F.lit("B").alias("op"), F.lit(0).alias("prio"), "payload"
    )
    chg = batch.select(
        key_col,
        "op",
        F.when(F.col("op") == "D", 2).otherwise(1).alias("prio"),
        "payload",
    )
    merged = base.unionByName(chg).groupBy(key_col).agg(
        F.max(F.struct("prio", "op", "payload")).alias("w")
    )
    return merged.filter(F.col("w.op") != "D").select(
        key_col, F.col("w.payload").alias("payload")
    )


def start_merge_stream(
    changes: DataFrame,
    snapshot_dir: str,
    key_col: str = "doc_id",
    ts_col: str = "ts",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Run the change stream into a parquet snapshot directory."""
    spark = changes.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        resolved = resolve_batch(batch_df, key_col, ts_col)
        if os.path.isdir(snapshot_dir) and any(
            f.endswith(".parquet") for f in os.listdir(snapshot_dir)
        ):
            snap = spark.read.parquet(snapshot_dir)
        else:
            snap = spark.createDataFrame(
                [], schema=resolved.select(key_col, "payload").schema
            )
        nxt = merge_snapshot(snap, resolved, key_col)
        # local-mode simplification: rewrite the whole snapshot; a real
        # deployment partitions the snapshot and rewrites touched
        # partitions only (or targets a MERGE-capable table format)
        tmp = snapshot_dir + f".b{batch_id}"
        nxt.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(snapshot_dir)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    writer = changes.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
