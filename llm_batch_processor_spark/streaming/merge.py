"""Streaming CDC MERGE apply (the continuous twin of ``cdc_merge_apply``).

A change stream (op ∈ {U, D, I} rows with an event-time column) folds
into a key→latest-state snapshot with ``foreachBatch``: each
micro-batch first resolves *within itself* (several changes to one key
can share a batch — latest timestamp wins, delete beats same-timestamp
upsert), then merges into the managed snapshot with the same
precedence aggregate. Precedence is EVENT-TIME, not batch-arrival
order: the snapshot persists each key's winning timestamp (and
tombstones for deletes), so a late-arriving older change in a later
micro-batch can never overwrite newer snapshot state, and a stale
upsert can never resurrect a newer delete. The snapshot lives in a
parquet directory the caller owns; at scale that directory is a
partitioned/bucketed table and each merge rewrites only the partitions
the batch touches (here: whole-snapshot rewrite, documented as the
local-mode simplification).

Crash safety of the rewrite: the next snapshot is written to a
``<dir>.b<batch_id>`` staging directory, then swapped in with a
directory rename. The swap itself is two steps (remove old, rename
staged) and is NOT atomic — if the process dies between them, the
snapshot directory is missing but the staged directory survives, and
:func:`_latest_snapshot_source` recovers from the newest staged copy
when the checkpointed batch replays. Replaying a batch against its own
staged output is idempotent (same keys, same timestamps, same
winners).

Why foreachBatch and not a stateful operator: MERGE needs the previous
*snapshot*, not per-key running state in the stream engine — the
snapshot must be queryable between batches and survive restarts, which
a sink directory gives for free (plus exactly-once via the batch id).
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _prio() -> F.Column:
    # delete outranks upsert at equal event time (a replayed delete
    # must stay deleted); snapshot rows re-derive the same rank from
    # their stored op, so replays are idempotent
    return F.when(F.col("op") == "D", 2).otherwise(1)


def resolve_batch(changes: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Collapse a change batch to one winning row per key.

    Precedence: later ``ts_col`` wins; on equal timestamps a delete
    beats an upsert. One map-side-combinable max(struct) per key."""
    return (
        changes.groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.col(ts_col).alias("ts"), _prio().alias("prio"), "op", "payload"
                )
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
    """Next snapshot = snapshot ⊎ resolved batch, event time winning.

    Both sides carry ``(key, op, ts, payload)``; the winner per key is
    ``max(struct(ts, prio, …))`` — newest event time first, delete over
    upsert on ties. Tombstones (op='D') stay IN the snapshot so their
    event time keeps guarding against stale resurrections; use
    :func:`read_snapshot` (or filter ``op != 'D'``) for the live view.
    """
    cols = [key_col, "op", "ts", "payload"]
    merged = (
        snapshot.select(*cols)
        .unionByName(batch.select(*cols))
        .groupBy(key_col)
        .agg(
            F.max(
                F.struct("ts", _prio().alias("prio"), "op", "payload")
            ).alias("w")
        )
    )
    return merged.select(
        key_col,
        F.col("w.op").alias("op"),
        F.col("w.ts").alias("ts"),
        F.col("w.payload").alias("payload"),
    )


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """The live (tombstone-free) view of a managed snapshot directory."""
    src = _latest_snapshot_source(snapshot_dir)
    if src is None:
        raise FileNotFoundError(f"no snapshot at {snapshot_dir}")
    return spark.read.parquet(src).filter(F.col("op") != "D").drop("op")


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def _latest_snapshot_source(snapshot_dir: str) -> str | None:
    """The committed snapshot, else the newest staged ``.b<id>`` copy
    (crash between swap steps — see module docstring), else None."""
    if _has_parquet(snapshot_dir):
        return snapshot_dir
    staged = [
        (int(m.group(1)), p)
        for p in glob.glob(snapshot_dir + ".b*")
        if (m := re.fullmatch(re.escape(snapshot_dir) + r"\.b(\d+)", p))
        and _has_parquet(p)
    ]
    return max(staged)[1] if staged else None


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
        src = _latest_snapshot_source(snapshot_dir)
        if src is not None:
            snap = spark.read.parquet(src)
        else:
            snap = spark.createDataFrame([], schema=resolved.schema)
        nxt = merge_snapshot(snap, resolved, key_col)
        # local-mode simplification: rewrite the whole snapshot; a real
        # deployment partitions the snapshot and rewrites touched
        # partitions only (or targets a MERGE-capable table format)
        tmp = snapshot_dir + f".b{batch_id}"
        nxt.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(snapshot_dir):
            shutil.rmtree(snapshot_dir)
        os.rename(tmp, snapshot_dir)
        # older staged copies are superseded once the swap lands
        for p in glob.glob(snapshot_dir + ".b*"):
            shutil.rmtree(p, ignore_errors=True)

    writer = changes.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
