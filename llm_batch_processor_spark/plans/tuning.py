"""Cluster-shape -> Spark conf recommendations for the 100 TB posture.

Heuristics, all standard public Spark tuning practice:

- shuffle partitions sized so each post-shuffle partition lands near
  ``target_partition_bytes`` (default 128 MiB) — small enough to fit in
  executor memory with room for hash tables, big enough to amortize task
  overhead. AQE coalescing then trims the fragments at runtime.
- file split size (``maxPartitionBytes``) kept at 128 MiB so scan tasks
  saturate cores without tiny-file storms (pair with input compaction).
- broadcast threshold raised only when executor memory allows ~10x the
  broadcast on the build side.
- skew handled by AQE (``skewJoin``) rather than manual salting unless a
  single hot key exceeds what one task can spill.
"""

from __future__ import annotations

MIB = 1024 * 1024
GIB = 1024 * MIB


def recommend_conf(
    input_bytes: int,
    executors: int = 1,
    cores_per_executor: int = 4,
    executor_memory_bytes: int = 8 * GIB,
    target_partition_bytes: int = 128 * MIB,
) -> dict[str, str]:
    """Conf dict for a job scanning ``input_bytes`` on the given cluster.

    Example: 100 TB over 1000 executors x 4 cores ->
    ~800k raw shuffle partitions is too many; capped to 8x total cores so
    every core gets ~200 waves of work, with AQE coalescing downward.
    """
    total_cores = max(1, executors * cores_per_executor)
    by_size = max(1, input_bytes // target_partition_bytes)
    # between 2x and 8x total cores, unless the data itself is smaller
    shuffle_parts = int(min(max(by_size, 2 * total_cores), 8 * total_cores))

    # broadcast build side should stay well under a tenth of executor mem
    broadcast = int(min(max(executor_memory_bytes // 10, 8 * MIB), 512 * MIB))

    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(target_partition_bytes),
        "spark.sql.autoBroadcastJoinThreshold": str(broadcast),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            target_partition_bytes
        ),
    }
