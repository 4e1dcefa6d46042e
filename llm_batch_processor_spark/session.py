"""SparkSession construction with scale-minded defaults.

Used by bench.py, the CLI, and tests. Driver-provided sessions (the
correctness harness) are instead *adjusted at runtime* via
:func:`ensure_session_conf`, which only touches runtime-settable confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every query path relies on. Kept minimal:
# - UTC session TZ: the testdata timestamps are naive (parquet
#   isAdjustedToUTC=false); DuckDB treats them naively, so any
#   TIMESTAMP <-> TIMESTAMP_NTZ hop must happen at UTC.
# - nanosAsLong: events.parquet uses parquet TIMESTAMP(NANOS) which the
#   Spark reader rejects by default (PARQUET_TYPE_ILLEGAL); reading the
#   raw int64 keeps the scan vectorized and JVM-side.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Performance confs that are runtime-settable and safe at every scale.
# The correctness harness hands us ITS session (stock confs: 200 shuffle
# partitions, AQE per Spark default) — without AQE coalesce, every
# multi-shuffle dedup/LSH query at check scale runs hundreds of empty
# tasks per stage, which measured ~2x slower end-to-end.
_PERF_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # UDTFs (text_fragments) evaluate via Arrow batches instead of
    # row-at-a-time pickle round-trips (BatchEvalPythonUDTF)
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
}


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime confs needed for correct reads, plus
    scale-neutral perf defaults (AQE, Arrow). A shuffle-partition count
    left at Spark's stock 200 is right-sized to 2x the session's cores;
    an explicitly configured value is respected."""
    for k, v in {**_RUNTIME_CONF, **_PERF_CONF}.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    try:
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(2 * spark.sparkContext.defaultParallelism),
            )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "llm-batch-processor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local session tuned for this machine; cluster-safe defaults.

    AQE stays on (runtime coalesce + skew-join split), shuffle partitions
    default to 2x local cores (on a real cluster, leave AQE to coalesce),
    Arrow transfer on for the pandas_udf paths.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        ncores = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", 2 * ncores))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    return ensure_session_conf(spark)
