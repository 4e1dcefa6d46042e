"""ensure_session_conf is the contract that keeps the engine correct
inside a session it does NOT own (the correctness driver hands us its
own SparkSession with stock confs). Pin the self-healing behavior."""

from __future__ import annotations

from llm_batch_processor_spark.session import ensure_session_conf


def test_stock_shuffle_partitions_are_rightsized(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")  # Spark stock default
        ensure_session_conf(spark)
        expected = 2 * spark.sparkContext.defaultParallelism
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(expected)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_explicit_shuffle_partitions_are_respected(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        ensure_session_conf(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "37"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_correctness_and_perf_confs_applied(spark):
    ensure_session_conf(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.pythonUDTF.arrow.enabled") == "true"
