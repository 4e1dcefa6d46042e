"""Canonical loaders for the driver-generated testdata tables.

Every query builder goes through :func:`load` so type normalization
happens in exactly one place:

- ``events.ts`` is parquet TIMESTAMP(NANOS): Spark can't type it, so we
  read it as raw int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``)
  and derive both ``ts`` (TIMESTAMP_NTZ, microsecond precision — exactly
  what DuckDB sees) and ``ts_ns`` (the raw integer, used for epoch math
  that must match the oracle bit-for-bit).
- everything else maps 1:1 (timestamp_ntz / bigint / double / string /
  array<float>).

All derivation is built-in-expression only — the scan stays vectorized
and columnar, filters/pruning still push down to parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_session_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with canonical column types."""
    ensure_session_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        # raw int64 nanos -> (ts TIMESTAMP_NTZ @ microseconds, ts_ns bigint)
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts",
                F.expr(
                    "CAST(timestamp_micros(CAST(ts_ns DIV 1000 AS LONG)) AS TIMESTAMP_NTZ)"
                ),
            )
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all tables as temp views (for spark.sql-built queries)."""
    for n in TABLE_NAMES:
        load(spark, sf_dir, n).createOrReplaceTempView(prefix + n)
