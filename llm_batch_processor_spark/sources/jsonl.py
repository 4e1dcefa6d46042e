"""JSONL record source/sink with corrupt-record routing.

Reference A1/A2 (lib/job_processor.rb:15-32): stdin lines are parsed as
JSON; malformed lines are logged to stderr and *skipped* — the job
never fails on data (exit stays 0, pinned spec/bin_job_spec.rb:140-153).

Spark-first: one ``spark.read.text`` scan + ``from_json`` (malformed ->
null struct), which routes corrupt rows to a dead-letter DataFrame
without the cache Spark requires to query a PERMISSIVE reader's
corrupt-record column alone (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
RECORD_COLUMN) — caching is a non-starter at 100 TB. Good rows keep the
record contract (missing ``texts`` -> {}, missing ``images`` -> [],
job_processor.rb:45-46). Blank lines are dropped silently (A1 skips
them, :18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

CORRUPT = "_corrupt"

RECORD_STRUCT = StructType(
    [
        StructField("id", StringType()),
        StructField("texts", MapType(StringType(), StringType())),
        StructField("images", ArrayType(StringType())),
        StructField(CORRUPT, StringType()),
    ]
)


ORDER_COL = "__ord"


def parse_record_lines(
    lines: DataFrame, keep_order: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Shared batch/streaming parse: raw ``value`` lines -> (good, corrupt).

    ``keep_order=True`` attaches an ``__ord`` column encoding the input
    position (monotonically_increasing_id: split index in the high
    bits, in-split row index below — sorting by it reproduces file
    order, since a file's splits are created in offset order). The
    reference emits output in input order (its loop is sequential;
    pinned by spec/bin_job_spec.rb:98-107), so the CLI's stdout mode
    sorts by this before emitting."""
    if keep_order:
        lines = lines.withColumn(ORDER_COL, F.monotonically_increasing_id())
    parsed = (
        lines
        .filter(F.regexp_replace("value", r"^\s+|\s+$", "") != "")  # blank: silent skip
        .select(
            *([ORDER_COL] if keep_order else []),
            F.col("value").alias("raw"),
            F.from_json(
                "value",
                RECORD_STRUCT,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT},
            ).alias("rec"),
        )
    )
    good = parsed.filter(
        F.col("rec").isNotNull() & F.col(f"rec.{CORRUPT}").isNull()
    ).select(
        F.col("rec.id").cast("string").alias("id"),
        F.coalesce(F.col("rec.texts"), F.create_map().cast("map<string,string>")).alias(
            "texts"
        ),
        F.coalesce(F.col("rec.images"), F.array().cast("array<string>")).alias("images"),
        *([ORDER_COL] if keep_order else []),
    )
    corrupt = parsed.filter(
        F.col("rec").isNull() | F.col(f"rec.{CORRUPT}").isNotNull()
    ).select("raw")
    return good, corrupt


def read_records(
    spark: SparkSession, path: str, keep_order: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Return (good, corrupt): parsed records + dead-letter raw lines."""
    return parse_record_lines(spark.read.text(path), keep_order=keep_order)


def to_jsonl_column(df: DataFrame) -> DataFrame:
    """One JSON string per record with the reference's key order
    (id, texts, images — docs/example/input-output.jsonl)."""
    return df.select(
        F.to_json(F.struct(F.col("id"), F.col("texts"), F.col("images"))).alias("line")
    )


def write_records(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSONL sink (directory of part files — the scale path)."""
    df.select("id", "texts", "images").write.mode(mode).json(path)
