"""Streaming record source (reference A1/A2 under ``readStream``).

Batch and streaming share one parse: ``text`` scan -> ``from_json`` with
corrupt-record routing (sources/jsonl.py:parse_record_lines). The
streaming variant reads a directory as an unbounded file source — new
files are new micro-batches — which is exactly how a 100 TB ingest lands
in practice (object-store prefixes filling with JSONL part files).

Corrupt lines cannot be collected to a second sink from the same
streaming query without ``foreachBatch`` (one sink per query), so the
streaming good-path silently drops them; ``run_stream_job`` uses
``foreachBatch`` to route both branches when a dead-letter path is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.jsonl import parse_record_lines


def read_record_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded JSONL record stream from a directory of files."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(path)
    good, _ = parse_record_lines(lines)
    return good
