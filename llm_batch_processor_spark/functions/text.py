"""Scalar text functions — all built-in-expression (JVM, codegen'd).

``think_strip`` is reference A9 (lib/job_processor.rb:207-210): remove
every non-greedy ``<think>...</think>`` block (DOTALL), then strip
surrounding whitespace. Malformed/unclosed tags and ``<thinking>`` are
left untouched — pinned by spec/reasoning_removal_spec.rb:34-148.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

THINK_RE = r"(?s)<think>.*?</think>"
# Ruby String#strip trims all leading/trailing whitespace incl. newlines;
# SQL trim() only trims spaces, so use an anchored regex on both engines.
TRIM_RE = r"^\s+|\s+$"

# DuckDB dialect twins (for oracle SQL builders)
DUCKDB_THINK = "regexp_replace({col}, '<think>.*?</think>', '', 'gs')"
DUCKDB_TRIM = r"regexp_replace({col}, '^\s+|\s+$', '', 'g')"


def think_strip(col: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(col, THINK_RE, ""), TRIM_RE, "")


def duckdb_think_strip(col_sql: str) -> str:
    inner = DUCKDB_THINK.format(col=col_sql)
    return DUCKDB_TRIM.format(col=inner)
