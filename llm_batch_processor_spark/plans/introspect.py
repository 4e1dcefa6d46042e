"""Read the physical plan back out of a DataFrame, as data.

Wraps ``queryExecution.explainString`` so tests can make assertions
about HOW a query runs: a filter that doesn't reach the parquet scan or
a dim join that doesn't broadcast is a performance bug even when the
rows come back right.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text (executedPlan, AQE initial)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet PushedFilters entries, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings for every file scan (column-pruning check)."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"ReadSchema: (.+)", formatted_plan(df))
    ]


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the initial plan.
    Broadcast exchanges are excluded — they ship a dim, not the data.
    Formatted plans render operators as ``(N) Exchange`` headers."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def partial_agg_count(df: DataFrame) -> int:
    """Map-side (partial) aggregate functions — evidence of pre-shuffle
    combine (``partial_sum``, ``partial_count``, ... in the plan)."""
    return len(re.findall(r"\bpartial_\w+", formatted_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    """True when ORDER BY + LIMIT fused into TakeOrderedAndProject
    (no global sort — each partition keeps k, driver merges)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def whole_stage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more fused JVM work).
    Formatted plans mark members with ``[codegen id : N]``."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
