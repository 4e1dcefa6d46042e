"""Vector math over ``array<float>`` columns — pure built-in higher-order
functions (zip_with / aggregate), JVM-side, no Python in the loop.

Accumulation is an ordered left fold in float64, which keeps results
deterministic across partitionings (same fold order per row) — required
for oracle-stable similarity rankings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(norm_sq(a))


def embeddable(a: str | Column) -> Column:
    """True when the vector has a usable direction: non-null, all-finite,
    norm > 0. Cosine is undefined otherwise, and under ANSI the JVM-side
    ``dot/(norm*norm)`` would raise DIVIDE_BY_ZERO on a zero vector
    (non-finite-sweep contract, shared by every similarity kernel).

    One fold decides all cases: a NaN/Inf element makes the squared-norm
    fold NaN/Inf, and Spark orders NaN above +Inf, so
    ``(s > 0) AND (s < Inf)`` excludes zero, Inf and NaN vectors in a
    single codegen predicate; a NULL element nulls the fold and the
    filter drops it."""
    a = F.col(a) if isinstance(a, str) else a
    s = norm_sq(a)
    return a.isNotNull() & (s > F.lit(0.0)) & (s < F.lit(float("inf")))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
