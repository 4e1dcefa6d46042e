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


def embeddable(a: str | Column, dim: int | None = None) -> Column:
    """True when the vector has a usable direction: non-null, all-finite,
    norm > 0 — and, when ``dim`` is given, exactly that many elements.
    Cosine is undefined otherwise, and under ANSI the JVM-side
    ``dot/(norm*norm)`` would raise DIVIDE_BY_ZERO on a zero vector
    (non-finite-sweep contract, shared by every similarity kernel).

    One fold decides the value cases: a NaN/Inf element makes the
    squared-norm fold NaN/Inf, and Spark orders NaN above +Inf, so
    ``(s > 0) AND (s < Inf)`` excludes zero, Inf and NaN vectors in a
    single codegen predicate; a NULL element nulls the fold and the
    filter drops it.

    ``dim`` is the fixed-dimension contract (ragged-dim-sweep): a
    kernel that indexes ``vec[0..dim-1]``, projects against dim-sized
    planes/codebooks, or batch-stacks vectors in numpy would raise
    INVALID_ARRAY_INDEX / inhomogeneous-shape errors on a wrong-length
    vector — a re-embedding migration artifact, not a rankable row."""
    a = F.col(a) if isinstance(a, str) else a
    s = norm_sq(a)
    ok = a.isNotNull() & (s > F.lit(0.0)) & (s < F.lit(float("inf")))
    if dim is not None:
        ok = ok & (F.size(a) == F.lit(dim))
    return ok


def modal_dim(df, vec_col: str) -> int | None:
    """The most common vector length in ``vec_col`` (count-desc,
    length-asc tie-break — deterministic), or None on an empty/all-NULL
    frame. The inference fallback for kernels whose ``dim`` contract
    wasn't declared by the caller: one size-histogram aggregate that
    map-side-combines to <= n_distinct_dims rows. At 100 TB callers
    should pass the schema-declared dim instead and skip this scan —
    every oracle-twinned query does."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .groupBy(F.size(F.col(vec_col)).alias("__d"))
        .count()
        .orderBy(F.desc("count"), F.asc("__d"))
        .first()
    )
    return int(row["__d"]) if row is not None else None


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
