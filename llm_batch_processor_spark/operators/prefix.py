"""Distributed global prefix sum (running total over a global order).

Spark's window functions need a ``partitionBy`` to parallelize; a
running total over a GLOBAL order (``Window.orderBy(...)`` with no
partitioning) collapses into a single task holding the whole dataset —
the classic scale-killer hiding in "cumulative sum" requirements
(output sharding, curriculum token budgeting, cumulative coverage).

:func:`global_cumsum` is the two-phase textbook fix:

1. bin rows by deterministic ranges of the order column (bounds from a
   one-row min/max aggregate — no sampling, so lineage re-execution
   cannot move a row between bins);
2. local cumsum per bin (parallel window, one hash Exchange on the bin
   id);
3. per-bin totals (bounded: ``n_bins`` rows) get a running offset via
   a window over that tiny set, broadcast-joined back.

Every row is shuffled once; the only serialized step is the
``n_bins``-row offset scan. Equal-width binning assumes the order key
is roughly range-uniform (true for dense ids); for skewed keys pass a
higher ``n_bins`` — correctness never depends on bin balance, only
parallelism does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    n_bins: int = 32,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the global
    ``order_col`` order (inclusive of the current row).

    ``order_col`` must be numeric, non-NULL and, together with
    ``tiebreak_col`` (if given), totally order the rows — otherwise the
    running sum is not well-defined in either engine. NULL order keys
    raise ``ValueError`` (they don't total-order; silently dropping
    them — the old behavior of the bin join — is worse).
    """
    # sum's result type (e.g. bigint for ints, the widened decimal for
    # decimals) — both return paths must agree on it
    sum_type = df.select(F.sum(value_col)).schema[0].dataType
    bounds = df.agg(
        F.min(order_col).alias("lo"),
        F.max(order_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count(order_col).alias("n_ordered"),
    ).collect()[0]
    if bounds["n"] > bounds["n_ordered"]:
        raise ValueError(
            f"global_cumsum: {bounds['n'] - bounds['n_ordered']} rows "
            f"have NULL {order_col!r}; a NULL order key cannot totally "
            "order the rows — filter or coalesce them first"
        )
    if bounds["lo"] is None:  # empty input
        return df.withColumn(out_col, F.lit(None).cast(sum_type))
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    width = max((hi - lo + 1.0) / n_bins, 1e-300)
    binned = df.withColumn(
        "__bin",
        F.least(
            F.floor((F.col(order_col) - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w_local = (
        Window.partitionBy("__bin")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = binned.withColumn("__local", F.sum(value_col).over(w_local))
    # bounded: one row per bin; the running offset for bin b is the sum
    # of all earlier bins' totals. Derives from `binned` (pre-window),
    # so the partial agg combines map-side before its Exchange.
    totals = binned.groupBy("__bin").agg(F.sum(value_col).alias("__tot"))
    w_off = (
        Window.orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__bin", (F.sum("__tot").over(w_off) - F.col("__tot")).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__bin")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__bin", "__local", "__off")
    )
