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

:func:`global_cumsum_multi` (r10) runs k running totals over the SAME
order in ONE bin pass — one Exchange, one window computing k sums, one
bounded offsets broadcast — instead of k chained single-value passes
(guide §2.4: remove shuffles outright). Callers that already hold the
order column's min/max (e.g. from their own stats probe, or because
they chain several cumsums over one frame) pass ``bounds=(lo, hi)``
and skip the probe job entirely.
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
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the global
    ``order_col`` order (inclusive of the current row).

    ``order_col`` must be numeric, non-NULL and, together with
    ``tiebreak_col`` (if given), totally order the rows — otherwise the
    running sum is not well-defined in either engine. NULL order keys
    raise ``ValueError`` (they don't total-order; silently dropping
    them — the old behavior of the bin join — is worse).

    ``bounds=(lo, hi)``: the order column's min/max, when the caller
    already computed them — skips the probe job. The caller then also
    vouches that ``order_col`` has no NULLs (the probe's NULL check is
    skipped with it); every current caller's order key is an aggregate
    output that is non-NULL by construction.
    """
    return global_cumsum_multi(
        df,
        order_col,
        {out_col: value_col},
        n_bins=n_bins,
        tiebreak_col=tiebreak_col,
        bounds=bounds,
    )


def global_cumsum_multi(
    df: DataFrame,
    order_col: str,
    values: dict[str, str],
    n_bins: int = 32,
    tiebreak_col: str | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """k running totals over one global order in a single bin pass.

    ``values`` maps output column -> value column. All k sums ride the
    same local window and the same ``n_bins``-row offsets broadcast, so
    the data is shuffled once no matter how many running totals the
    caller needs. Contract (non-NULL total order, ``bounds`` semantics)
    as in :func:`global_cumsum`.
    """
    # each sum's result type (e.g. bigint for ints, the widened decimal
    # for decimals) — both return paths must agree on it
    sum_types = {
        out: df.select(F.sum(vc)).schema[0].dataType
        for out, vc in values.items()
    }
    if bounds is None:
        probe = df.agg(
            F.min(order_col).alias("lo"),
            F.max(order_col).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.count(order_col).alias("n_ordered"),
        ).collect()[0]
        if probe["n"] > probe["n_ordered"]:
            raise ValueError(
                f"global_cumsum: {probe['n'] - probe['n_ordered']} rows "
                f"have NULL {order_col!r}; a NULL order key cannot totally "
                "order the rows — filter or coalesce them first"
            )
        if probe["lo"] is None:  # empty input
            out = df
            for out_col, t in sum_types.items():
                out = out.withColumn(out_col, F.lit(None).cast(t))
            return out
        lo, hi = float(probe["lo"]), float(probe["hi"])
    else:
        lo, hi = float(bounds[0]), float(bounds[1])
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
    local = binned.select(
        "*",
        *[
            F.sum(vc).over(w_local).alias(f"__l_{out}")
            for out, vc in values.items()
        ],
    )
    # bounded: one row per bin; the running offset for bin b is the sum
    # of all earlier bins' totals. Derives from `binned` (pre-window),
    # so the partial agg combines map-side before its Exchange.
    totals = binned.groupBy("__bin").agg(
        *[F.sum(vc).alias(f"__t_{out}") for out, vc in values.items()]
    )
    w_off = (
        Window.orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__bin",
        *[
            (F.sum(f"__t_{out}").over(w_off) - F.col(f"__t_{out}")).alias(
                f"__o_{out}"
            )
            for out in values
        ],
    )
    out = local.join(F.broadcast(offsets), "__bin")
    for out_col in values:
        out = out.withColumn(
            out_col, F.col(f"__l_{out_col}") + F.col(f"__o_{out_col}")
        )
    return out.drop(
        "__bin",
        *[f"__l_{o}" for o in values],
        *[f"__o_{o}" for o in values],
    )
