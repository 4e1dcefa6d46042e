"""As-of join: for each left row, the latest right row at-or-before the
left row's time, matched on an equi key.

Spark SQL has no native ASOF JOIN (DuckDB does), so this is the standard
window rewrite: equi-join on the key with a time inequality, then keep
``row_number() = 1`` per left row ordered by right-time descending.

Scale posture: the equi key keeps this a hash/sort-merge join (never a
broadcast-nested-loop); the window partitions by the left row's unique
key so state per partition is the candidate set of one left row. For a
severely skewed key (one user with millions of events), AQE skew-join
splits the join side; the window stays bounded because candidates are
per-left-row. A per-key pre-aggregation (max right_time <= left_time)
is not possible generically without a second join, and Catalyst's
first-stage partial aggregation covers the common case anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    left_key: str,
    right_tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """Return left ⟕-asof right: one row per matched left row.

    ``left_key`` must uniquely identify left rows (window partition key).
    ``right_tiebreak`` breaks right-side time ties deterministically.
    ``direction='backward'`` keeps right_time <= left_time (latest wins);
    ``'forward'`` keeps right_time >= left_time (earliest wins).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    if direction == "backward":
        time_cond = F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")
        order = [F.col(f"r.{right_time}").desc(), F.col(f"r.{right_tiebreak}").desc()]
    else:
        time_cond = F.col(f"r.{right_time}") >= F.col(f"l.{left_time}")
        order = [F.col(f"r.{right_time}").asc(), F.col(f"r.{right_tiebreak}").asc()]

    j = left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{left_on}") == F.col(f"r.{right_on}")) & time_cond,
        "inner",
    )
    w = Window.partitionBy(F.col(f"l.{left_key}")).orderBy(*order)
    return j.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    left_key: str,
    right_tiebreak: str,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')`` semantics): for each left row the right row with the
    smallest |Δt|, ties resolved toward the backward (at-or-before) match.

    Composed from one backward and one forward pass joined back on the
    left key, choosing by day-time-interval comparison — no epoch
    conversion, so the result is timezone-free for TIMESTAMP_NTZ inputs.
    Each pass is the standard windowed as-of rewrite; the compose adds
    two key-partitioned left joins whose build sides are one row per
    left key (never wider than the left relation).
    """
    cols_b = [
        F.col(f"l.{left_key}").alias("__k"),
        F.col(f"r.{right_time}").alias("__tb"),
        F.col(f"r.{right_tiebreak}").alias("__ib"),
    ]
    cols_f = [
        F.col(f"l.{left_key}").alias("__k"),
        F.col(f"r.{right_time}").alias("__tf"),
        F.col(f"r.{right_tiebreak}").alias("__if"),
    ]
    back = asof_join(
        left, right, left_on, right_on, left_time, right_time, left_key,
        right_tiebreak, direction="backward",
    ).select(*cols_b)
    fwd = asof_join(
        left, right, left_on, right_on, left_time, right_time, left_key,
        right_tiebreak, direction="forward",
    ).select(*cols_f)
    lt = F.col(left_time)
    pick_b = F.col("__if").isNull() | (
        F.col("__ib").isNotNull() & ((lt - F.col("__tb")) <= (F.col("__tf") - lt))
    )
    return (
        left.join(back, left[left_key] == back["__k"], "left")
        .drop("__k")
        .join(fwd, left[left_key] == fwd["__k"], "left")
        .drop("__k")
        .filter(F.col("__ib").isNotNull() | F.col("__if").isNotNull())
        .withColumn(
            "__nearest", F.when(pick_b, F.col("__ib")).otherwise(F.col("__if"))
        )
        .withColumn(
            "__direction", F.when(pick_b, F.lit("backward")).otherwise(F.lit("forward"))
        )
        .drop("__tb", "__tf", "__ib", "__if")
    )
