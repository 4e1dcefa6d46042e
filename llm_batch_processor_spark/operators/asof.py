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
