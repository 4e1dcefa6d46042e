"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew by splitting oversized shuffle partitions. These helpers
cover the case AQE can't: a SINGLE join key so hot that one task's
build/probe side exceeds memory no matter how the partition is split —
the classic "null key" / "default user" / boilerplate-document problem
in web-scale corpora.

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets: the join key becomes
(key, salt), so one hot key fans out to R tasks. Exact same join
result; shuffle volume for the small side grows by R.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on one key with salt-scattered hot keys.

    ``big`` rows get a deterministic salt in [0, salt) — a hash of the
    whole row, so it is stable across task retries (``rand()`` is not);
    ``small`` is replicated across every salt value. Result equals the
    unsalted join; each hot key now lands on ``salt`` reducers instead
    of one.

    Use when ONE side is dimension-small but a handful of keys dominate
    the fact side. For two big sides, isolate the hot keys (frequency
    count), join them separately with a broadcast of their dim rows,
    and union with the normal join of the cold keys.

    Only joins that never emit an UNMATCHED small-side row are allowed:
    the small side is replicated ``salt`` times, so right/full outer
    would emit each unmatched small row once per replica — not the
    unsalted result.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "the replicated small side would duplicate unmatched rows under "
            "right/full outer joins"
        )
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(small_rep, [on, "__salt"], how).drop("__salt")


def split_hot_keys(
    big: DataFrame,
    on: str,
    hot_threshold: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Partition ``big`` into (hot rows, cold rows, hot-key table) by
    key frequency. The hot-key table is dimension-sized (few keys by
    construction) and broadcastable; join the two slices with different
    strategies and union the results."""
    freq = big.groupBy(on).agg(F.count("*").alias("__n"))
    hot_keys = freq.filter(F.col("__n") >= hot_threshold).select(on)
    hot = big.join(F.broadcast(hot_keys), on, "left_semi")
    cold = big.join(F.broadcast(hot_keys), on, "left_anti")
    return hot, cold, hot_keys
