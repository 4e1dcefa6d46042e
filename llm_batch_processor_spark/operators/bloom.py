"""Bloom-filter pre-join pruning, expressed as JVM expressions.

The canonical 100 TB anti-shuffle trick: before a big⋈small shuffle
join, drop big-side rows whose key *cannot* be in the small side's key
set. False positives flow through to the downstream exact join (the
result is unchanged — which is what keeps the composed query
oracle-checkable); false negatives are impossible.

Spark has a runtime version of this
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, injected for
shuffle joins when side-size thresholds line up). This operator is the
explicit, always-on form for when the pipeline *knows* the small side
is selective — e.g. an incremental-ingest digest probe — and it stays
entirely in whole-stage codegen:

- build: the small side's k seeded ``xxhash64 % m`` bit positions are
  aggregated distributively (``collect_set`` over ≤ m ints, ~8 KB at
  m=65536) and folded into ``m/64`` longs driver-side — one bounded
  job, no data collect;
- probe: the bit array rides the plan as an ``array<long>`` literal
  (broadcast with the task binary) and each big-side row evaluates k
  ``element_at``/``shiftright``/bit-AND expressions — no Python, no
  UDF, vectorized alongside every other predicate in the scan stage.

With |small| keys at a 1% hit rate and k=5, m=16·|small| the false
positive rate is ~1e-3: the shuffle moves ~1/100 of the rows it would
have.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEEDS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # xxhash64 with distinct seeds; pmod keeps positions in [0, m).
    # NOTE xxhash64 is input-TYPE-sensitive: int(5) and bigint(5) hash
    # differently, so build and probe keys must be identically typed or
    # matches are silently dropped (false negatives). bloom_prefilter
    # asserts this; callers composing build/probe manually must match
    # types themselves (cast both sides, e.g. to long).
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)).cast("int")
        for seed in _SEEDS[:k]
    ]


def build_bloom_bits(
    small: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> list[int]:
    """Aggregate the small side's bit positions into ``m_bits/64`` longs.

    The only driver transfer is the distinct position set (≤ m_bits
    ints — bounded by the filter size chosen, NOT by the data).
    """
    rows = (
        small.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for r in rows:
        p = r["p"]
        words[p >> 6] |= 1 << (p & 63)
    # fold unsigned into signed-64 space (Spark longs are signed)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k: int = 5
) -> Column:
    """Predicate: every one of the key's k bit positions is set."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for pos in _positions(key, m_bits, k):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.pmod(pos, F.lit(64))
        cond = cond & (F.getbit(word, bit) == 1)
    return cond


def bloom_prefilter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Return ``big`` filtered to rows whose key might be in ``small``.

    Compose with the exact join afterwards; the composition's result is
    identical to the plain join, only the shuffle volume changes.

    Raises ``TypeError`` when the two key columns' types differ:
    xxhash64 hashes int(5) and bigint(5) to different values, so a type
    mismatch would produce silent false negatives (dropped matches),
    violating the no-false-negative contract.
    """
    big_t = dict(big.dtypes).get(big_key)
    small_t = dict(small.dtypes).get(small_key)
    if big_t != small_t:
        raise TypeError(
            f"bloom_prefilter key types must match exactly (xxhash64 is "
            f"type-sensitive): {big_key}:{big_t} vs {small_key}:{small_t}"
            f" — cast both sides to a common type first"
        )
    words = build_bloom_bits(small, small_key, m_bits, k)
    return big.filter(bloom_might_contain(F.col(big_key), words, m_bits, k))
