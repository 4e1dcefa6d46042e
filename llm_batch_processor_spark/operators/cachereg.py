"""Registry of per-call persisted frames + an explicit release hook.

Kernels and query builders persist bounded intermediates (hashed gram
sets, LSH/IVF signatures, per-customer rollups) that stay referenced by
the RETURNED lazy plan, so the operator that created the cache entry
cannot unpersist it before the caller materializes the result — release
belongs to whoever owns the query lifecycle (r11, VERDICT r10 item 7:
the entries otherwise live until session teardown, bounded only by LRU
eviction). Every such persist is routed through :func:`register`;
:func:`release_kernel_caches` unpersists everything registered so far.

The shared-session harness loops (bench.py, tools/driver_sim.py,
tools/selfcheck.py) already call ``spark.catalog.clearCache()`` between
queries — a superset of this release — so the registry's value is for
LONG-LIVED sessions embedding these operators directly: call
``release_kernel_caches()`` at each query boundary (after the action
completes) and the block-manager entry count stays flat across queries
instead of growing once per kernel call. Releasing BEFORE the returned
plan has run is safe for correctness (Spark recomputes) but forfeits
the cache the kernel relies on — the same reason the operators cannot
do it themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Note ``df`` (already persisted) for a later explicit release."""
    _LIVE.append(df)
    return df


def release_kernel_caches() -> int:
    """Unpersist every registered frame; returns how many were released.

    Call at query boundaries only — after the consuming action has
    completed — never between a kernel call and its materialization.
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 - a dead session is not an error
            pass
    return n
