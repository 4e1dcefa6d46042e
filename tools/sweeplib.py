"""Shared harness for the hostile-input sweeps.

Evaluation contract: every query result is FULLY MATERIALIZED
(``toPandas`` — the same Arrow collect the driver's oracle compare
does), never ``.count()``. Counting lets Catalyst column-prune the
result expressions, which hides crashes that only fire when a column
is actually computed — embedding_silhouette's d2 fold crashed under
collect() while its count() passed (ragged sweep, r5).
"""

from __future__ import annotations

import shutil
import tempfile
import time
from pathlib import Path


def materialize(df) -> int:
    """Force full evaluation of every output column; return row count."""
    return len(df.toPandas())


def run_sweep(build_dataset, only: str | None, sf: str) -> int:
    """Build the hostile dataset, run every (or --only) declared query
    with full materialization, report crashers. Returns exit code."""
    from llm_batch_processor_spark.queries import all_queries
    from llm_batch_processor_spark.session import get_spark

    spark = get_spark()
    tmp = Path(tempfile.mkdtemp(prefix="sweep_"))
    build_dataset(sf, tmp)

    qs = all_queries()
    names = only.split(",") if only else sorted(qs)
    failures: dict[str, str] = {}
    import gc

    for name in names:
        t0 = time.time()
        # same cross-query leaked-block cleanup as bench.py/selfcheck.py
        spark.catalog.clearCache()
        gc.collect()
        try:
            n = materialize(qs[name].fn(spark, str(tmp)))
            print(f"ok    {name}: {n} rows in {time.time()-t0:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep must survive any crash
            msg = " ".join(str(e).split("\n"))[:300]
            failures[name] = msg
            print(f"CRASH {name}: {msg}", flush=True)
    print(f"\n{len(failures)} failures / {len(names)} queries")
    for k, v in failures.items():
        print(f"  {k}: {v}")
    shutil.rmtree(tmp, ignore_errors=True)
    return 1 if failures else 0
