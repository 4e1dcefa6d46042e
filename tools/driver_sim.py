#!/usr/bin/env python
"""Hostile driver simulation: run the full contract on a STOCK session.

The correctness driver owns its SparkSession (stock confs, possibly a
non-UTC timezone); the engine's `ensure_session_conf` self-healing must
make every query correct and fast on it. This tool reproduces that
environment — vanilla local session, America/New_York TZ — and runs
`entry()` plus every `queries()` entry end-to-end, reporting failures
and the slowest queries (cold-start included, like the driver sees).

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--slow 2.5]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--slow", type=float, default=2.5)
    ap.add_argument(
        "--first",
        type=int,
        default=0,
        help="window simulation: run only the first N queries in driver "
        "order (the driver records 50 rows/round) and print every "
        "per-query cold time, not just the slow ones",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    import __spark_entry__ as E

    n_entry = len(E.entry(spark).collect())
    print(f"entry(): {n_entry} rows")

    qs = E.queries()
    if args.first:
        qs = dict(list(qs.items())[: args.first])
    t0 = time.time()
    failures: list[tuple[str, str]] = []
    slow: list[tuple[str, float]] = []
    times: list[tuple[str, float]] = []
    for name, fn in qs.items():
        t1 = time.time()
        # same cross-query leaked-block cleanup as bench.py/selfcheck.py
        spark.catalog.clearCache()
        gc.collect()
        try:
            fn(spark, args.sf).count()
        except Exception as exc:  # noqa: BLE001 - report, don't abort
            failures.append((name, str(exc)[:160]))
            continue
        dt = time.time() - t1
        times.append((name, round(dt, 2)))
        if dt > args.slow:
            slow.append((name, round(dt, 1)))
    total = time.time() - t0
    print(f"ran {len(qs)} queries in {total:.0f}s on a stock session")
    print(f"slow (>{args.slow}s): {slow}")
    if args.first:
        for name, dt in times:
            print(f"  {dt:6.2f}  {name}")
    if failures:
        print("FAILURES:")
        for name, msg in failures:
            print(f"  {name}: {msg}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
