#!/usr/bin/env python
"""r10 one-off: measure the CC label-map broadcast gate near its ceiling.

VERDICT r9 item 3: the broadcast gate had never been measured near its
limit. The r10 contraction gates on estimated BYTES
(``_CC_BCAST_ROW_BYTES * n_nodes <= _CC_BCAST_MAX_BYTES``, 256 MB ~ 4M
label rows). This probe synthesizes pair graphs around that ceiling
(2M / 4M / 10M nodes — the last ~2.5x past the gate) and times
``connected_components`` with the gate forced OPEN (broadcast label
joins) vs forced SHUT (shuffle joins), recording round times and
verifying identical labels via a full checksum. Output feeds the
BASELINE.md r10 gate row.

The synthetic graph is a union of K-node chains plus 10%% random extra
edges — chains maximize contraction rounds (worst case for per-round
cost), the extras give realistic degree variance. Deterministic seed.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from llm_batch_processor_spark.session import get_spark  # noqa: E402
from llm_batch_processor_spark.operators import dedup  # noqa: E402


def chain_graph(spark, n_nodes: int, chain_len: int = 16):
    """~n_nodes nodes in chains of chain_len, plus 10% random edges."""
    n_chain_edges = n_nodes - n_nodes // chain_len
    base = spark.range(n_nodes).withColumnRenamed("id", "u")
    chain = (
        base.filter((F.col("u") % chain_len) != chain_len - 1)
        .select(F.col("u").alias("id_a"), (F.col("u") + 1).alias("id_b"))
    )
    extra = (
        spark.range(n_nodes // 10)
        .select(
            (F.xxhash64("id") % n_nodes).alias("id_a"),
            (F.xxhash64("id", F.lit(1)) % n_nodes).alias("id_b"),
        )
        .select(F.abs("id_a").alias("id_a"), F.abs("id_b").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    return chain.union(extra), n_chain_edges


def checksum(labels) -> tuple:
    row = labels.agg(
        F.count("*").alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        F.sum(F.xxhash64("vec_id", "cluster_id")).alias("h"),
    ).collect()[0]
    return (row["n"], row["k"], row["h"])


def main() -> int:
    spark = get_spark(app_name="probe_cc_gate_r10")
    saved = dedup._CC_BCAST_MAX_BYTES
    for n_nodes in (2_000_000, 4_000_000, 10_000_000):
        pairs, _ = chain_graph(spark, n_nodes)
        pairs = pairs.persist()
        n_pairs = pairs.count()
        out = {}
        for mode, gate in (("bcast", 1 << 60), ("shuffle", 0)):
            dedup._CC_BCAST_MAX_BYTES = gate
            t0 = time.time()
            labels = dedup.connected_components(
                pairs.select("id_a", "id_b"),
                None,
                id_col="vec_id",
                driver_edge_limit=0,
            )
            cs = checksum(labels)
            out[mode] = (time.time() - t0, cs)
            print(
                f"n_nodes={n_nodes} mode={mode}: {out[mode][0]:.1f}s "
                f"(n,k,hash)={cs}",
                flush=True,
            )
        dedup._CC_BCAST_MAX_BYTES = saved
        same = out["bcast"][1] == out["shuffle"][1]
        print(
            f"== n_nodes={n_nodes} n_pairs={n_pairs}: bcast "
            f"{out['bcast'][0]:.1f}s vs shuffle {out['shuffle'][0]:.1f}s, "
            f"labels identical={same}",
            flush=True,
        )
        pairs.unpersist()
        if not same:
            return 1
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
