#!/usr/bin/env python
"""r10 one-off: stage-level timing of dedup_semantic_pipeline's CC at sf10.

Times pair generation and the full connected-components stage (the r10
min-label CONTRACTION rewrite) separately so the 38x sf10 hotspot
(VERDICT r9 item 1) is fixed by measurement, not guess. The distributed
path is forced (driver_edge_limit=0) — at sf10 the 408M-pair graph is
over the 5M driver limit anyway, but forcing keeps the probe honest if
the fixture shrinks.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from llm_batch_processor_spark.session import get_spark  # noqa: E402
from llm_batch_processor_spark.operators.dedup import (  # noqa: E402
    connected_components,
    embedding_pairs,
)

SF_DIR = os.path.join(REPO, ".scale_probe", "sf10")


def main():
    spark = get_spark(app_name="profile_cc_r10")
    t = time.time()

    def lap(msg):
        nonlocal t
        now = time.time()
        print(f"[{now - t:8.2f}s] {msg}", flush=True)
        t = now

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = embedding_pairs(e, min_cosine=0.4, dim=64)
    pairs = pairs.select("id_a", "id_b").persist()
    n_pairs = pairs.count()
    lap(f"pair generation + persist: {n_pairs} pairs")

    labels = connected_components(
        pairs, None, id_col="vec_id", driver_edge_limit=0
    )
    n_clusters = labels.select("cluster_id").distinct().count()
    lap(f"connected_components (contraction): {n_clusters} clusters")

    n_labeled = labels.count()
    lap(f"labels materialized: {n_labeled} endpoint rows")
    spark.stop()


if __name__ == "__main__":
    main()
