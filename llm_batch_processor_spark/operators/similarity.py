"""Similarity search over an embedding column (``array<float>``).

Two strategies, per the scale playbook:

- :func:`brute_force_topk` — exact cosine top-k. The query side is
  broadcast (bounded: a top-k request is small by definition), so the
  big side streams once with no shuffle; ranking shuffles only
  (n_queries x n_vectors) scored rows pre-filtered to candidates.
  This is the 100 TB baseline when the query set is small.

- :func:`lsh_bucket_topk` — approximate: random-hyperplane (SimHash
  for vectors) bucketing with deterministic planes (seeded numpy,
  broadcast as literals), then exact rerank *within* buckets.
  Collisions drop recall, never precision. The bucket join is an
  equi-join on the signature — shuffle is proportional to bucket
  sizes, not n². ``n_planes`` trades recall for bucket size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, dot, norm


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k. Returns (query_id, neighbor_id, rank).

    ``queries`` needs (query_id, vec_col). Self-matches (same id) are
    excluded. Rank ties break on neighbor_id ascending (deterministic).
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    ).withColumn("__vnorm", norm("__v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__q")
    ).withColumn("__qnorm", norm("__q"))

    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__sim", dot("__v", "__q") / (F.col("__vnorm") * F.col("__qnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(float).tolist()


def signature_col(vec_col: str, planes: list[list[float]]):
    """Bit-packed hyperplane signature as a BIGINT column (JVM-side)."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucket_topk(
    vectors: DataFrame,
    k: int,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs approximate top-k: candidates share an LSH bucket,
    exact cosine rerank inside the bucket. Returns
    (query_id, neighbor_id, rank)."""
    planes = _planes(n_planes, dim, seed)
    sig = vectors.select(
        F.col(id_col), F.col(vec_col), signature_col(vec_col, planes).alias("__bucket")
    )
    a = sig.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.col("__bucket"),
    )
    b = sig.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        F.col("__bucket"),
    )
    cand = a.join(b, "__bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn("__sim", cosine("__q", "__v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
