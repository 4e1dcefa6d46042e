"""Deduplication operators for document corpora.

Five strategies, each with a distinct scale/recall profile:

- :func:`exact_dedup` — hash-groupBy on content; one shuffle, exact.
- :func:`minhash_clusters` — MinHash + LSH banding via ``ml.feature``
  (shingle -> sparse counts -> MinHashLSH approx join); sub-quadratic
  candidate generation, Jaccard-approximate.
- :func:`simhash_pairs` — 64-bit SimHash computed entirely with
  built-in higher-order functions (no Python), banded equi-join + exact
  Hamming filter (``bit_count(a XOR b)``).
- :func:`ngram_jaccard_pairs` — token-n-gram inverted index join +
  exact Jaccard; exact but candidate-bounded by shared-gram blocking.
- :func:`embedding_pairs` — cosine threshold over an embedding column
  (semantic near-dup); pairs via LSH bucketing or brute force.

Pair outputs canonicalize as (id_a < id_b). :func:`connected_components`
turns pairs into cluster ids (min-label propagation, bounded rounds —
each round is one shuffle; near-dup graphs are shallow so few rounds
suffice; falls to deterministic star-collapse if not converged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """One canonical row per duplicate group: min id wins (deterministic,
    unlike dropDuplicates whose survivor is partition-order dependent)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_dups")
    )


# ---------------------------------------------------------------------------
# token shingles (shared by minhash / jaccard)
# ---------------------------------------------------------------------------


def token_ngrams(text_col, n: int = 3):
    """Array of token n-grams via built-ins: split -> transform windows."""
    toks = F.split(text_col, " ")
    if n == 1:
        return toks
    # gram i = toks[i] .. toks[i+n-1]; try_element_at is null past the end
    # (ANSI-safe) and the incomplete tail windows are sliced off anyway
    joined = F.transform(
        toks,
        lambda t, i: F.concat_ws(
            " ", *([t] + [F.try_element_at(toks, i + j + 1) for j in range(1, n)])
        ),
    )
    return F.slice(joined, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))


# ---------------------------------------------------------------------------
# MinHash + LSH (ml.feature composition)
# ---------------------------------------------------------------------------


def minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    jaccard_max_distance: float = 0.6,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, jaccard_distance) via
    MinHashLSH.approxSimilarityJoin on hashed shingle sets."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = df.select(
        F.col(id_col).alias("id"), token_ngrams(F.col(text_col), shingle_n).alias("grams")
    ).filter(F.size("grams") > 0)

    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_max_distance, distCol="jaccard_distance")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jaccard_distance"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash (pure built-ins)
# ---------------------------------------------------------------------------


def simhash_col(text_col, bits: int = 64):
    """64-bit SimHash of the token multiset, all JVM-side:
    per-token xxhash64 -> per-bit +-1 votes -> sign -> packed BIGINT."""
    toks = F.split(text_col, " ")

    # votes[b] = sum over tokens of (bit b of xxhash64(token) ? 1 : -1);
    # bit positions are Python ints (shiftright requires literal numBits)
    def bit_votes(t):
        return F.array(
            *[
                F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for b in range(bits)
            ]
        )

    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(acc, bit_votes(t), lambda a, v: a + v),
    )
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed.bitwiseOR(
            F.when(
                F.element_at(votes, b + 1) > 0,
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    return packed


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band equi-join (any shared 16-bit band)
    -> exact Hamming distance filter. Returns (id_a, id_b, hamming)."""
    band_bits = 64 // n_bands
    sh = df.select(F.col(id_col).alias("id"), simhash_col(F.col(text_col)).alias("sh"))
    banded = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])  # a pair can share several bands
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked by shared grams)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over distinct token n-gram sets. Candidates are
    pairs sharing >=1 gram (inverted-index self-join); exact at corpus
    scale when paired with a doc-frequency cap on blocking grams."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(token_ngrams(F.col(text_col), n))).alias("g"),
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding cosine pairs
# ---------------------------------------------------------------------------


def embedding_pairs(
    df: DataFrame,
    min_cosine: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-dup pairs: cosine >= threshold, id_a < id_b.
    Brute-force scoring (small/medium corpora); at scale swap the
    candidate generator for lsh buckets (operators.similarity)."""
    from ..functions.vectors import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cosine("__a", "__b"))
        .filter(F.col("__cos") >= min_cosine)
        .select("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# pairs -> clusters
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "id",
    max_iter: int = 10,
) -> DataFrame:
    """Min-label propagation over the near-dup graph.

    Returns (id, cluster_id) for every id in ``all_ids`` (singletons map
    to themselves). Each round joins labels across edges and keeps the
    min — one shuffle per round; near-dup components are tiny/shallow,
    so rounds ~ component diameter (bounded by max_iter)."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
    )
    labels = all_ids.select(F.col(id_col).alias("u"), F.col(id_col).alias("cluster_id"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("u", "v2"), edges.v == F.col("v2"))
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        labels = new_labels
        # local mode: cut the growing lineage; on a cluster, checkpointing
        labels = labels.localCheckpoint(eager=False) if hasattr(labels, "localCheckpoint") else labels
    return labels.select(F.col("u").alias(id_col), "cluster_id")
