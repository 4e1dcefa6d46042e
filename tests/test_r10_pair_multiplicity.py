"""r10 optimization pins: the exact-Jaccard kernel's pair rows carry
both endpoints' collapse multiplicities (m_a, m_b), so graph consumers
(collapsed_degree_nodes, graph_triangles) read them off the edge
instead of re-joining the survivors frame — guide §2.4 (remove joins/
shuffles outright). These tests pin that the carried values equal the
survivors' m on both strategy paths, and that the join-free degree
construction is value-identical to the legacy join path."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_batch_processor_spark.operators.dedup import (
    collapsed_degree_nodes,
    ngram_jaccard_pairs_collapsed,
)

# a material byte-identical clique (collapse gate fires: C(4,2)=6 extra
# pairs > 1.0 x 7 rows is false... use 6 copies: C(6,2)=15 > 9 rows) plus
# near-dup and unrelated filler
CLIQUE = "the quick brown fox jumps over the lazy dog again and again"
DOCS = (
    [(i, CLIQUE) for i in range(6)]
    + [
        (6, "the quick brown fox jumps over the lazy cat again and again"),
        (7, "spark shuffles partitions across executors with adaptive query"),
        (8, "completely different content about embeddings and vectors"),
    ]
)


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _surv_m(surv):
    return {r["id"]: r["m"] for r in surv.collect()}


def test_pairs_carry_multiplicities_dense_path(spark):
    # tiny vocab -> dense/blocked kernel; the 6-copy clique makes the
    # collapse material, so reps carry m > 1
    rep_pairs, _members, surv, collapsed = ngram_jaccard_pairs_collapsed(
        _docs(spark), n=2, min_jaccard=0.2
    )
    assert collapsed is True
    assert {"m_a", "m_b"}.issubset(set(rep_pairs.columns))
    m_of = _surv_m(surv)
    rows = rep_pairs.collect()
    assert rows, "fixture must produce at least one rep pair"
    for r in rows:
        assert r["m_a"] == m_of[r["id_a"]], r
        assert r["m_b"] == m_of[r["id_b"]], r
    assert any(r["m_a"] == 6 or r["m_b"] == 6 for r in rows)


def test_pairs_carry_multiplicities_posting_path(spark):
    # dense_vocab_limit=0 with sparse postings (avg df <= 8 on this
    # fixture) routes to the AllPairs prefix-filter branch
    rep_pairs, _members, surv, _collapsed = ngram_jaccard_pairs_collapsed(
        _docs(spark), n=2, min_jaccard=0.2, dense_vocab_limit=0
    )
    m_of = _surv_m(surv)
    rows = rep_pairs.collect()
    assert rows, "fixture must produce at least one rep pair"
    for r in rows:
        assert r["m_a"] == m_of[r["id_a"]], r
        assert r["m_b"] == m_of[r["id_b"]], r


def test_degree_nodes_carried_equals_legacy_join(spark):
    """The join-free degree construction (multiplicities off the edge)
    must be value-identical to the legacy surv_m join, on both
    persist_adj paths."""
    rep_pairs, _members, surv, _collapsed = ngram_jaccard_pairs_collapsed(
        _docs(spark), n=2, min_jaccard=0.2
    )
    rep_pairs = rep_pairs.persist()
    try:
        legacy_pairs = rep_pairs.select("id_a", "id_b", "jaccard")

        def nodes_set(pairs, persist_adj):
            adj, nodes = collapsed_degree_nodes(pairs, surv, persist_adj)
            got = {
                (r["g"], r["m"], r["deg"]) for r in nodes.collect()
            }
            if persist_adj:
                adj.unpersist()
            return got

        for persist_adj in (False, True):
            carried = nodes_set(rep_pairs, persist_adj)
            legacy = nodes_set(legacy_pairs, persist_adj)
            assert carried == legacy
            assert carried  # non-degenerate fixture
            # the clique rep (id 0, m=6) has deg = (6-1) + sum(m_h)
            m6 = [t for t in carried if t[1] == 6]
            assert m6 and all(t[2] >= 5 for t in m6)
    finally:
        rep_pairs.unpersist()


def test_ivf_query_pred_equals_post_filter(spark):
    """ivf_topk(query_pred=...) must return exactly the post-filtered
    result of the unrestricted call (per-query top-k independence)."""
    import numpy as np

    from llm_batch_processor_spark.operators.similarity import ivf_topk
    from llm_batch_processor_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    rng = np.random.RandomState(7)
    cents = rng.normal(size=(4, 64))
    full = {
        tuple(r)
        for r in ivf_topk(e, k=3, n_probe=2, dim=64, centroids=cents)
        .filter(F.col("query_id") < 10)
        .collect()
    }
    pushed = {
        tuple(r)
        for r in ivf_topk(
            e,
            k=3,
            n_probe=2,
            dim=64,
            centroids=cents,
            query_pred=F.col("vec_id") < 10,
        ).collect()
    }
    assert pushed == full
    assert pushed  # sf0.001 has >= 10 embeddable vectors
