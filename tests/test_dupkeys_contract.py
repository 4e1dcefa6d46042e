"""Round-6 duplicate-key sweep pins: the key-contract validator and
the five queries made duplicate-id-proof (per-record enrichment, the
oracle-side physical-row join / total tie orders)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_batch_processor_spark.operators.contracts import (
    KeyContractError,
    require_unique,
    unique_key_violations,
)


def test_unique_key_violations_empty_on_unique(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id LONG, v STRING")
    assert unique_key_violations(df, ["id"]).count() == 0
    # pass-through: require_unique returns the SAME frame untouched
    assert require_unique(df, ["id"]) is df


def test_unique_key_violations_reports_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "id LONG, v STRING",
    )
    got = {(r["id"], r["n_rows"]) for r in unique_key_violations(df, ["id"]).collect()}
    assert got == {(2, 2), (3, 3)}
    with pytest.raises(KeyContractError, match="duplicate key"):
        require_unique(df, ["id"])


def test_truncation_marker_tracks_sample_rows(spark):
    """ADVICE r6: the ' ...' marker must compare against the CALLER's
    sample_rows, not a hardcoded 20 — a sample_rows=2 run with 3
    violating keys is truncated and must say so."""
    df = spark.createDataFrame(
        [(i, c) for i in (1, 2, 3) for c in ("a", "b")], "id LONG, v STRING"
    )
    with pytest.raises(KeyContractError) as exc2:
        require_unique(df, ["id"], sample_rows=2)
    assert str(exc2.value).endswith("...")
    with pytest.raises(KeyContractError) as exc_all:
        require_unique(df, ["id"], sample_rows=10)
    assert not str(exc_all.value).endswith("...")


def test_unique_key_violations_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (1, "x", 3.0)],
        "id LONG, k STRING, v DOUBLE",
    )
    got = unique_key_violations(df, ["id", "k"]).collect()
    assert len(got) == 1 and got[0]["id"] == 1 and got[0]["k"] == "x"


def _dup_docs(spark):
    """5 docs, ids 0-4, then id 2 REUSED for a different text — the
    re-crawl collision the dupkeys sweep models."""
    rows = [
        (0, "alpha beta gamma delta", "en", "src0"),
        (1, "epsilon zeta eta theta", "en", "src1"),
        (2, "iota kappa lambda mu", "fr", "src0"),
        (3, "nu xi omicron pi", "en", "src1"),
        (4, "rho sigma tau upsilon", "de", "src0"),
        (2, "phi chi psi omega", "en", "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING, source STRING")


GATED_DOC_QUERIES = [
    "dedup_ngram_jaccard", "dedup_clusters", "degree_distribution",
    "graph_pagerank", "graph_triangles", "dedup_minhash", "dedup_simhash",
]
GATED_VEC_QUERIES = [
    "knn_classify", "embedding_pq_assign", "sim_ann_lsh", "sim_ann_ivf",
    "sim_ann_lsh_exact", "sim_ann_ivf_exact",
]


def _write_corpus(spark, tmp_path, dup_docs=False, dup_vecs=False) -> str:
    """Tiny documents + embeddings tables; optionally with one
    colliding primary key each (the re-crawl shape)."""
    sf = str(tmp_path / ("dup" if dup_docs or dup_vecs else "uniq"))
    doc_rows = [
        (i, f"alpha beta gamma token{i} delta epsilon", "en", "s0", 30)
        for i in range(8)
    ]
    if dup_docs:
        doc_rows.append((3, "a completely different payload text", "fr", "s1", 20))
    spark.createDataFrame(
        doc_rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
    ).coalesce(1).write.parquet(sf + "/documents.parquet")
    vec_rows = [
        (i, [float((i * 7 + j) % 5) + 0.25 for j in range(64)], "L%d" % (i % 2))
        for i in range(60)
    ]
    if dup_vecs:
        vec_rows.append((7, [0.5] * 64, "L1"))
    spark.createDataFrame(
        vec_rows, "vec_id LONG, embedding ARRAY<FLOAT>, label STRING"
    ).coalesce(1).write.parquet(sf + "/embeddings.parquet")
    return sf


@pytest.mark.parametrize("qname", GATED_DOC_QUERIES)
def test_keyed_entity_queries_fail_typed_on_dup_doc_ids(spark, tmp_path, qname):
    """VERDICT r7 item 2: the keyed-entity family must be
    self-defending — a duplicate doc_id raises KeyContractError at
    query entry instead of producing an underdetermined answer."""
    from llm_batch_processor_spark.queries import all_queries

    sf = _write_corpus(spark, tmp_path, dup_docs=True)
    with pytest.raises(KeyContractError, match=r"doc_id.*\(3\) x2"):
        all_queries()[qname].fn(spark, sf)


@pytest.mark.parametrize("qname", GATED_VEC_QUERIES)
def test_keyed_entity_queries_fail_typed_on_dup_vec_ids(spark, tmp_path, qname):
    from llm_batch_processor_spark.queries import all_queries

    sf = _write_corpus(spark, tmp_path, dup_vecs=True)
    with pytest.raises(KeyContractError, match=r"vec_id.*\(7\) x2"):
        all_queries()[qname].fn(spark, sf)


def test_gated_queries_pass_through_on_unique_keys(spark, tmp_path):
    """The gate must be invisible on contract-clean data: every gated
    query still plans and executes (one representative per key kind
    executed fully; the rest plan without raising)."""
    from llm_batch_processor_spark.queries import all_queries

    sf = _write_corpus(spark, tmp_path)
    qs = all_queries()
    # full execution for the two cheapest representatives
    assert qs["dedup_ngram_jaccard"].fn(spark, sf).count() >= 0
    assert qs["knn_classify"].fn(spark, sf).count() >= 0
    # the expensive ones only need to clear the eager entry gate
    for qname in ("graph_pagerank", "graph_triangles", "sim_ann_ivf"):
        qs[qname].fn(spark, sf)


def test_gate_revalidates_after_inplace_rewrite(spark, tmp_path):
    """VERDICT r8 item 6: the key-contract memo token carries a
    snapshot fingerprint (file count + max mtime + bytes), so
    rewriting the table files under an ALREADY-VALIDATED path within
    one session re-validates instead of silently reusing the stale
    pass — the notebook re-ingest shape the r8 adjudication flagged."""
    from llm_batch_processor_spark.queries import all_queries

    sf = _write_corpus(spark, tmp_path)  # unique keys: gate passes
    qs = all_queries()
    assert qs["dedup_ngram_jaccard"].fn(spark, sf).count() >= 0
    # sanity: a second call on the untouched snapshot is memo-served
    # (same token) and must still succeed
    qs["dedup_ngram_jaccard"].fn(spark, sf)

    # in-place re-ingest: same path, now with a colliding doc_id
    doc_rows = [
        (i, f"alpha beta gamma token{i} delta epsilon", "en", "s0", 30)
        for i in range(8)
    ] + [(3, "a completely different payload text", "fr", "s1", 20)]
    spark.createDataFrame(
        doc_rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
    ).coalesce(1).write.mode("overwrite").parquet(sf + "/documents.parquet")

    with pytest.raises(KeyContractError, match=r"doc_id.*\(3\) x2"):
        qs["dedup_ngram_jaccard"].fn(spark, sf)


def test_snapshot_fingerprint_moves_on_rewrite(tmp_path):
    """Unit pin for the fingerprint itself: file rewrite with the same
    byte count still changes the token (mtime_ns moves)."""
    from llm_batch_processor_spark.queries.pipeline_ext import (
        _snapshot_fingerprint,
    )

    p = tmp_path / "t.parquet"
    p.write_bytes(b"abcd")
    fp1 = _snapshot_fingerprint(str(p))
    import os
    import time

    time.sleep(0.01)
    p.write_bytes(b"efgh")  # same size, new content
    assert _snapshot_fingerprint(str(p)) != fp1
    # directory form: adding a part file changes the token
    d = tmp_path / "dir.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"x" * 10)
    fpd = _snapshot_fingerprint(str(d))
    (d / "part-1").write_bytes(b"y" * 10)
    assert _snapshot_fingerprint(str(d)) != fpd
    assert os.path.isdir(str(d))


def test_enrich_is_per_record_not_join(spark, tmp_path):
    """enrich_label / sink_jsonl semantics: one output row per INPUT
    row even when ids collide (reference A10: JSONL items are
    independent lines; the old join-by-id shortcut fanned 2x2)."""
    d = _dup_docs(spark).withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "sf")
    d.coalesce(1).write.parquet(sf + "/documents.parquet")

    from llm_batch_processor_spark.queries.llm import enrich_label

    out = enrich_label(spark, sf).collect()
    assert len(out) == 6  # not 8 (the 2x2 fan-out)
    by_content = {r["content"]: r["label"] for r in out}
    # each record carries ITS OWN lang, not an arbitrary same-id row's
    assert by_content["iota kappa lambda mu"] == "FR"
    assert by_content["phi chi psi omega"] == "EN"
