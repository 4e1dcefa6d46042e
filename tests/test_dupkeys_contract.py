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
