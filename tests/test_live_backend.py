"""Tier-4 live-endpoint integration tests, skip-if-unavailable.

Mirrors the reference's live-model tier (spec/spec_helper.rb:9-25 —
endpoint from LLM_API_ENDPOINT; spec/integration_spec.rb:49-100 —
non-empty semantic responses per record, distinct outputs for distinct
inputs; spec/reasoning_integration_spec.rb — think-tags stripped from
the final output). Everything here runs against a REAL OpenAI-compatible
endpoint and is skipped cleanly when none is configured or reachable —
exactly the reference's ``skip "qwen3-0.6b not available"`` behavior.

Enable with:
    LLM_API_ENDPOINT=http://localhost:8080 [LLM_MODEL=qwen3-0.6b] pytest tests/test_live_backend.py
"""

from __future__ import annotations

import os

import pytest

ENDPOINT = os.environ.get("LLM_API_ENDPOINT")
MODEL = os.environ.get("LLM_MODEL", "qwen3-0.6b")

pytestmark = pytest.mark.skipif(
    not ENDPOINT, reason="LLM_API_ENDPOINT not set (live tier runs only with a real backend)"
)


@pytest.fixture(scope="module")
def live_backend():
    """Probe the endpoint once; skip the module if it is unreachable
    (reference pattern: rescue -> skip, spec/integration_spec.rb:66-68)."""
    from llm_batch_processor_spark.job.backend import OpenAIChatBackend

    backend = OpenAIChatBackend(ENDPOINT)
    try:
        backend.chat(
            [{"role": "user", "content": "ping"}], MODEL, {"max_tokens": 4}, None, 20.0
        )
    except Exception as e:  # noqa: BLE001 — any transport/HTTP error means "not available"
        pytest.skip(f"live backend not available at {ENDPOINT}: {e}")
    return backend


def _spec(**over):
    from llm_batch_processor_spark.job.spec import JobSpec

    base = dict(
        id="live-summary",
        erb_source="Summarize in one short sentence: {{ texts['content'] }}",
        backend_endpoint=ENDPOINT,
        model=MODEL,
        output_label="summary",
        params={"temperature": 0.0, "max_tokens": 150},
    )
    base.update(over)
    return JobSpec.from_dict(base)


def test_live_llm_map_enriches_each_record(spark, live_backend):
    from llm_batch_processor_spark.job.pipeline import RECORD_SCHEMA, llm_map

    rows = [
        ("live-1", {"content": "Ruby is a dynamic programming language with simple, readable syntax."}, []),
        ("live-2", {"content": "Testing is essential for software quality assurance."}, []),
    ]
    records = spark.createDataFrame(rows, RECORD_SCHEMA)
    res = llm_map(records, _spec(), live_backend)
    out = {r["id"]: r["texts"] for r in res.ok().collect()}
    assert set(out) == {"live-1", "live-2"}
    for rid, texts in out.items():
        # enrich contract: input keys preserved + the new summary key
        assert "content" in texts and "summary" in texts, rid
        # semantic floor: a real model returns a non-empty summary
        assert texts["summary"].strip()
        # A9: no reasoning tags survive into the output
        assert "<think>" not in texts["summary"]
    # distinct inputs produce distinct outputs (integration_spec.rb:84-94)
    assert out["live-1"]["summary"] != out["live-2"]["summary"]


def test_live_counting_answer_contains_expected_number(spark, live_backend):
    # reference asserts the live answer contains 5|五
    # (spec/reasoning_integration_spec.rb:67)
    from llm_batch_processor_spark.job.pipeline import RECORD_SCHEMA, llm_map

    rows = [("count-1", {"content": "apple, banana, cherry, date, elderberry"}, [])]
    records = spark.createDataFrame(rows, RECORD_SCHEMA)
    spec = _spec(
        erb_source="How many items are in this list? Answer with just the number: {{ texts['content'] }}",
        output_label="answer",
        params={"temperature": 0.0, "max_tokens": 500},
    )
    res = llm_map(records, spec, live_backend)
    out = res.ok().collect()
    assert len(out) == 1
    assert any(tok in out[0]["texts"]["answer"] for tok in ("5", "五"))
