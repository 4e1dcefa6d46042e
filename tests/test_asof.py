"""Unit tests for the as-of join operator (window rewrite)."""

from __future__ import annotations

from llm_batch_processor_spark.operators.asof import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 20, 150), (4, 30, 100)],
        "lid INT, key INT, t INT",
    )
    right = spark.createDataFrame(
        [(101, 10, 100), (102, 10, 200), (103, 10, 300), (104, 20, 149), (105, 20, 149)],
        "rid INT, key INT, t INT",
    )
    return left, right


def test_backward_latest_at_or_before(spark):
    left, right = _mk(spark)
    res = asof_join(
        left, right, left_on="key", right_on="key",
        left_time="t", right_time="t", left_key="lid", right_tiebreak="rid",
    )
    got = {r["lid"]: r["rid"] for r in res.collect()}
    # lid=1: right t<=100 for key 10 -> rid 101 (exact boundary included)
    # lid=2: t<=205 -> latest is t=200 -> rid 102
    # lid=3: key 20, t<=150 -> tie at t=149 -> higher rid wins (105)
    # lid=4: key 30 has no match -> absent (inner as-of)
    assert got == {1: 101, 2: 102, 3: 105}


def test_forward_earliest_at_or_after(spark):
    left, right = _mk(spark)
    res = asof_join(
        left, right, left_on="key", right_on="key",
        left_time="t", right_time="t", left_key="lid", right_tiebreak="rid",
        direction="forward",
    )
    got = {r["lid"]: r["rid"] for r in res.collect()}
    # lid=3 (key 20, t=150) has no right row at-or-after 150 -> absent
    assert got == {1: 101, 2: 103}
