"""Skew utilities + hypothesis property tests for the string kernels.

The property tests pin engine-independent semantics against plain
Python reference implementations over generated inputs — a stronger
contract than fixed goldens for the regex/hash kernels the oracle
exercises only on the fixture corpus.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from llm_batch_processor_spark.operators.skew import salted_join, split_hot_keys


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(k, i) for i in range(50) for k in (["hot"] * 5 + [f"k{i % 7}"])],
        "k STRING, v LONG",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k3", 3.0)], "k STRING, w DOUBLE"
    )
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {tuple(r) for r in salted_join(big, small, "k", salt=8).collect()}
    assert salted == plain


def test_split_hot_keys_partitions_exactly(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [(f"c{i}", i) for i in range(20)],
        "k STRING, v LONG",
    )
    hot, cold, hot_keys = split_hot_keys(big, "k", hot_threshold=50)
    assert hot.count() == 100
    assert cold.count() == 20
    assert [r["k"] for r in hot_keys.collect()] == ["hot"]
    # exact partition: union restores the input multiset
    assert hot.unionAll(cold).count() == big.count()


# --- property tests -------------------------------------------------------

_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00", exclude_categories=("Cs",)
    ),
    max_size=120,
)


def _python_think_strip(s: str) -> str:
    # Ruby String#strip semantics (the reference contract): exactly
    # " \0\t\n\v\f\r" off both ends — NOT Python's unicode str.strip()
    out = re.sub(r"<think>.*?</think>", "", s, flags=re.DOTALL)
    return out.strip(" \0\t\n\x0b\f\r")


@settings(max_examples=30, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_think_strip_matches_python_reference(spark, texts):
    from llm_batch_processor_spark.functions.text import think_strip

    laced = [
        t + "<think>" + t[:10] + "</think>" if i % 2 else t
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame([(s,) for s in laced], "s STRING")
    got = [r["out"] for r in df.select(think_strip(F.col("s")).alias("out")).collect()]
    want = [_python_think_strip(s) for s in laced]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=1, max_size=6
    ),
    st.integers(min_value=1, max_value=3),
)
def test_shingle_hashes_cardinality_matches_string_shingles(spark, texts, n):
    from llm_batch_processor_spark.operators.dedup import shingle_hashes, token_ngrams

    df = spark.createDataFrame([(s,) for s in texts], "s STRING")
    hashed = [
        len(r["h"])
        for r in df.select(shingle_hashes(F.col("s"), n).alias("h")).collect()
    ]
    strings = [
        len(set(r["g"]))
        for r in df.select(token_ngrams(F.col("s"), n).alias("g")).collect()
    ]
    # distinct hashed shingles == distinct string shingles (no collisions
    # at these sizes) — the two formulations define the same sets
    assert hashed == strings


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),
            st.integers(min_value=0, max_value=50_000),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=60, max_value=3600),
)
def test_sessionize_partition_invariants(spark, events, gap):
    """Sessions partition each user's events; intra-session gaps are
    <= gap, consecutive sessions are separated by > gap."""
    from llm_batch_processor_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(
        [(u, i, s) for i, (u, s) in enumerate(events)],
        "user_id STRING, event_id LONG, epoch_s LONG",
    )
    rows = sessionize(df, gap_seconds=gap).collect()
    assert len(rows) == len(events)  # partition: every event labeled
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["epoch_s"], r["session_seq"])
        )
    for seq in by_user.values():
        seq.sort()
        for (t0, s0), (t1, s1) in zip(seq, seq[1:]):
            if s0 == s1:
                assert t1 - t0 <= gap  # inside a session: gap bound holds
            else:
                assert s1 == s0 + 1 and t1 - t0 > gap  # new session iff gap exceeded
