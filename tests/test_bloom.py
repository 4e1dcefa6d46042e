"""Bloom pre-join prune: exactness, actual pruning, and plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from llm_batch_processor_spark.operators.bloom import (
    bloom_might_contain,
    bloom_prefilter,
    build_bloom_bits,
)

SF = "/root/testdata/sf0.001"


def test_no_false_negatives(spark):
    from llm_batch_processor_spark.tables import load

    s = load(spark, SF, "supplier").filter(F.col("s_acctbal") > 9000)
    l = load(spark, SF, "lineitem")
    pruned = bloom_prefilter(l, "l_suppkey", s, "s_suppkey")
    keys = {r[0] for r in s.select("s_suppkey").collect()}
    # every big-side row with a truly-matching key must survive
    want = l.filter(F.col("l_suppkey").isin(keys)).count()
    got = pruned.filter(F.col("l_suppkey").isin(keys)).count()
    assert got == want


def test_join_result_identical_to_plain_join(spark):
    from llm_batch_processor_spark.tables import load

    s = load(spark, SF, "supplier").filter(F.col("s_acctbal") > 9000)
    l = load(spark, SF, "lineitem")
    plain = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey")
        .count()
        .collect()
    )
    pruned = bloom_prefilter(l, "l_suppkey", s, "s_suppkey")
    bloomed = (
        pruned.join(s, pruned.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, bloomed))


def test_prunes_most_non_members(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    members = spark.range(0, 100).withColumnRenamed("id", "k")
    words = build_bloom_bits(members, "k", m_bits=1 << 14, k=5)
    kept = df.filter(bloom_might_contain(F.col("k"), words, 1 << 14, 5)).count()
    # 100 true members survive; false-positive rate at m/n=164 bits/key
    # is well under 1%, so the 19 900 non-members mostly vanish
    assert kept >= 100
    assert kept < 100 + 400


def test_probe_stays_jvm_side_and_precedes_join(spark):
    from llm_batch_processor_spark.queries import all_queries

    df = all_queries()["join_bloom_prefilter"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the probe is a scan-stage Filter (xxhash64/getbit expressions),
    # not a Python eval
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan


def test_empty_build_side_prunes_everything(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    empty = df.filter("k < 0")
    words = build_bloom_bits(empty, "k", m_bits=1 << 12)
    assert all(w == 0 for w in words)
    kept = df.filter(bloom_might_contain(F.col("k"), words, 1 << 12)).count()
    assert kept == 0


def test_string_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zzz",)], "k string"
    )
    members = spark.createDataFrame([("a",), ("c",)], "k string")
    words = build_bloom_bits(members, "k", m_bits=1 << 12)
    kept = {
        r["k"]
        for r in df.filter(bloom_might_contain(F.col("k"), words, 1 << 12)).collect()
    }
    assert {"a", "c"} <= kept  # no false negatives; fp on b/zzz unlikely


def test_mismatched_key_types_rejected(spark):
    # xxhash64 hashes int(5) and bigint(5) differently; a silent type
    # mismatch would drop true matches (ADVICE r03) — refuse it
    from llm_batch_processor_spark.operators.bloom import bloom_prefilter

    big = spark.range(0, 100).withColumnRenamed("id", "k")  # bigint
    small = spark.createDataFrame([(1,), (2,)], "k int")
    with pytest.raises(TypeError, match="type"):
        bloom_prefilter(big, "k", small, "k")
    # identical types (after an explicit cast) pass the guard
    kept = bloom_prefilter(big, "k", small.select(F.col("k").cast("long")), "k")
    assert {r["k"] for r in kept.collect()} >= {1, 2}
