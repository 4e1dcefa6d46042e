"""global_cumsum == the single-partition window, on adversarial shapes."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from llm_batch_processor_spark.operators.prefix import global_cumsum


def _reference(rows):
    out, acc = {}, 0
    for k, v in sorted(rows):
        acc += v
        out[k] = acc
    return out


def _check(spark, rows, n_bins):
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        r["k"]: r["cum"]
        for r in global_cumsum(df, "k", "v", out_col="cum", n_bins=n_bins).collect()
    }
    assert got == _reference(rows)


def test_matches_window_on_random_keys(spark):
    rng = random.Random(7)
    keys = rng.sample(range(-(10**6), 10**6), 500)
    rows = [(k, rng.randrange(0, 1000)) for k in keys]
    _check(spark, rows, n_bins=32)


def test_skewed_keys_all_in_one_bin(spark):
    # every key lands in bin 0 except one outlier claiming the range
    rows = [(i, 1) for i in range(200)] + [(10**9, 5)]
    _check(spark, rows, n_bins=32)


def test_single_row_and_single_bin(spark):
    _check(spark, [(42, 7)], n_bins=32)
    rows = [(i, i) for i in range(50)]
    _check(spark, rows, n_bins=1)


def test_equals_spark_global_window(spark):
    rng = random.Random(11)
    rows = [(k, rng.randrange(0, 100)) for k in rng.sample(range(10**4), 300)]
    df = spark.createDataFrame(rows, "k long, v long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r["k"]: r["cum"] for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()}
    got = {r["k"]: r["cum"] for r in global_cumsum(df, "k", "v").collect()}
    assert got == want


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert global_cumsum(df, "k", "v").count() == 0


def test_negative_and_double_values(spark):
    rows = [(1, -5.5), (2, 2.25), (3, -0.75), (4, 10.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {r["k"]: r["cum"] for r in global_cumsum(df, "k", "v", n_bins=2).collect()}
    assert got == {1: -5.5, 2: -3.25, 3: -4.0, 4: 6.0}


def test_null_order_keys_rejected(spark):
    # NULL order keys can't totally order the rows; the old bin join
    # silently dropped them (ADVICE r03) — refuse instead
    df = spark.createDataFrame([(1, 10), (None, 20), (3, 30)], "k long, v long")
    with pytest.raises(ValueError, match="NULL"):
        global_cumsum(df, "k", "v")


def test_empty_input_keeps_sum_type(spark):
    # the empty path must type out_col as sum(v)'s type (bigint for
    # longs), matching the non-empty path's schema (ADVICE r03)
    df = spark.createDataFrame([], "k long, v long")
    empty_t = dict(global_cumsum(df, "k", "v").dtypes)["cum"]
    full = spark.createDataFrame([(1, 2)], "k long, v long")
    full_t = dict(global_cumsum(full, "k", "v").dtypes)["cum"]
    assert empty_t == full_t == "bigint"
