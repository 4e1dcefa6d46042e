"""Think-tag removal semantics — mirrors spec/reasoning_removal_spec.rb:34-148."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_batch_processor_spark.functions.text import think_strip

CASES = [
    ("Hello <think>reasoning here</think> world", "Hello  world"),
    ("<think>line1\nline2\nline3</think>answer", "answer"),
    ("<think>a</think>mid<think>b</think>end", "midend"),
    ("<think>at start</think>tail", "tail"),
    ("head<think>at end</think>", "head"),
    ("<think>has <inner> markup</think>kept", "kept"),
    ("<think>unclosed tag stays", "<think>unclosed tag stays"),
    ("bare close </think> stays", "bare close </think> stays"),
    ("<thinking>different tag</thinking>", "<thinking>different tag</thinking>"),
    ("<think>日本語の推論</think>答えは5です", "答えは5です"),
    ("", ""),
    ("   \n  ", ""),
    ("  surrounded  ", "surrounded"),
    ("<think></think>empty block", "empty block"),
]


@pytest.mark.parametrize("raw,expected", CASES, ids=range(len(CASES)))
def test_think_strip_cases(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "s STRING")
    got = df.select(think_strip(F.col("s")).alias("c")).first()["c"]
    assert got == expected
