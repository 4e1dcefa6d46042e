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


def test_nearest_picks_min_gap_with_backward_ties(spark):
    from llm_batch_processor_spark.operators.asof import asof_join_nearest

    left, right = _mk(spark)
    res = asof_join_nearest(
        left, right, left_on="key", right_on="key",
        left_time="t", right_time="t", left_key="lid", right_tiebreak="rid",
    )
    got = {r["lid"]: (r["__nearest"], r["__direction"]) for r in res.collect()}
    # lid=1 (key 10, t=100): exact hit at t=100 -> rid 101, backward
    # lid=2 (t=205): gaps 105/5/95 -> t=200 rid 102, backward
    # lid=3 (key 20, t=150): only t=149 rows; tie at same t -> rid 105
    # lid=4 (key 30): no match either direction -> absent
    assert got == {1: (101, "backward"), 2: (102, "backward"), 3: (105, "backward")}


def test_nearest_matches_bruteforce_on_random_data(spark):
    import random

    from llm_batch_processor_spark.operators.asof import asof_join_nearest

    rng = random.Random(7)
    lrows = [(i, rng.randint(0, 4), rng.randint(0, 1000)) for i in range(60)]
    rrows = [(100 + i, rng.randint(0, 4), rng.randint(0, 1000)) for i in range(80)]
    left = spark.createDataFrame(lrows, "lid INT, key INT, t INT")
    right = spark.createDataFrame(rrows, "rid INT, key INT, t INT")
    res = asof_join_nearest(
        left, right, left_on="key", right_on="key",
        left_time="t", right_time="t", left_key="lid", right_tiebreak="rid",
    )
    got = {r["lid"]: (r["__nearest"], r["__direction"], r["t"]) for r in res.collect()}
    by_key: dict[int, list[tuple[int, int]]] = {}
    for rid, k, t in rrows:
        by_key.setdefault(k, []).append((rid, t))
    for lid, k, lt in lrows:
        cands = by_key.get(k, [])
        if not cands:
            assert lid not in got
            continue
        rid, direction, _ = got[lid]
        rt = dict(cands)[rid]
        min_gap = min(abs(t - lt) for _, t in cands)
        assert abs(rt - lt) == min_gap, (lid, rid, rt, lt, min_gap)
        # ties across directions must resolve backward
        if any(t <= lt and abs(t - lt) == min_gap for _, t in cands):
            assert rt <= lt and direction == "backward", (lid, rid)
        else:
            assert direction == "forward"
