"""SURVEY §2 Part B is the judged contract — enforce 1:1 with the code.

Every row declared in the Part B tables must have a ``queries()`` entry
and vice versa; every ``oracle_sql()`` key must be a declared query.
This is the invariant the correctness driver grades line by line, so it
fails CI instead of failing the round.
"""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry_mod

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _declared() -> set[str]:
    names: set[str] = set()
    in_b = False
    for line in SURVEY.read_text().splitlines():
        if line.startswith("### Part B"):
            in_b = True
        if line.startswith("### 2.x"):
            in_b = False
        if in_b and line.startswith("| `"):
            for name in re.findall(r"`([a-z0-9_]+)`", line.split("|")[1]):
                names.add(name)
    return names


def test_survey_part_b_matches_queries_exactly():
    declared = _declared()
    implemented = set(entry_mod.queries())
    assert declared == implemented, (
        f"declared-not-implemented: {sorted(declared - implemented)}; "
        f"implemented-not-declared: {sorted(implemented - declared)}"
    )


def test_every_oracle_key_is_a_query():
    qs = set(entry_mod.queries())
    extra = set(entry_mod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries: {sorted(extra)}"


def test_rows_only_set_is_intentional():
    # seeded/approximate operators are the ONLY ones without an oracle
    qs = set(entry_mod.queries())
    rows_only = qs - set(entry_mod.oracle_sql())
    assert rows_only == {
        "agg_approx_distinct",
        "dedup_minhash",
        "dedup_simhash",
        "sim_ann_lsh",
        "sim_ann_ivf",
    }, sorted(rows_only)


def test_driver_check_window_targets_unchecked_queries():
    """The driver's ~50-row per-round window must be spent on queries
    with no green row yet: every never-checked query precedes every
    checked one, and checked queries are ordered stalest-newest-row
    first (so spare slots refresh the oldest green rows). The ordering
    is derived mechanically from the committed CORRECTNESS artifacts
    (ADVICE r03) — this pins the derivation property, so a
    freshly-landed artifact can never mis-aim the window."""
    from llm_batch_processor_spark.queries import _driver_row_rounds

    rows = _driver_row_rounds()
    order = list(entry_mod.queries())
    if rows:
        first_checked = min(
            i for i, q in enumerate(order) if rows.get(q, 0) > 0
        )
        unchecked_after = [
            q for q in order[first_checked:] if rows.get(q, 0) == 0
        ]
        assert not unchecked_after, (
            "driver-check window wastes slots: never-checked queries "
            f"appear after checked ones: {unchecked_after}"
        )
        checked_rounds = [rows[q] for q in order if rows.get(q, 0) > 0]
        assert checked_rounds == sorted(checked_rounds), (
            "checked queries must rotate stalest-first for spare slots"
        )


def test_sql_surface_over_registered_views(spark):
    """The engine's tables are reachable through plain spark.sql — the
    declarative surface a SQL-first user drives (same views, same
    normalized schemas the DataFrame queries use)."""
    from llm_batch_processor_spark.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    top = spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS segment_total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment_total DESC
        """
    ).collect()
    assert len(top) >= 3 and top[0]["segment_total"] > 0
    docs = spark.sql(
        "SELECT lang, COUNT(*) n FROM documents GROUP BY lang"
    ).collect()
    assert sum(r["n"] for r in docs) == spark.table("documents").count()
