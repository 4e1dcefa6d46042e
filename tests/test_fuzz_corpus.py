"""Pins for the seeded corpus fuzzer (tools/fuzz_corpus.py, VERDICT r8
item 1): the generator's own contracts — determinism, key uniqueness,
non-degenerate pristine mass — not the oracle gate itself (that runs
as the robustness-matrix `fuzz` row, ~5 min/seed)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.fuzz_corpus import build_fuzz, sample_plan  # noqa: E402

SF = "/root/testdata/sf0.001"
KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
}


def test_plan_is_deterministic_per_seed():
    assert sample_plan(3) == sample_plan(3)
    assert sample_plan(3) != sample_plan(4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_keys_stay_unique_and_tables_keep_mass(tmp_path, seed):
    """The fuzzer's hard contracts: every primary key stays unique
    (dupkeys is a separate TYPED matrix row — a fuzz corpus that
    collides keys would turn contract rows into false failures), and
    every table keeps >= half its rows un-NULLed / pristine enough
    that aggregates have non-degenerate mass."""
    build_fuzz(SF, tmp_path, seed)
    con = duckdb.connect()
    for t, k in KEYS.items():
        dups = con.execute(
            f"SELECT COUNT(*) - COUNT(DISTINCT {k}) "
            f"FROM read_parquet('{tmp_path}/{t}.parquet')"
        ).fetchone()[0]
        assert dups == 0, (t, seed)
    n, n_null = con.execute(
        f"SELECT COUNT(*), COUNT(*) FILTER (text IS NULL) "
        f"FROM read_parquet('{tmp_path}/documents.parquet')"
    ).fetchone()
    assert n > 0 and n_null <= n // 2
    n, n_bad = con.execute(
        f"SELECT COUNT(*), COUNT(*) FILTER (embedding IS NULL) "
        f"FROM read_parquet('{tmp_path}/embeddings.parquet')"
    ).fetchone()
    assert n > 0 and n_bad <= n // 2
    con.close()


def test_build_is_deterministic(tmp_path):
    """Same seed -> byte-identical logical content (row multisets),
    so a divergence found at seed N reproduces exactly."""
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    build_fuzz(SF, a, 7)
    build_fuzz(SF, b, 7)
    con = duckdb.connect()
    for t in KEYS:
        diff = con.execute(
            f"SELECT COUNT(*) FROM ("
            f"  (SELECT * FROM read_parquet('{a}/{t}.parquet')"
            f"   EXCEPT ALL SELECT * FROM read_parquet('{b}/{t}.parquet'))"
            f"  UNION ALL"
            f"  (SELECT * FROM read_parquet('{b}/{t}.parquet')"
            f"   EXCEPT ALL SELECT * FROM read_parquet('{a}/{t}.parquet')))"
        ).fetchone()[0]
        assert diff == 0, t
    con.close()


def test_seeds_explore_different_cells():
    """Across 8 seeds, every major axis must toggle at least twice —
    the sampling actually explores the hazard space instead of
    collapsing to one corpus."""
    plans = [sample_plan(s) for s in range(8)]
    for axis in ("key_mod", "doc_text_null", "ev_ts_sentinel",
                 "emb_nonfin", "li_money", "rowperm"):
        on = sum(1 for p in plans if p[axis])
        assert 1 <= on <= 7, (axis, on)
