"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import __spark_entry__ as E
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols


def test_oracle_keys_subset_of_queries():
    qs = E.queries()
    orc = E.oracle_sql()
    assert set(orc) <= set(qs)
    assert len(qs) >= 35
    for name, sql in orc.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_query_runs_at_smoke_sf(spark):
    # schema resolution + a cheap limit-collect for every registered query
    for name, fn in E.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()
