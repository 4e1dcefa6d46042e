"""Proof that bucketed layout removes the join shuffle entirely.

The 100 TB payoff pinned at plan level: two tables bucketed on the
join key by the same bucket count join with ZERO Exchange operators —
versus the plain parquet join which must shuffle at least one side.
"""

from __future__ import annotations

import pytest

from llm_batch_processor_spark.plans import formatted_plan, shuffle_count
from llm_batch_processor_spark.sources.bucketed import read_table, write_bucketed
from llm_batch_processor_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    orders = load(spark, SF, "orders")
    lineitem = load(spark, SF, "lineitem")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 4, path=str(tmp_path / "orders_b")
    )
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 4, path=str(tmp_path / "lineitem_b")
    )
    try:
        joined = read_table(spark, "lineitem_b").join(
            read_table(spark, "orders_b"),
            read_table(spark, "lineitem_b")["l_orderkey"]
            == read_table(spark, "orders_b")["o_orderkey"],
        )
        # both sides expose bucket partitioning -> zero Exchange operators
        assert shuffle_count(joined) == 0, formatted_plan(joined)

        # same join over plain parquet must shuffle both sides
        plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        assert shuffle_count(plain) >= 2

        # results identical
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
