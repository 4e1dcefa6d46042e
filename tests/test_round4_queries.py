"""Property tests for the round-4 query families — semantics the DuckDB
oracle equivalence cannot express on its own (cross-formulation
equality, monotonicity, conservation laws).

Reference parity note: none of these operators exist in the reference
(SURVEY.md §2 Part A — its surface is the LLM map CLI); they are the
training-data-pipeline extension mandated by the brief.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_batch_processor_spark.queries import all_queries

SF_SMOKE = "/root/testdata/sf0.001"


def _run(spark, name):
    return all_queries()[name].fn(spark, SF_SMOKE)


def test_sliding_distinct_matches_bruteforce_window(spark):
    # contribute-then-count must equal the naive "distinct users in
    # [d-6, d]" definition computed by an explicit self-join
    got = {
        r["day_end"]: r["u7"]
        for r in _run(spark, "sliding_distinct_users").collect()
    }
    from llm_batch_processor_spark.tables import load

    ud = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", F.expr("ts_ns DIV 1000000000 DIV 86400").alias("d"))
        .distinct()
    )
    days = ud.select(F.col("d").alias("w")).distinct()
    brute = {
        r["w"]: r["u"]
        for r in days.join(
            ud, (ud.d <= days.w) & (ud.d >= days.w - 6)
        )
        .groupBy("w")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    # brute only covers window-ends that are themselves active days;
    # the fan-out also emits trailing ends — brute must be a sub-map
    assert brute and all(got[w] == u for w, u in brute.items())


def test_survival_km_curve_is_monotone_from_one(spark):
    rows = sorted(
        _run(spark, "survival_km").collect(), key=lambda r: r["dur_d"]
    )
    assert rows, "KM output empty"
    s = [r["survival"] for r in rows]
    assert all(0.0 <= x <= 1.0 for x in s)
    assert all(a >= b for a, b in zip(s, s[1:])), "S(t) must be non-increasing"
    # at-risk must be a strictly decreasing suffix count
    ar = [r["at_risk"] for r in rows]
    assert all(a > b for a, b in zip(ar, ar[1:]))


def test_attribution_linear_conserves_credit(spark):
    # fixed-point credit: every converting user contributes
    # n_touches * (1e6 DIV n_touches) — within 1e6 of 1e6 per user,
    # and the channel totals must sum to exactly that grand total
    out = _run(spark, "attribution_linear").collect()
    total_fp = sum(r["credit_fp"] for r in out)
    n_users = (
        _run(spark, "attribution_linear")
        .agg(F.sum("n_users"))
        .collect()[0][0]
    )
    assert n_users > 0
    # each user's credit is <= 1e6 and > 1e6 - n_touches (floor loss)
    assert total_fp <= 1_000_000 * sum(r["n_users"] for r in out)


def test_partial_agg_merge_equals_direct_aggregation(spark):
    from llm_batch_processor_spark.tables import load

    merged = {
        r["o_orderpriority"]: (r["n_orders"], r["total_price"])
        for r in _run(spark, "partial_agg_merge").collect()
    }
    direct = {
        r["o_orderpriority"]: (r["n"], r["t"])
        for r in load(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("t"),
        )
        .collect()
    }
    assert merged == direct, "shard-merged stats must equal direct aggregation"


def test_equidepth_buckets_are_balanced_and_ordered(spark):
    rows = sorted(
        _run(spark, "histogram_equidepth").collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == list(range(10))
    counts = [r["n_rows"] for r in rows]
    assert max(counts) - min(counts) <= 1, "equi-depth must balance to +/-1"
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"], "bucket value ranges must be ordered"


def test_pq_codes_in_codebook_and_exact_for_centroids(spark):
    rows = _run(spark, "embedding_pq_assign").collect()
    assert all(0 <= r["code"] < 16 for r in rows)
    assert all(r["sub"] in (0, 1) for r in rows)
    # a codebook vector must be assigned to itself at distance 0
    own = [r for r in rows if r["vec_id"] < 16]
    assert own and all(
        r["code"] == r["vec_id"] and r["d2"] == 0.0 for r in own
    )


def test_zorder_clusters_bound_both_dimension_spans(spark):
    rows = _run(spark, "zorder_cluster").collect()
    assert rows
    # 16-bit z, cluster = zv DIV 1024 -> within a cluster the top 3
    # bit-pairs are fixed, so each dimension varies in <= 32 of 256
    assert all(r["x_span"] <= 32 and r["y_span"] <= 32 for r in rows)


def test_table_diff_classes_partition_the_keyspace(spark):
    from llm_batch_processor_spark.tables import load

    rows = {r["class"]: r["n"] for r in _run(spark, "table_diff").collect()}
    n_orders = load(spark, SF_SMOKE, "orders").count()
    n_added = rows.get("added", 0)
    # every original key is exactly one of removed/changed/unchanged
    assert (
        rows.get("removed", 0) + rows.get("changed", 0) + rows.get("unchanged", 0)
        == n_orders
    )
    assert n_added >= 0


def test_empty_input_contract(spark, tmp_path):
    """Empty daily partitions are routine in production: every query
    must return a valid (possibly empty) result on schema-identical
    empty tables, never crash. The full 272-query empty sweep runs in
    tools (BASELINE.md r5); this pins the three fixed crashers (sink
    read-back schema inference, IVF training on an empty sample) plus
    one representative per family."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.sql(
            f"COPY (SELECT * FROM '/root/testdata/sf0.01/{t}.parquet' "
            f"LIMIT 0) TO '{tmp_path}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    from llm_batch_processor_spark.queries import all_queries

    qs = all_queries()
    probe = [
        # the three empty-input crashers fixed in r5
        "sink_parquet_clustered", "sink_parquet_partitioned", "sim_ann_ivf",
        # one representative per family
        "agg_group", "win_rank", "join_inner_hash", "dedup_exact",
        "dedup_minhash", "sim_topk", "text_stats", "pipeline_curate",
        "session_window", "multimodal_meta", "llm_map_mock",
        "graph_pagerank", "rfm_segmentation", "bootstrap_ci_det",
        "embedding_pq_assign", "feature_variance_audit",
    ]
    for name in probe:
        n = qs[name].fn(spark, str(tmp_path)).count()
        assert n >= 0, name
