"""Plan-shape regression tests: the performance properties documented in
docs/PLANS.md must survive refactors — pushdown reaching the scan,
broadcast-only dim pyramids, WindowGroupLimit on the dedup."""

from __future__ import annotations

from realtime_gmall_flink_spark.plans.catalog import catalog

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    df = catalog()["tpch_q1"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # projection pruning: a column the query never touches must not be read
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_enrichment_is_broadcast_only(spark):
    df = catalog()["order_detail_enriched"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    # the fact side must not be exchanged for the joins
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_dedup_uses_window_group_limit(spark):
    df = catalog()["dedup_latest_event"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan


def test_jaccard_single_scan(spark):
    df = catalog()["near_dup_jaccard"].builder(spark, SF_DIR)
    plan = _plan(df)
    # one parquet scan of documents, no self-join re-scan
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
