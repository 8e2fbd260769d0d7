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


def test_q6_pure_scan_no_join_no_key_shuffle(spark):
    df = catalog()["tpch_q6_revenue_change"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    # only the global partial/final agg boundary, no hashpartitioning
    assert "Exchange hashpartitioning" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "l_comment" not in plan and "l_orderkey" not in plan


def test_q10_dims_broadcast_fact_shuffles_once(spark):
    df = catalog()["tpch_q10_returned_revenue"].builder(spark, SF_DIR)
    plan = _plan(df)
    # customer + nation always broadcast; at test SF AQE may also
    # broadcast the quarter-filtered orders side (correct adaptively —
    # at scale it reverts to a shuffle join on orderkey)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "EqualTo(l_returnflag,R)" in plan  # filter reached the scan
    # both date bounds pushed too
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_ivf_assignment_shuffle_free(spark):
    """The centroid assignment is a per-row array_max over a broadcast
    centroid array: no per-vector hash shuffle, no window operator — the
    fact side flows from scan to probe join without an Exchange (the old
    crossJoin + row_number form shuffled n*k rows)."""
    from realtime_gmall_flink_spark.plans.vectors import (
        ivf_assign,
        ivf_centroids,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(ivf_assign(emb, ivf_centroids(emb)))
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row centroid array side

    # the full query keeps that property end to end
    full = _plan(catalog()["ann_ivf_topk"].builder(spark, SF_DIR))
    assert "Window" not in full


def test_contamination_single_scan_hash_joins(spark):
    df = catalog()["split_contamination"].builder(spark, SF_DIR)
    plan = _plan(df)
    # shingle subtree is computed once per side off one documents scan
    # family; the join key is the 8-byte xxhash64, never shingle text
    assert "xxhash64" in plan
    assert "CartesianProduct" not in plan


def test_doc_chunks_no_shuffle(spark):
    df = catalog()["doc_chunks"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_topn_per_group_pushes_limit_below_exchange(spark):
    df = catalog()["top_users_per_event_type"].builder(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final
