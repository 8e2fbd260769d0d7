"""Focused tests for indexutil.local_frame's Arrow fast path guards and
the batch-probe prevalidation dim tracking (ADVICE r13 hardening).

The fast path must be VALUE-IDENTICAL to the legacy pickled-RDD path —
including on malformed input, where the legacy path raises a loud error
instead of silently truncating / NULL-filling rows.
"""

from __future__ import annotations

import math

import pytest

from realtime_gmall_flink_spark.indexutil import local_frame


def test_local_frame_arrow_fast_path_is_local_relation(spark):
    df = local_frame(
        spark,
        [(1, 1.5, "a"), (2, float("nan"), "b"), (3, -0.0, None)],
        "id long, x double, s string",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
    rows = {r["id"]: r for r in df.collect()}
    assert math.isnan(rows[2]["x"])
    assert math.copysign(1.0, rows[3]["x"]) == -1.0
    assert rows[3]["s"] is None


def test_local_frame_arity_mismatch_fails_loudly(spark):
    # a short row must NOT become Row(a=1, b=None): the Arrow builder
    # would NULL-fill it, the legacy pickler raises — the guard routes
    # malformed rows to the strict path
    with pytest.raises(Exception):
        local_frame(spark, [(1, 2), (3,)], "a long, b long").collect()

    # an over-long row must not be silently truncated either
    with pytest.raises(Exception):
        local_frame(spark, [(1, 2, 3)], "a long, b long").collect()


def test_local_frame_arity_guard_keeps_good_rows_fast(spark):
    df = local_frame(spark, [(1, 2), (3, 4)], "a long, b long")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert sorted(map(tuple, df.collect())) == [(1, 2), (3, 4)]


def test_prevalidated_batch_dim_mismatch_rechecked(spark):
    """A frame localized under one want_dim must not skip a DIFFERENT
    dim check: _require_query_batch re-verifies over the attached rows
    driver-side with the same geometry message."""
    from realtime_gmall_flink_spark.plans.vectors import (
        _localized_query_batch,
        _require_query_batch,
    )

    queries = local_frame(
        spark,
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])],
        "qid long, qe array<double>",
    )
    loc = _localized_query_batch(queries, "test", want_dim=2)
    # same dim (and dim-less) re-checks stay job-free no-ops
    _require_query_batch(loc, caller="test", want_dim=2)
    _require_query_batch(loc, caller="test")
    with pytest.raises(ValueError, match="not 3-dim"):
        _require_query_batch(loc, caller="test", want_dim=3)
