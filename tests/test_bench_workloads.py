"""The bench-only workloads must stay runnable and correct — they have
no catalog oracle, so this is their gate (the driver runs bench.py
unattended; a broken workload would surface only as a FAILED line in
BENCH_r{N}.json)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stateful_latest_dedup_bench_workload(spark):
    """One row per user (latest by (ts, event_id)), flushed by the
    far-future sentinel; the sentinel key itself stays in state and
    must NOT appear."""
    import duckdb

    from bench import _bench_stateful_dedup

    sf_dir = "/root/testdata/sf0.001"
    got = _bench_stateful_dedup(spark, sf_dir)
    rows = {r["user_id"]: (r["ts_us"], r["event_id"]) for r in got.collect()}
    assert -1 not in rows  # sentinel held by its own quiesce timer

    expected = {
        u: (ts, eid)
        for u, ts, eid in duckdb.connect().execute(
            f"""
            SELECT user_id, ts, event_id FROM (
                SELECT user_id, event_id,
                       epoch_us(ts) AS ts,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM read_parquet('{sf_dir}/events.parquet'))
            WHERE rn = 1
            """
        ).fetchall()
    }
    assert len(rows) == len(expected) == 15
    assert rows == {u: (ts, eid) for u, (ts, eid) in expected.items()}


def test_extra_headliners_registered():
    from bench import EXTRA_HEADLINERS

    assert "stateful_latest_dedup" in EXTRA_HEADLINERS
    assert all(q.headline for q in EXTRA_HEADLINERS.values())
