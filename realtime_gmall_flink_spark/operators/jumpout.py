"""Jump-out (bounce) detection — the reference's only CEP use (W5).

Reference pattern (app/dwd/log/DwdTrafficUserJumpDetail.java:104-147):
per device, a session-start page (last_page_id IS NULL) is a "jump-out" if
it is followed by another session-start, or by nothing within 10 s (the CEP
timeout side-output is unioned back, :153).

Batch form: ``lead(ts) over (partition by key order by ts)`` restricted to
session-start rows — a start row bounces unless the *next event of any
kind* arrives within the timeout AND is not itself a session start.
Streaming form: event-time timer per key (streaming.stateful).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def jump_out_batch(
    df: DataFrame,
    key: str,
    ts_col: str,
    is_session_start: Column,
    timeout_seconds: int = 10,
    tiebreak: str | None = None,
) -> DataFrame:
    """Return the subset of session-start rows classified as jump-outs.

    A session-start row jumps out when the next row for the key is absent,
    is itself a session start, or arrives after ``timeout_seconds``.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    nxt_ts = F.lead(F.col(ts_col)).over(w)
    nxt_start = F.lead(is_session_start).over(w)
    # Whole-microsecond diff: exact in both Spark and the DuckDB oracle
    # (second-granularity diffs truncate differently across engines).
    gap_ok = nxt_ts.isNotNull() & (
        F.timestamp_diff("MICROSECOND", F.col(ts_col), nxt_ts)
        <= F.lit(timeout_seconds * 1_000_000)
    )
    followed_by_content = gap_ok & ~nxt_start
    return (
        df.withColumn("__start", is_session_start)
        .withColumn("__followed", followed_by_content)
        .filter(F.col("__start") & ~F.col("__followed"))
        .drop("__start", "__followed")
    )
