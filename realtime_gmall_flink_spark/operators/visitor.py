"""Per-key date-memory operators (SURVEY section 2 D4 / A6).

The reference keeps per-device/per-user ValueState of "last seen date" to
(a) repair the is_new flag (reference: app/dwd/log/BaseLogApp.java:109-149),
(b) emit each key at most once per day for UV / unique-user counting
(reference: app/dwd/log/DwdTrafficUniqueVisitorDetail.java:86-116 and the
DWS first-order/first-payment variants), and
(c) detect 8+-day-gap "back flow" logins
(reference: app/dws/DwsUserUserLoginWindow.java:126-181).

Batch form: analytic window functions over the full history — a single
shuffle on the key, whole-stage-codegen friendly, no Python in the loop.
Streaming form: transformWithState keeping (key -> last_date); see
streaming.stateful.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_visit_repair(
    df: DataFrame,
    key: str,
    ts_col: str,
    is_new_col: str = "is_new",
) -> DataFrame:
    """Recompute ``is_new``: 1 only on the key's first-ever date.

    Matches the intent of BaseLogApp's state repair: a claimed-new visitor
    seen on an earlier date is downgraded to 0.
    """
    w = Window.partitionBy(key)
    first_date = F.min(F.to_date(ts_col)).over(w)
    return df.withColumn(
        is_new_col,
        F.when(F.to_date(ts_col) == first_date, F.lit(1)).otherwise(F.lit(0)),
    )


def first_per_period(
    df: DataFrame,
    key: str,
    ts_col: str,
    period: Column | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep the first row per (key, period) — the UV-detail operator.

    ``period`` defaults to the calendar date of ``ts_col`` (the reference's
    state-TTL'd daily dedup, W8: a date compare replaces TTL for
    correctness). ``tiebreak`` makes ordering deterministic for equal
    timestamps.
    """
    period = period if period is not None else F.to_date(ts_col)
    ordering = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(F.col(key), period).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def gap_flag(
    df: DataFrame,
    key: str,
    ts_col: str,
    min_gap_days: int = 8,
    flag_col: str = "is_back",
) -> DataFrame:
    """Flag rows whose previous activity date for the key is >= N days ago.

    The back-flow detector: the reference counts a returning user when the
    stored last-login date differs by >= 8 days (code behavior; the doc
    comment says 7 — we keep code behavior per SURVEY section 4.1).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    prev_date = F.lag(F.to_date(ts_col)).over(w)
    return df.withColumn(
        flag_col,
        F.when(
            prev_date.isNotNull()
            & (F.datediff(F.to_date(ts_col), prev_date) >= min_gap_days),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
