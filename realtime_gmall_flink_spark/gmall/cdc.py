"""topic_db CDC envelope handling (reference: the `filterTable` SQL blocks
repeated in every app/dwd/db/* job, e.g. DwdTradeOrderPreProcess.java:68-127).

One generic extractor replaces the per-job copy-paste: filter on
(table, type[, map-predicates]) and project ``data['col'] as col`` (P3),
with predicates over the ``old`` changed-column map (P4/P6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import TOPIC_DB_SCHEMA

BOOTSTRAP_TYPES = ("bootstrap-start", "bootstrap-complete")


def parse_topic_db(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """value string -> typed envelope; bootstrap rows dropped
    (DimSinkApp.java:67-82)."""
    parsed = raw.select(
        F.from_json(F.col(value_col), TOPIC_DB_SCHEMA).alias("__j")
    ).select("__j.*")
    return parsed.filter(~F.col("type").isin(*BOOTSTRAP_TYPES))


def old_has_key(key: str) -> Column:
    """True when the update touched ``key`` (the changed-column set contains
    it, even with a NULL prior value) — the map form of the reference's
    JSON key-set test (DwdToolCouponOrder.java:101-111)."""
    return F.map_contains_key(F.col("old"), key)


def old_value(key: str) -> Column:
    """Prior value of a changed column (DwdTradeCancelDetail.java:110-112)."""
    return F.col("old")[key]


def cdc_extract(
    env: DataFrame,
    table: str,
    types: Sequence[str],
    columns: Sequence[str],
    extra: Column | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Filter one source table/changetype set and lift ``data`` fields to
    top-level columns. ``keep_meta`` retains type/old/ts for downstream
    predicates."""
    cond = (F.col("table") == table) & F.col("type").isin(*types)
    if extra is not None:
        cond = cond & extra
    proj = [F.col("data")[c].alias(c) for c in columns]
    if keep_meta:
        proj += [F.col("type"), F.col("old"), F.col("ts")]
    return env.filter(cond).select(*proj)
