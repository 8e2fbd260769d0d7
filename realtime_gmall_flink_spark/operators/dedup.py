"""Deduplication operators.

D1 — latest-row-per-key dedup. The reference collapses upsert-kafka
changelogs (left-join retract pairs) by keeping, per key, the row with the
max ``row_op_ts`` using keyed ValueState plus a 5 s processing-time timer
(reference: app/dws/DwsTradeOrderWindow.java:122-164 and four siblings).
Batch form: ``row_number() over (partition by key order by version desc)``.
Streaming form: per-micro-batch dedup in foreachBatch (streaming.sinks).

Scale: the window function shuffles once on the key — same exchange a
groupBy would need, no extra stage. For heavily skewed keys AQE skew-join
handling doesn't apply to window exchanges, so extreme cases should pre-salt
on (key, salt) and re-reduce; not needed for the reference's id-grained keys
(order_detail_id — unique-ish, bounded duplication factor).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_row_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """Keep exactly one row per key: the max (or min) of ``order_by``.

    ``order_by`` should end with a unique tiebreaker column so the result is
    deterministic (the reference relies on Kafka arrival order instead —
    SURVEY.md section 4, parallelism note; we make ordering explicit).
    """
    ordering = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(
    df: DataFrame,
    fingerprint_col: str,
    id_col: str,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact content dedup: group by a fingerprint, keep the min-id canonical
    row and the duplicate count.

    At 100 TB the groupBy key should be a fixed-width digest (md5/xxhash of
    the content), never the content itself — the shuffle then moves 16-byte
    keys instead of documents.
    """
    aggs = [
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    ]
    aggs += [F.min(c).alias(c) for c in payload_cols]
    return df.groupBy(F.col(fingerprint_col).alias("fingerprint")).agg(*aggs)
