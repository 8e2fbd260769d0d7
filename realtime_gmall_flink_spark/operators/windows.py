"""Tumbling event-time windows (SURVEY section 2.6 W1-W4, 2.5 A1-A5).

Every DWS job in the reference is a 10 s tumbling event-time window over
keyed or global streams (e.g. app/dws/DwsTradeOrderWindow.java:233-235),
with stt/edt columns stamped from window metadata. Here: ``F.window`` plus
the aggregation; window.start/end are surfaced as ``stt``/``edt`` exactly
like the reference's ProcessWindowFunction finalizers.

Windows are epoch-aligned, matching both Flink's TUMBLE and DuckDB's
time_bucket for sub-day granularities, so oracle comparison is exact.

Scale: groupBy(window, dims) is one hash exchange; partial aggregation
(map-side combine) happens automatically. For the streaming variant add
``withWatermark`` before calling (W2/W3); allowedLateness (W4) has no Spark
equivalent — approximated by a longer watermark delay, divergence documented
in SURVEY section 7.3.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(ts_col: str, size: str) -> Column:
    """Epoch-aligned tumbling window column (struct<start,end>)."""
    return F.window(F.col(ts_col), size)


def tumble_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    dims: Sequence[str],
    aggs: Mapping[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregation with stt/edt columns.

    ``aggs`` maps output column name -> aggregate Column (pre-aliased names
    are overridden by the mapping key so query/oracle column names align).
    ``watermark`` (e.g. "3 seconds") enables the streaming path on an
    unbounded ``df``; ignored semantically in batch.
    """
    if watermark is not None and df.isStreaming:
        # withWatermark requires TIMESTAMP (with local tz). Parquet file
        # sources surface naive timestamps as TIMESTAMP_NTZ, so lift the NTZ
        # wall clock onto the identical UTC instant with timezone-free
        # arithmetic (no session-tz dependence; window alignment operates on
        # the underlying epoch micros either way).
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(
                ts_col,
                F.expr(
                    "timestamp_micros(timestampdiff(MICROSECOND,"
                    f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col}))"
                ),
            )
        df = df.withWatermark(ts_col, watermark)
    win = tumble(ts_col, size)
    grouped = df.groupBy(win.alias("__w"), *[F.col(d) for d in dims])
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("__w.start").alias("stt"),
        F.col("__w.end").alias("edt"),
        *[F.col(d) for d in dims],
        *[F.col(name) for name in aggs],
    )
