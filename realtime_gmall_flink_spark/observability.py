"""Pipeline observability: named metrics on DataFrames, batch + streaming.

The reference's only observability is .print() sinks and Flink web-UI
counters. Spark-first: ``df.observe`` attaches named aggregate metrics
that are computed inline with the job (no extra pass, no action of their
own) and surface on the driver — per-batch via StreamingQueryListener in
streaming mode.

Typical use: dirty-row rate on the log parse, rows-emitted per DWD fact,
null-rate on lookup-join outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named metrics; read ``obs.get`` after the first action.

    Example::

        df, obs = observed(parsed, "log_parse",
                           rows=F.count(F.lit(1)),
                           dirty=F.sum(F.col("__dirty").cast("int")))
        df.write...   # any action
        obs.get  # {'rows': ..., 'dirty': ...}
    """
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def parse_health_metrics() -> dict[str, Column]:
    """Standard metric set for the ODS parse stage."""
    return {
        "rows": F.count(F.lit(1)),
        "dirty_rows": F.sum(F.col("__dirty").cast("long")),
    }


def null_rate(col: str) -> Column:
    """Share of nulls in a column — lookup-join hydration health."""
    return (
        F.sum(F.col(col).isNull().cast("double")) / F.count(F.lit(1))
    )
