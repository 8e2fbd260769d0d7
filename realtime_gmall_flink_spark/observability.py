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


def observed_stream(
    df: DataFrame, name: str, **metrics: Column
) -> DataFrame:
    """Streaming form of :func:`observed`: ``Observation`` objects are
    batch-only (one value per action), so streaming metrics register
    under a string name and surface PER MICRO-BATCH in
    ``QueryProgressEvent.progress.observedMetrics`` — collect them with
    :class:`CollectingStreamingListener`."""
    return df.observe(name, *[c.alias(n) for n, c in metrics.items()])


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


class CollectingStreamingListener:
    """StreamingQueryListener that collects per-batch progress — input
    rows, stage durations, and any ``observe`` metrics flowing through
    the query — the Spark-first replacement for the reference's Flink
    web-UI counters. Attach/detach around a run::

        lis = CollectingStreamingListener()
        lis.attach(spark)
        try:
            ...run streaming query...
            rows = lis.total_input_rows()
        finally:
            lis.detach(spark)
    """

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        progress: list[dict] = []

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                try:
                    observed = {
                        name: row.asDict()
                        for name, row in (p.observedMetrics or {}).items()
                    }
                except Exception:
                    observed = {}
                progress.append(
                    {
                        "name": p.name,
                        "batchId": p.batchId,
                        "numInputRows": p.numInputRows,
                        "durationMs": dict(p.durationMs or {}),
                        "observedMetrics": observed,
                    }
                )

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        self.progress = progress
        self._listener = _L()

    def attach(self, spark) -> None:
        spark.streams.addListener(self._listener)

    def detach(self, spark) -> None:
        spark.streams.removeListener(self._listener)

    def wait_for_batches(self, n: int, timeout_s: float = 20.0) -> None:
        """Listener events are delivered asynchronously; poll until ``n``
        data batches arrived (or timeout)."""
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if len([p for p in self.progress if p["numInputRows"]]) >= n:
                return
            time.sleep(0.2)

    def total_input_rows(self) -> int:
        return sum(p["numInputRows"] for p in self.progress)

    def observed(self, metric_set: str) -> list[dict]:
        return [
            p["observedMetrics"][metric_set]
            for p in self.progress
            if metric_set in p["observedMetrics"]
        ]
