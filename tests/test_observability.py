"""Observation-based metrics + CLI surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import log_etl
from realtime_gmall_flink_spark.observability import (
    null_rate,
    observed,
    parse_health_metrics,
)

from . import gmall_fixtures as FX


def test_parse_health_metrics(spark):
    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    parsed = log_etl.parse_topic_log(raw)
    df, obs = observed(parsed, "log_parse", **parse_health_metrics())
    df.count()
    got = obs.get
    assert got["rows"] == len(FX.topic_log_rows())
    assert got["dirty_rows"] == 1


def test_null_rate_metric(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id int, v string"
    )
    out, obs = observed(df, "nr", vnull=null_rate("v"))
    out.count()
    assert obs.get["vnull"] == 0.5


def test_streaming_listener_collects_progress(spark, tmp_path):
    """Per-batch progress + observe metrics surface through the
    listener — the streaming half of the observability story."""
    from realtime_gmall_flink_spark.observability import (
        CollectingStreamingListener,
        observed_stream,
        parse_health_metrics,
    )
    from realtime_gmall_flink_spark.streaming import jobs, sources

    src = tmp_path / "obs_src"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(FX.topic_log_rows()) + "\n")

    lis = CollectingStreamingListener()
    lis.attach(spark)
    try:
        raw = sources.file_stream(spark, str(src))
        parsed = log_etl.parse_topic_log(raw)
        parsed = observed_stream(
            parsed, "stream_parse", **parse_health_metrics()
        )
        out = jobs.run_to_memory(
            parsed.select("raw"), mode="append"
        )
        assert out.count() == len(FX.topic_log_rows())
        lis.wait_for_batches(1)
    finally:
        lis.detach(spark)

    assert lis.total_input_rows() == len(FX.topic_log_rows())
    got = lis.observed("stream_parse")
    assert got and got[0]["rows"] == len(FX.topic_log_rows())
    assert got[0]["dirty_rows"] == 1
    data_batches = [p for p in lis.progress if p["numInputRows"]]
    assert all(p["durationMs"] for p in data_batches)
