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
