"""GMT+8 date helpers: fixed expectations independent of session tz."""

from __future__ import annotations

from realtime_gmall_flink_spark.functions import datetime as DT


def test_ms_roundtrip_gmt8(spark):
    # 2024-05-01 00:00:00 UTC == 2024-05-01 08:00:00 GMT+8
    ms = 1714521600000
    df = spark.createDataFrame([(ms,)], "ms long")
    row = df.select(
        DT.ms_to_date_str("ms").alias("d"),
        DT.ms_to_datetime_str("ms").alias("dt"),
    ).collect()[0]
    assert row["d"] == "2024-05-01"
    assert row["dt"] == "2024-05-01 08:00:00"

    back = (
        spark.createDataFrame([(row["dt"],)], "s string")
        .select(DT.date_str_to_ms("s").alias("ms"))
        .collect()[0]["ms"]
    )
    assert back == ms


def test_date_boundary_shifts_across_zones(spark):
    # 2024-04-30 20:00 UTC is already 2024-05-01 in GMT+8
    ms = 1714507200000
    df = spark.createDataFrame([(ms,)], "ms long")
    assert (
        df.select(DT.ms_to_date_str("ms").alias("d")).collect()[0]["d"]
        == "2024-05-01"
    )
