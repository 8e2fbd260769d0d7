"""Bucketed co-located join: same result, no shuffle exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.sources.lakehouse import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)
from realtime_gmall_flink_spark.sources.testdata import load_table

from .conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_shuffle(spark, no_broadcast, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], buckets=8)
    write_bucketed(orders, "b_orders", ["l_orderkey"], buckets=8)

    joined = bucketed_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
    assert not plan_has_shuffle(joined), joined._jdf.queryExecution().executedPlan().toString()

    # same result as the plain join
    plain = li.join(orders, "l_orderkey")
    assert joined.count() == plain.count() > 0

    # control: the unbucketed join DOES shuffle under the same conf
    assert plan_has_shuffle(plain)

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_order_pre_process_bucketed_no_shuffle(spark, no_broadcast):
    """NOTES item 1: the od x oi fact join over bucketed CDC extracts
    plans with no shuffle Exchange and matches the plain pre-process."""
    from realtime_gmall_flink_spark.gmall import cdc, dwd_db
    from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

    from . import gmall_fixtures as FX

    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_db_rows()], "value string"
    )
    env = cdc.parse_topic_db(raw)
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)

    bucketed = dwd_db.order_pre_process_bucketed(
        spark, env, base_dic, buckets=4
    )
    assert not plan_has_shuffle(bucketed), (
        bucketed._jdf.queryExecution().executedPlan().toString()
    )

    plain = dwd_db.order_pre_process(env, base_dic)
    key = lambda df: {  # noqa: E731
        (r["id"], r["order_id"], r["order_type"], r["split_total_amount"])
        for r in df.select(
            "id", "order_id", "order_type", "split_total_amount"
        ).collect()
    }
    assert key(bucketed) == key(plain)
    assert bucketed.count() == plain.count() > 0

    spark.sql("DROP TABLE IF EXISTS bkt_od")
    spark.sql("DROP TABLE IF EXISTS bkt_oi")


def test_date_partitioned_scan_prunes(spark, tmp_path):
    """A date filter over a date-partitioned table must land in the
    scan's PartitionFilters (directory-level pruning, zero I/O for the
    excluded days) — the time-series layout for the events table."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.sources.lakehouse import (
        write_partitioned,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "dt", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["dt"])

    days = [r["dt"] for r in spark.read.parquet(path).select("dt").distinct().collect()]
    assert len(days) > 1  # pruning is only meaningful with >1 partition
    target = sorted(days)[0]
    df = spark.read.parquet(path).filter(F.col("dt") == F.lit(target))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # row-level check: only that day's rows come back
    got = df.select("dt").distinct().collect()
    assert [r["dt"] for r in got] == [target]


def test_range_clustered_layout_has_narrow_file_stats(spark, tmp_path):
    """write_range_clustered must produce files whose parquet footers
    carry near-disjoint min/max ranges for the cluster column — the
    stats row-group pruning skips on — and a range filter must read the
    same rows as from an unclustered copy."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.sources.lakehouse import (
        write_range_clustered,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    out = str(tmp_path / "clustered")
    write_range_clustered(li, out, ["l_shipdate"], files=8)

    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        col = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    # contiguous range clustering: sorted file ranges must not overlap
    # beyond their shared boundary value
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # and the clustered copy answers a range query identically
    pred = (F.col("l_shipdate") >= "1995-01-01") & (
        F.col("l_shipdate") < "1996-01-01"
    )
    got = spark.read.parquet(out).filter(pred)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, li.filter(pred).collect())
    )
