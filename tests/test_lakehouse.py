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
