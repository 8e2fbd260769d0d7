"""db-side DWD fact tables + DIM routing over the CDC fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import cdc, dims, dwd_db
from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

from . import gmall_fixtures as FX


@pytest.fixture(scope="module")
def env(spark):
    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_db_rows()], "value string"
    )
    return cdc.parse_topic_db(raw).cache()


@pytest.fixture(scope="module")
def base_dic(spark):
    return spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)


def test_bootstrap_dropped(env):
    assert env.filter(F.col("type").startswith("bootstrap")).count() == 0


def test_order_pre_process(env, base_dic):
    pre = dwd_db.order_pre_process(env, base_dic)
    # D1 appears twice (changelog dup), each joining O1's 3 order_info
    # changes; D2 joins 3; D3 joins O2's 2; D4 joins O3's 1
    assert pre.count() == 2 * 3 + 3 + 2 + 1
    d1 = pre.filter(
        (F.col("id") == "D1") & (F.col("order_type") == "insert")
    ).collect()
    assert {r["activity_id"] for r in d1} == {"A1"}
    assert {r["source_type_name"] for r in d1} == {"promo"}
    d2 = pre.filter(F.col("id") == "D2").collect()
    assert {r["coupon_id"] for r in d2} == {"C1"}
    assert {r["activity_id"] for r in d2} == {None}


def test_order_detail_and_cancel(env, base_dic):
    pre = dwd_db.order_pre_process(env, base_dic)
    det = dwd_db.order_detail(pre)
    # one insert-typed oi row per order: D1 dup x1 each + D2 + D3 + D4
    assert det.count() == 5
    cancel = dwd_db.cancel_detail(pre)
    rows = cancel.select("id", "order_id", "order_status").collect()
    assert {(r["id"], r["order_id"]) for r in rows} == {
        ("D1", "O1"), ("D2", "O1")
    }


def test_pay_detail_suc(env, base_dic):
    pre = dwd_db.order_pre_process(env, base_dic)
    det = dwd_db.order_detail(pre)
    pay = dwd_db.pay_detail_suc(env, det, base_dic)
    rows = pay.select("id", "pay_user_id", "payment_type_name").collect()
    got = {(r["id"], r["pay_user_id"], r["payment_type_name"]) for r in rows}
    # O1 pays -> details D1 (x2 dup), D2; O2 pays -> D3
    assert got == {
        ("D1", "U1", "alipay"),
        ("D2", "U1", "alipay"),
        ("D3", "U2", "wechat"),
    }


def test_cart_add(env, base_dic):
    cart = dwd_db.cart_add(env, base_dic)
    rows = {
        (r["id"], r["sku_num"], r["source_type_name"])
        for r in cart.select("id", "sku_num", "source_type_name").collect()
    }
    # CA1 insert qty 2, CA1 growth delta 3; CA2 non-growth update excluded
    assert rows == {("CA1", "2", "promo"), ("CA1", "3", "promo")}


def test_order_refund(env, base_dic):
    ref = dwd_db.order_refund(env, base_dic)
    rows = ref.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id"], r["order_id"], r["province_id"]) == ("R1", "O2", "P2")
    assert r["refund_type_name"] == "refund-only"
    assert r["refund_reason_type_name"] == "quality"


def test_refund_pay_suc(env, base_dic):
    rp = dwd_db.refund_pay_suc(env, base_dic)
    rows = rp.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id"], r["order_id"], r["user_id"], r["province_id"]) == (
        "RP1", "O2", "U2", "P2"
    )
    assert r["refund_num"] == "3"
    assert r["payment_type_name"] == "wechat"


def test_coupons(env):
    get = dwd_db.coupon_get(env)
    assert {r["id"] for r in get.select("id").collect()} == {"CU1", "CU2"}
    order = dwd_db.coupon_order(env)
    rows = order.collect()
    assert [(r["id"], r["order_id"]) for r in rows] == [("CU1", "O1")]
    pay = dwd_db.coupon_pay(env)
    rows = pay.collect()
    assert [(r["id"], r["used_time"]) for r in rows] == [
        ("CU1", f"{FX.DAY1} 10:05:00")
    ]


def test_interaction_and_register(env, base_dic):
    fav = dwd_db.favor_add(env)
    assert fav.count() == 1
    com = dwd_db.comment_info(env, base_dic)
    r = com.collect()[0]
    assert (r["id"], r["appraise_name"]) == ("CM1", "good")
    reg = dwd_db.user_register(env)
    rows = {
        (r["user_id"], r["date_id"]) for r in reg.collect()
    }
    assert rows == {("U1", FX.DAY1), ("U2", FX.DAY1)}


def test_dim_routing(env):
    d = dims.build_dims(env)
    assert set(d) == {
        "dim_base_province", "dim_sku_info", "dim_spu_info",
        "dim_base_trademark", "dim_base_category3", "dim_base_category2",
        "dim_base_category1",
    }
    prov = {
        (r["id"], r["name"]) for r in d["dim_base_province"].collect()
    }
    # latest-wins upsert: P1 renamed by the later update
    assert prov == {("P1", "Beijing-2"), ("P2", "Shanghai")}
    sku = {
        (r["id"], r["tm_id"], r["spu_id"])
        for r in d["dim_sku_info"].collect()
    }
    assert sku == {("S1", "TM1", "SP1"), ("S2", "TM2", "SP2")}
