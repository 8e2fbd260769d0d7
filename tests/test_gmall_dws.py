"""DWS windowed summary tables over the fixture corpus — expectations
hand-computed per window (10 s tumbling, UTC)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import cdc, dims, dwd_db, dws, log_etl
from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

from . import gmall_fixtures as FX


def w(day: str, hms: str) -> datetime:
    return datetime.strptime(f"{day} {hms}", "%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="module")
def env(spark):
    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_db_rows()], "value string"
    )
    return cdc.parse_topic_db(raw).cache()


@pytest.fixture(scope="module")
def base_dic(spark):
    return spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)


@pytest.fixture(scope="module")
def page(spark):
    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    return log_etl.split_log(log_etl.parse_topic_log(raw))["page"].cache()


@pytest.fixture(scope="module")
def order_det(env, base_dic):
    return dwd_db.order_detail(
        dwd_db.order_pre_process(env, base_dic)
    ).cache()


@pytest.fixture(scope="module")
def dim_tables(env):
    return dims.build_dims(env)


def test_keyword_window(page):
    out = dws.traffic_source_keyword_page_view_window(page)
    rows = out.collect()
    assert all(r["source"] == "SEARCH" for r in rows)
    got = {(r["stt"], r["keyword"]): r["keyword_count"] for r in rows}
    stt = w(FX.DAY1, "10:00:30")
    assert got == {
        (stt, "apple"): 1, (stt, "iphone"): 1,
        (stt, "max"): 1, (stt, "case"): 1,
    }


def test_traffic_vc_window(page):
    uv = log_etl.unique_visitor_detail(page)
    jump = log_etl.user_jump_detail(page)
    out = dws.traffic_vc_ch_ar_is_new_page_view_window(page, uv, jump)
    rows = {
        (r["stt"], r["is_new"]): (
            r["uv_ct"], r["sv_ct"], r["pv_ct"], r["dur_sum"], r["uj_ct"]
        )
        for r in out.collect()
    }
    # M1 day1 first window: 2 pv (home, good_detail), 1 session start,
    # uv from first-of-day, durations 3000+20000
    assert rows[(w(FX.DAY1, "10:00:00"), "1")] == (1, 1, 2, 23000, 0)
    # M2's jump-out is time-shifted +10 s: 11:00:00 -> 11:00:10 window
    assert rows[(w(FX.DAY1, "11:00:10"), "0")] == (0, 0, 0, 0, 1)


def test_traffic_page_view_window(page):
    out = dws.traffic_page_view_window(page)
    got = {
        r["stt"]: (r["home_uv_ct"], r["good_detail_uv_ct"])
        for r in out.collect()
    }
    assert got[w(FX.DAY1, "10:00:00")] == (1, 1)  # M1 home + good_detail
    assert got[w(FX.DAY1, "11:00:00")] == (1, 0)  # M2
    assert got[w(FX.DAY1, "12:00:00")] == (1, 0)  # M3 (second start not first)
    assert got[w(FX.DAY2, "09:00:00")] == (1, 0)  # M1 day2


def test_login_window(page):
    out = dws.user_user_login_window(page)
    got = {r["stt"]: (r["uu_ct"], r["back_ct"]) for r in out.collect()}
    assert got[w(FX.DAY1, "10:00:00")] == (1, 0)  # U1 day1
    assert got[w(FX.DAY1, "11:00:00")] == (1, 0)  # U2
    assert got[w(FX.DAY1, "13:00:00")] == (1, 0)  # U3 day1
    assert got[w(FX.DAY12, "13:00:00")] == (1, 1)  # U3 returns after 11 days
    assert got[w(FX.DAY2, "09:00:00")] == (1, 0)  # U1 day2, 1-day gap


def test_register_window(env):
    out = dws.user_user_register_window(dwd_db.user_register(env))
    got = {r["stt"]: r["register_ct"] for r in out.collect()}
    assert got == {
        w(FX.DAY1, "08:59:50"): 1,  # U1 at 08:59:58
        w(FX.DAY1, "09:00:00"): 1,  # U2 at 09:00:01
    }


def test_cart_add_uu_window(env, base_dic):
    out = dws.trade_cart_add_uu_window(dwd_db.cart_add(env, base_dic))
    got = {r["stt"]: r["cart_add_uu_ct"] for r in out.collect()}
    # U1's second cart event same day doesn't recount
    assert got == {w(FX.DAY1, "09:30:00"): 1}


def test_payment_suc_window(env, base_dic, order_det):
    pay = dwd_db.pay_detail_suc(env, order_det, base_dic)
    out = dws.trade_payment_suc_window(pay)
    got = {
        r["stt"]: (
            r["payment_suc_unique_user_count"],
            r["payment_suc_new_user_count"],
        )
        for r in out.collect()
    }
    assert got == {
        w(FX.DAY1, "10:05:00"): (1, 1),
        w(FX.DAY1, "11:05:00"): (1, 1),
    }


def test_trade_order_window(order_det):
    out = dws.trade_order_window(order_det)
    got = {
        r["stt"]: (
            r["order_unique_user_count"],
            r["order_new_user_count"],
            r["order_activity_reduce_amount"],
            r["order_coupon_reduce_amount"],
            r["order_origin_total_amount"],
        )
        for r in out.collect()
    }
    # D1 dedup keeps the later version (coupon 5.00); origin = 2*100 + 1*50
    assert got[w(FX.DAY1, "10:01:00")] == (1, 1, 20.0, 5.0, 250.0)
    assert got[w(FX.DAY1, "11:01:00")] == (1, 1, 0.0, 0.0, 150.0)
    # U1's second-ever order day2: unique but not new
    assert got[w(FX.DAY2, "09:10:00")] == (1, 0, 0.0, 0.0, 110.0)


def test_province_order_window(order_det, dim_tables):
    out = dws.trade_province_order_window(
        order_det, dim_tables["dim_base_province"]
    )
    got = {
        (r["stt"], r["province_id"]): (
            r["province_name"], r["order_count"], r["order_amount"]
        )
        for r in out.collect()
    }
    assert got == {
        (w(FX.DAY1, "10:01:00"), "P1"): ("Beijing-2", 1, 225.0),
        (w(FX.DAY1, "11:01:00"), "P2"): ("Shanghai", 1, 150.0),
        (w(FX.DAY2, "09:10:00"), "P1"): ("Beijing-2", 1, 110.0),
    }


def test_trademark_spu_order_window(order_det, dim_tables):
    out = dws.trade_trademark_category_user_spu_order_window(
        order_det, dim_tables
    )
    got = {
        (r["stt"], r["user_id"], r["sku_id"]): (
            r["tm_name"], r["spu_name"], r["category1_name"],
            r["order_count"], r["order_amount"],
        )
        for r in out.collect()
    }
    assert got == {
        (w(FX.DAY1, "10:01:00"), "U1", "S1"):
            ("Acme", "spu one", "tech", 1, 175.0),
        (w(FX.DAY1, "10:01:00"), "U1", "S2"):
            ("Globex", "spu two", "tech", 1, 50.0),
        (w(FX.DAY1, "11:01:00"), "U2", "S2"):
            ("Globex", "spu two", "tech", 1, 150.0),
        (w(FX.DAY2, "09:10:00"), "U1", "S1"):
            ("Acme", "spu one", "tech", 1, 110.0),
    }


def test_trademark_refund_window(env, base_dic, dim_tables):
    refund = dwd_db.order_refund(env, base_dic)
    out = dws.trade_trademark_category_user_refund_window(refund, dim_tables)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["stt"] == w(FX.DAY1, "11:39:00")
    assert (r["user_id"], r["sku_id"], r["tm_name"], r["refund_count"]) == (
        "U2", "S2", "Globex", 1
    )
