"""Deterministic gmall ODS fixtures (FIXTURES.md schemas).

A small corpus that exercises every DWD/DWS code path: multi-day visits
(is_new repair, UV, 8-day back-flow), jump-outs, search keywords, dirty
rows, CDC inserts/updates with old-maps (P4/P6), duplicate changelog rows
(D1), the order join chain, coupons/favor/comment/register, dim routing
with an update (latest-wins), and the full dictionary.

Times: topic_log.ts is epoch ms; topic_db.ts is epoch seconds (string) —
FIXTURES.md conventions. All wall-times are UTC to match the test session.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

DAY1 = "2024-05-01"
DAY2 = "2024-05-02"
DAY12 = "2024-05-12"


def ms(day: str, hms: str) -> int:
    dt = datetime.strptime(f"{day} {hms}", "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp() * 1000)


def sec(day: str, hms: str) -> int:
    return ms(day, hms) // 1000


def _log(mid, page=None, uid=None, is_new="1", start=None, err=None,
         displays=None, actions=None, ts=0, vc="v1", ch="app", ar="110000"):
    rec = {
        "common": {"mid": mid, "uid": uid, "vc": vc, "ch": ch, "ar": ar,
                   "is_new": is_new},
        "ts": ts,
    }
    if page is not None:
        rec["page"] = page
    if start is not None:
        rec["start"] = start
    if err is not None:
        rec["err"] = err
    if displays is not None:
        rec["displays"] = displays
    if actions is not None:
        rec["actions"] = actions
    return json.dumps(rec)


def topic_log_rows() -> list[str]:
    rows = [
        # M1/U1 day1: session home -> good_detail (5 s later; no jump),
        # then a keyword search page; start record; displays/actions arrays
        _log("M1", uid="U1", is_new="1", start={"entry": "icon"},
             ts=ms(DAY1, "10:00:00")),
        _log("M1", uid="U1", is_new="1",
             page={"page_id": "home", "during_time": 3000},
             displays=[{"item": "S1", "item_type": "sku_id", "pos_id": "1"},
                       {"item": "S2", "item_type": "sku_id", "pos_id": "2"}],
             actions=[{"action_id": "fav", "item": "S1",
                       "ts": ms(DAY1, "10:00:02")}],
             ts=ms(DAY1, "10:00:01")),
        _log("M1", uid="U1", is_new="1",
             page={"page_id": "good_detail", "last_page_id": "home",
                   "during_time": 20000},
             ts=ms(DAY1, "10:00:06")),
        _log("M1", uid="U1", is_new="1",
             page={"page_id": "search", "last_page_id": "good_detail",
                   "during_time": 1000},
             ts=ms(DAY1, "10:00:30")),
        _log("M1", uid="U1", is_new="1",
             page={"page_id": "good_list", "last_page_id": "search",
                   "item": "apple iphone max case", "item_type": "keyword",
                   "during_time": 5000},
             ts=ms(DAY1, "10:00:31")),
        # M1/U1 day2: claims is_new=1 again -> must repair to 0
        _log("M1", uid="U1", is_new="1",
             page={"page_id": "home", "during_time": 1000},
             ts=ms(DAY2, "09:00:00")),
        # M2/U2 day1: single home view (dangling -> jump-out); err record
        _log("M2", uid="U2", is_new="0",
             page={"page_id": "home", "during_time": 2000},
             ts=ms(DAY1, "11:00:00")),
        _log("M2", uid="U2", is_new="0", err={"error_code": "1023"},
             page={"page_id": "home", "last_page_id": "home",
                   "during_time": 100},
             ts=ms(DAY1, "11:05:00")),
        # M3 (no uid) day1: two session starts 8 s apart -> first jumps
        # (followed by another start), second jumps (dangling)
        _log("M3", is_new="1",
             page={"page_id": "home", "during_time": 500},
             ts=ms(DAY1, "12:00:00")),
        _log("M3", is_new="1",
             page={"page_id": "home", "during_time": 700},
             ts=ms(DAY1, "12:00:08")),
        # U3 login on day1 and day12 (11-day gap -> back-flow)
        _log("M4", uid="U3", is_new="0",
             page={"page_id": "home", "during_time": 900},
             ts=ms(DAY1, "13:00:00")),
        _log("M4", uid="U3", is_new="0",
             page={"page_id": "login", "last_page_id": "home",
                   "during_time": 400},
             ts=ms(DAY12, "13:00:00")),
        # dirty row
        "not-json{{{",
    ]
    return rows


# canonical CEP fixture, verbatim ts values
# (DwdTrafficUserJumpDetail.java:76-83)
CEP_FIXTURE = [
    json.dumps({"common": {"mid": "101"},
                "page": {"page_id": "home"}, "ts": 10000}),
    json.dumps({"common": {"mid": "102"},
                "page": {"page_id": "home"}, "ts": 12000}),
    json.dumps({"common": {"mid": "102"},
                "page": {"page_id": "good_list", "last_page_id": "home"},
                "ts": 15000}),
    json.dumps({"common": {"mid": "102"},
                "page": {"page_id": "good_list", "last_page_id": "detail"},
                "ts": 30000}),
]


def _db(table, type_, data, old=None, ts=0):
    return json.dumps(
        {"database": "gmall", "table": table, "type": type_, "data": data,
         "old": old, "ts": str(ts)}
    )


def topic_db_rows() -> list[str]:
    r = []
    t = lambda hms, day=DAY1: sec(day, hms)  # noqa: E731

    # ---- orders: O1 (U1, P1, details D1 dup + D2), O2 (U2, P2, D3),
    #      O3 (U1, P1, D4 on day2)
    r += [
        _db("order_info", "insert",
            {"id": "O1", "user_id": "U1", "province_id": "P1",
             "operate_time": f"{DAY1} 10:01:00", "order_status": "1001"},
            ts=t("10:01:00")),
        _db("order_info", "update",
            {"id": "O1", "user_id": "U1", "province_id": "P1",
             "operate_time": f"{DAY1} 10:02:00", "order_status": "1002"},
            old={"order_status": "1001"}, ts=t("10:02:00")),
        _db("order_info", "update",
            {"id": "O1", "user_id": "U1", "province_id": "P1",
             "operate_time": f"{DAY1} 10:30:00", "order_status": "1003"},
            old={"order_status": "1002"}, ts=t("10:30:00")),
        _db("order_info", "insert",
            {"id": "O2", "user_id": "U2", "province_id": "P2",
             "operate_time": f"{DAY1} 11:01:00", "order_status": "1001"},
            ts=t("11:01:00")),
        _db("order_info", "update",
            {"id": "O2", "user_id": "U2", "province_id": "P2",
             "operate_time": f"{DAY1} 11:40:00", "order_status": "1005"},
            old={"order_status": "1002"}, ts=t("11:40:00")),
        _db("order_info", "insert",
            {"id": "O3", "user_id": "U1", "province_id": "P1",
             "operate_time": f"{DAY2} 09:10:00", "order_status": "1001"},
            ts=t("09:10:00", DAY2)),
    ]
    d1 = {"id": "D1", "order_id": "O1", "sku_id": "S1", "sku_name": "sku one",
          "create_time": f"{DAY1} 10:01:00", "source_id": "SRC1",
          "source_type": "2401", "sku_num": "2", "order_price": "100.00",
          "split_total_amount": "180.00", "split_activity_amount": "20.00",
          "split_coupon_amount": "0.00"}
    d1b = dict(d1, split_total_amount="175.00", split_coupon_amount="5.00")
    r += [
        _db("order_detail", "insert", d1, ts=t("10:01:00")),
        # duplicate changelog row for D1 (upsert re-emit) — later ts wins
        _db("order_detail", "insert", d1b, ts=t("10:01:05")),
        _db("order_detail", "insert",
            {"id": "D2", "order_id": "O1", "sku_id": "S2",
             "sku_name": "sku two", "create_time": f"{DAY1} 10:01:00",
             "source_id": "SRC1", "source_type": "2401", "sku_num": "1",
             "order_price": "50.00", "split_total_amount": "50.00",
             "split_activity_amount": "0.00", "split_coupon_amount": "0.00"},
            ts=t("10:01:00")),
        _db("order_detail", "insert",
            {"id": "D3", "order_id": "O2", "sku_id": "S2",
             "sku_name": "sku two", "create_time": f"{DAY1} 11:01:00",
             "source_id": "SRC2", "source_type": "2402", "sku_num": "3",
             "order_price": "50.00", "split_total_amount": "150.00",
             "split_activity_amount": "0.00", "split_coupon_amount": "0.00"},
            ts=t("11:01:00")),
        _db("order_detail", "insert",
            {"id": "D4", "order_id": "O3", "sku_id": "S1",
             "sku_name": "sku one", "create_time": f"{DAY2} 09:10:00",
             "source_id": "SRC1", "source_type": "2401", "sku_num": "1",
             "order_price": "110.00", "split_total_amount": "110.00",
             "split_activity_amount": "0.00", "split_coupon_amount": "0.00"},
            ts=t("09:10:00", DAY2)),
        _db("order_detail_activity", "insert",
            {"order_detail_id": "D1", "activity_id": "A1",
             "activity_rule_id": "AR1"}, ts=t("10:01:00")),
        _db("order_detail_coupon", "insert",
            {"order_detail_id": "D2", "coupon_id": "C1"}, ts=t("10:01:00")),
    ]
    # ---- payments
    r += [
        _db("payment_info", "insert",
            {"user_id": "U1", "order_id": "O1", "payment_type": "1101",
             "callback_time": f"{DAY1} 10:05:00"}, ts=t("10:05:00")),
        _db("payment_info", "insert",
            {"user_id": "U2", "order_id": "O2", "payment_type": "1102",
             "callback_time": f"{DAY1} 11:05:00"}, ts=t("11:05:00")),
    ]
    # ---- cart: insert, growth update (delta 3), non-growth update
    r += [
        _db("cart_info", "insert",
            {"id": "CA1", "user_id": "U1", "sku_id": "S1",
             "source_id": "SRC1", "source_type": "2401", "sku_num": "2"},
            ts=t("09:30:00")),
        _db("cart_info", "update",
            {"id": "CA1", "user_id": "U1", "sku_id": "S1",
             "source_id": "SRC1", "source_type": "2401", "sku_num": "5"},
            old={"sku_num": "2"}, ts=t("09:35:00")),
        _db("cart_info", "update",
            {"id": "CA2", "user_id": "U2", "sku_id": "S2",
             "source_id": "SRC2", "source_type": "2402", "sku_num": "1"},
            old={"source_id": "SRC1"}, ts=t("09:40:00")),
    ]
    # ---- refunds for O2/S2
    r += [
        _db("order_refund_info", "insert",
            {"id": "R1", "user_id": "U2", "order_id": "O2", "sku_id": "S2",
             "refund_type": "1501", "refund_num": "3",
             "refund_amount": "150.00", "refund_reason_type": "1301",
             "refund_reason_txt": "bad", "create_time": f"{DAY1} 11:39:00"},
            ts=t("11:39:00")),
        _db("refund_payment", "insert",
            {"id": "RP1", "order_id": "O2", "sku_id": "S2",
             "payment_type": "1102", "callback_time": f"{DAY1} 11:45:00",
             "total_amount": "150.00", "refund_status": "0702"},
            ts=t("11:45:00")),
    ]
    # ---- coupons: CU1 get -> order (using_time) -> pay (used_time);
    #      CU2 update not touching using_time
    r += [
        _db("coupon_use", "insert",
            {"id": "CU1", "coupon_id": "C1", "user_id": "U1",
             "get_time": f"{DAY1} 09:00:00"}, ts=t("09:00:00")),
        _db("coupon_use", "update",
            {"id": "CU1", "coupon_id": "C1", "user_id": "U1",
             "order_id": "O1", "using_time": f"{DAY1} 10:01:00"},
            old={"using_time": None}, ts=t("10:01:00")),
        _db("coupon_use", "update",
            {"id": "CU1", "coupon_id": "C1", "user_id": "U1",
             "order_id": "O1", "used_time": f"{DAY1} 10:05:00"},
            old={"used_time": None}, ts=t("10:05:00")),
        _db("coupon_use", "insert",
            {"id": "CU2", "coupon_id": "C2", "user_id": "U2",
             "get_time": f"{DAY1} 09:10:00"}, ts=t("09:10:00")),
        _db("coupon_use", "update",
            {"id": "CU2", "coupon_id": "C2", "user_id": "U2",
             "order_id": "O2"}, old={"order_id": None}, ts=t("11:01:00")),
    ]
    # ---- interaction + user
    r += [
        _db("favor_info", "insert",
            {"id": "F1", "user_id": "U1", "sku_id": "S1",
             "create_time": f"{DAY1} 10:00:03"}, ts=t("10:00:03")),
        _db("comment_info", "insert",
            {"id": "CM1", "user_id": "U2", "sku_id": "S2",
             "order_id": "O2", "create_time": f"{DAY1} 12:00:00",
             "appraise": "1201"}, ts=t("12:00:00")),
        _db("user_info", "insert",
            {"id": "U1", "create_time": f"{DAY1} 08:59:58"},
            ts=t("08:59:58")),
        _db("user_info", "insert",
            {"id": "U2", "create_time": f"{DAY1} 09:00:01"},
            ts=t("09:00:01")),
    ]
    # ---- dims (routed); P1 renamed by a later update (latest wins)
    r += [
        _db("base_province", "insert", {"id": "P1", "name": "Beijing"},
            ts=t("00:00:01")),
        _db("base_province", "insert", {"id": "P2", "name": "Shanghai"},
            ts=t("00:00:02")),
        _db("base_province", "update", {"id": "P1", "name": "Beijing-2"},
            old={"name": "Beijing"}, ts=t("00:10:00")),
        _db("sku_info", "insert",
            {"id": "S1", "tm_id": "TM1", "category3_id": "C3",
             "spu_id": "SP1", "sku_name": "sku one"}, ts=t("00:00:03")),
        _db("sku_info", "insert",
            {"id": "S2", "tm_id": "TM2", "category3_id": "C3",
             "spu_id": "SP2", "sku_name": "sku two"}, ts=t("00:00:04")),
        _db("spu_info", "insert", {"id": "SP1", "spu_name": "spu one"},
            ts=t("00:00:05")),
        _db("spu_info", "insert", {"id": "SP2", "spu_name": "spu two"},
            ts=t("00:00:06")),
        _db("base_trademark", "insert", {"id": "TM1", "tm_name": "Acme"},
            ts=t("00:00:07")),
        _db("base_trademark", "insert", {"id": "TM2", "tm_name": "Globex"},
            ts=t("00:00:08")),
        _db("base_category3", "insert",
            {"id": "C3", "name": "phones", "category2_id": "C2"},
            ts=t("00:00:09")),
        _db("base_category2", "insert",
            {"id": "C2", "name": "electronics", "category1_id": "CT1"},
            ts=t("00:00:10")),
        _db("base_category1", "insert", {"id": "CT1", "name": "tech"},
            ts=t("00:00:11")),
        # bootstrap rows must be dropped
        _db("base_province", "bootstrap-start", {}, ts=t("00:00:00")),
        _db("base_province", "bootstrap-complete", {}, ts=t("00:00:30")),
    ]
    return r


BASE_DIC = [
    ("1001", "pending"), ("1002", "paid"), ("1003", "cancelled"),
    ("1004", "shipped"), ("1005", "refunding"), ("1006", "refunded"),
    ("1101", "alipay"), ("1102", "wechat"), ("1103", "bank"),
    ("1201", "good"), ("1301", "quality"), ("1501", "refund-only"),
    ("2401", "promo"), ("2402", "search"),
]


def base_dic_rows():
    return [
        {"dic_code": c, "dic_name": n, "parent_code": "0"}
        for c, n in BASE_DIC
    ]
