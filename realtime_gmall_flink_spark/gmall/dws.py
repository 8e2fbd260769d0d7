"""DWS layer: the 11 windowed summary tables (reference: app/dws/*,
SURVEY section 2.9). All 10 s tumbling event-time windows with stt/edt.

Reference bugs are NOT replicated (SURVEY 4.1): the traffic reduce sums
field-wise as documented, page_Id typo fixed, the unfinished cart-add-UU
job is completed per its doc comment, dedup compares real row_op_ts.

Amounts arrive as strings (CDC envelope fidelity); they are cast to
decimal(16,2) for exact summation and surfaced as double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize
from ..operators.dedup import latest_row_per_key
from ..operators.joins import dim_cascade
from ..operators.visitor import first_per_period, first_visit_repair, gap_flag
from ..operators.windows import tumble_agg

WINDOW = "10 seconds"


def _dsum(col: str) -> F.Column:
    return F.sum(F.col(col).cast("decimal(16,2)")).cast("double")


def _evt(df: DataFrame, ms_col: str = "ts") -> DataFrame:
    """epoch-ms long -> event_time timestamp (log side)."""
    return df.withColumn("event_time", F.timestamp_millis(F.col(ms_col)))


def _evt_sec(df: DataFrame, sec_col: str = "ts") -> DataFrame:
    """epoch-seconds string -> event_time (db side; DWS jobs multiply by
    1000, DwsTradeOrderWindow.java:173)."""
    return df.withColumn(
        "event_time", F.timestamp_seconds(F.col(sec_col).cast("long"))
    )


# ---------------------------------------------------------------------------
# 1. keyword window (F1/A5; DwsTrafficSourceKeywordPageViewWindow)
def traffic_source_keyword_page_view_window(page: DataFrame) -> DataFrame:
    search = page.filter(
        (F.col("page.last_page_id") == "search")
        & (F.col("page.item_type") == "keyword")
        & F.col("page.item").isNotNull()
    )
    words = _evt(search).select(
        "event_time",
        F.explode(tokenize(F.col("page.item"))).alias("keyword"),
    )
    out = tumble_agg(
        words,
        "event_time",
        WINDOW,
        ["keyword"],
        {"keyword_count": F.count(F.lit(1))},
    )
    return out.withColumn("source", F.lit("SEARCH"))


# ---------------------------------------------------------------------------
# 2. vc/ch/ar/is_new multi-measure window (A1/U1/W6;
#    DwsTrafficVcChArIsNewPageViewWindow — field-wise sum per intent)
def traffic_vc_ch_ar_is_new_page_view_window(
    page: DataFrame, uv: DataFrame, jump: DataFrame
) -> DataFrame:
    dims = [
        F.col("common.vc").alias("vc"),
        F.col("common.ch").alias("ch"),
        F.col("common.ar").alias("ar"),
        F.col("common.is_new").alias("is_new"),
    ]

    pv = _evt(page).select(
        *dims,
        "event_time",
        F.lit(0).alias("uv_ct"),
        F.when(F.col("page.last_page_id").isNull(), 1)
        .otherwise(0)
        .alias("sv_ct"),
        F.lit(1).alias("pv_ct"),
        F.coalesce(F.col("page.during_time"), F.lit(0)).alias("dur_sum"),
        F.lit(0).alias("uj_ct"),
    )
    uvb = _evt(uv).select(
        *dims,
        "event_time",
        F.lit(1).alias("uv_ct"),
        F.lit(0).alias("sv_ct"),
        F.lit(0).alias("pv_ct"),
        F.lit(0).cast("long").alias("dur_sum"),
        F.lit(0).alias("uj_ct"),
    )
    # W6: jump rows shift event time +10 s so the timeout lands in the
    # window where it fired (DwsTrafficVcChArIsNewPageViewWindow.java:146)
    jb = _evt(jump).select(
        *dims,
        (F.col("event_time") + F.expr("INTERVAL 10 SECONDS")).alias(
            "event_time"
        ),
        F.lit(0).alias("uv_ct"),
        F.lit(0).alias("sv_ct"),
        F.lit(0).alias("pv_ct"),
        F.lit(0).cast("long").alias("dur_sum"),
        F.lit(1).alias("uj_ct"),
    )
    unioned = pv.unionByName(uvb).unionByName(jb)
    return tumble_agg(
        unioned,
        "event_time",
        WINDOW,
        ["vc", "ch", "ar", "is_new"],
        {
            "uv_ct": F.sum("uv_ct"),
            "sv_ct": F.sum("sv_ct"),
            "pv_ct": F.sum("pv_ct"),
            "dur_sum": F.sum("dur_sum"),
            "uj_ct": F.sum("uj_ct"),
        },
    )


# ---------------------------------------------------------------------------
# 3. home/good_detail UV window (A2; DwsTrafficPageViewWindow, page_id typo
#    fixed per intent)
def traffic_page_view_window(page: DataFrame) -> DataFrame:
    filtered = page.filter(
        F.col("page.page_id").isin("home", "good_detail")
    )
    daily_first = first_per_period(
        _evt(filtered).withColumn("mid", F.col("common.mid")).withColumn(
            "page_id", F.col("page.page_id")
        ),
        "mid",
        "event_time",
        period=F.struct(
            F.to_date("event_time"), F.col("page_id")
        ),
        tiebreak=("ts",),
    )
    return tumble_agg(
        daily_first,
        "event_time",
        WINDOW,
        [],
        {
            "home_uv_ct": F.sum(
                F.when(F.col("page_id") == "home", 1).otherwise(0)
            ),
            "good_detail_uv_ct": F.sum(
                F.when(F.col("page_id") == "good_detail", 1).otherwise(0)
            ),
        },
    )


# ---------------------------------------------------------------------------
# 4. login window (A6 gap; DwsUserUserLoginWindow — >=8-day back-flow per
#    code behavior)
def user_user_login_window(page: DataFrame) -> DataFrame:
    logins = page.filter(
        F.col("common.uid").isNotNull()
        & (
            F.col("page.last_page_id").isNull()
            | (F.col("page.page_id") == "login")
        )
    )
    with_cols = _evt(logins).withColumn("uid", F.col("common.uid"))
    daily = first_per_period(with_cols, "uid", "event_time", tiebreak=("ts",))
    flagged = gap_flag(daily, "uid", "event_time", min_gap_days=8)
    return tumble_agg(
        flagged,
        "event_time",
        WINDOW,
        [],
        {
            "uu_ct": F.count(F.lit(1)),
            "back_ct": F.sum("is_back"),
        },
    )


# ---------------------------------------------------------------------------
# 5. register window (A3; DwsUserUserRegisterWindow)
def user_user_register_window(register: DataFrame) -> DataFrame:
    rows = register.withColumn(
        "event_time", F.to_timestamp("create_time")
    )
    return tumble_agg(
        rows, "event_time", WINDOW, [], {"register_ct": F.count(F.lit(1))}
    )


# ---------------------------------------------------------------------------
# 6. cart-add unique users (completed per doc intent,
#    DwsTradeCartAddUuWindow.java:22-36)
def trade_cart_add_uu_window(cart: DataFrame) -> DataFrame:
    rows = _evt_sec(cart)
    daily_first = first_per_period(
        rows, "user_id", "event_time", tiebreak=("id",)
    )
    return tumble_agg(
        daily_first,
        "event_time",
        WINDOW,
        [],
        {"cart_add_uu_ct": F.count(F.lit(1))},
    )


# ---------------------------------------------------------------------------
# 7. payment success window (A4/A6; DwsTradePaymentSucWindow)
def trade_payment_suc_window(pay: DataFrame) -> DataFrame:
    rows = pay.withColumn(
        "event_time", F.to_timestamp("callback_time")
    ).withColumn("pay_user_id", F.col("pay_user_id"))
    first_today = first_per_period(
        rows, "pay_user_id", "event_time", tiebreak=("order_id",)
    )
    overall_first = first_visit_repair(
        first_today, "pay_user_id", "event_time", "is_first_ever"
    )
    return tumble_agg(
        overall_first,
        "event_time",
        WINDOW,
        [],
        {
            "payment_suc_unique_user_count": F.count(F.lit(1)),
            "payment_suc_new_user_count": F.sum("is_first_ever"),
        },
    )


# ---------------------------------------------------------------------------
# 8. order window (D1+A6+A4; DwsTradeOrderWindow)
def trade_order_window(order_det: DataFrame) -> DataFrame:
    deduped = latest_row_per_key(
        order_det, keys=("id",), order_by=("row_op_ts", "ts")
    )
    rows = _evt_sec(deduped)
    per_user_first = first_per_period(
        rows, "user_id", "event_time", tiebreak=("id",)
    ).withColumn("__daily_first", F.lit(1))
    flagged = first_visit_repair(
        per_user_first, "user_id", "event_time", "is_first_ever"
    )
    user_counts = tumble_agg(
        flagged,
        "event_time",
        WINDOW,
        [],
        {
            "order_unique_user_count": F.count(F.lit(1)),
            "order_new_user_count": F.sum("is_first_ever"),
        },
    )
    amounts = tumble_agg(
        rows,
        "event_time",
        WINDOW,
        [],
        {
            "order_activity_reduce_amount": _dsum("split_activity_amount"),
            "order_coupon_reduce_amount": _dsum("split_coupon_amount"),
            "order_origin_total_amount": F.sum(
                F.col("sku_num").cast("decimal(16,2)")
                * F.col("order_price").cast("decimal(16,2)")
            ).cast("double"),
        },
    )
    return user_counts.join(amounts, ["stt", "edt"], "full").na.fill(
        0,
        [
            "order_unique_user_count",
            "order_new_user_count",
            "order_activity_reduce_amount",
            "order_coupon_reduce_amount",
            "order_origin_total_amount",
        ],
    )


# ---------------------------------------------------------------------------
# 9. province order window (A7 + post-agg dim join;
#    DwsTradeProvinceOrderWindow)
def trade_province_order_window(
    order_det: DataFrame, dim_base_province: DataFrame
) -> DataFrame:
    deduped = latest_row_per_key(
        order_det, keys=("id",), order_by=("row_op_ts", "ts")
    )
    agg = tumble_agg(
        _evt_sec(deduped),
        "event_time",
        WINDOW,
        ["province_id"],
        {
            "order_count": F.countDistinct("order_id"),
            "order_amount": _dsum("split_total_amount"),
        },
    )
    dim = dim_base_province.select(
        F.col("id").alias("__pid"), F.col("name").alias("province_name")
    )
    return (
        agg.join(
            F.broadcast(dim), agg["province_id"] == F.col("__pid"), "left"
        )
        .drop("__pid")
    )


# ---------------------------------------------------------------------------
# 10. trademark/category/user/spu order window (J5 cascade;
#     DwsTradeTrademarkCategoryUserSpuOrderWindow)
def trade_trademark_category_user_spu_order_window(
    order_det: DataFrame, dims: dict[str, DataFrame]
) -> DataFrame:
    deduped = latest_row_per_key(
        order_det, keys=("id",), order_by=("row_op_ts", "ts")
    )
    agg = tumble_agg(
        _evt_sec(deduped),
        "event_time",
        WINDOW,
        ["user_id", "sku_id"],
        {
            "order_count": F.countDistinct("order_id"),
            "order_amount": _dsum("split_total_amount"),
        },
    )
    return tm_spu_cascade(agg, dims)


def tm_spu_cascade(agg: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """The 6-hop enrichment of the spu order window — shared between the
    batch twin and the streaming sink (streaming/dws_jobs)."""
    return dim_cascade(
        agg,
        [
            (dims["dim_sku_info"], "sku_id", "id",
             [("tm_id", "tm_id"), ("category3_id", "category3_id"),
              ("spu_id", "spu_id")]),
            (dims["dim_spu_info"], "spu_id", "id",
             [("spu_name", "spu_name")]),
            (dims["dim_base_trademark"], "tm_id", "id",
             [("tm_name", "tm_name")]),
            (dims["dim_base_category3"], "category3_id", "id",
             [("name", "category3_name"), ("category2_id", "category2_id")]),
            (dims["dim_base_category2"], "category2_id", "id",
             [("name", "category2_name"), ("category1_id", "category1_id")]),
            (dims["dim_base_category1"], "category1_id", "id",
             [("name", "category1_name")]),
        ],
    )


# ---------------------------------------------------------------------------
# 11. trademark/category/user refund window (J5 cascade minus spu;
#     DwsTradeTrademarkCategoryUserRefundWindow)
def trade_trademark_category_user_refund_window(
    refund: DataFrame, dims: dict[str, DataFrame]
) -> DataFrame:
    agg = tumble_agg(
        _evt_sec(refund),
        "event_time",
        WINDOW,
        ["user_id", "sku_id"],
        {"refund_count": F.countDistinct("order_id")},
    )
    return tm_refund_cascade(agg, dims)


def tm_refund_cascade(
    agg: DataFrame, dims: dict[str, DataFrame]
) -> DataFrame:
    """The 5-hop enrichment of the refund window — shared between the
    batch twin and the streaming sink (streaming/dws_jobs)."""
    return dim_cascade(
        agg,
        [
            (dims["dim_sku_info"], "sku_id", "id",
             [("tm_id", "tm_id"), ("category3_id", "category3_id")]),
            (dims["dim_base_trademark"], "tm_id", "id",
             [("tm_name", "tm_name")]),
            (dims["dim_base_category3"], "category3_id", "id",
             [("name", "category3_name"), ("category2_id", "category2_id")]),
            (dims["dim_base_category2"], "category2_id", "id",
             [("name", "category2_name"), ("category1_id", "category1_id")]),
            (dims["dim_base_category1"], "category1_id", "id",
             [("name", "category1_name")]),
        ],
    )
