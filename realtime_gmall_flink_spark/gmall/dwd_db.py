"""DWD db-side fact tables (reference: app/dwd/db/*, 13 jobs).

Each function: (parsed topic_db envelope [, base_dic dim]) -> fact
DataFrame, mirroring one reference job's output topic. Implemented with the
generic CDC extractor + Catalyst joins; the temporal `FOR SYSTEM_TIME AS OF`
lookups (J3/J4) become broadcast joins of the dict table.

``row_op_ts`` (D2): the reference stamps current_row_timestamp() at derive
time; we use the envelope's own ts (deterministic, and strictly ordered per
change) so downstream latest-row dedup (D1) is reproducible in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import lookup_join
from .cdc import cdc_extract, old_has_key, old_value

_DIC_ATTRS = lambda alias: [("dic_name", alias)]  # noqa: E731


def _with_date_id(df: DataFrame, src: str = "create_time") -> DataFrame:
    return df.withColumn("date_id", F.substring(F.col(src), 1, 10))


def _row_op_ts(df: DataFrame) -> DataFrame:
    # envelope ts is epoch-seconds (string); keep a sortable long version
    return df.withColumn("row_op_ts", F.col("ts").cast("long"))


# ---------------------------------------------------------------------------
# trade: order pre-process (J1/J2/J3; DwdTradeOrderPreProcess.java:38-217)
def _extract_od(env: DataFrame) -> DataFrame:
    return _row_op_ts(_with_date_id(cdc_extract(
        env,
        "order_detail",
        ["insert"],
        [
            "id", "order_id", "sku_id", "sku_name", "create_time",
            "source_id", "source_type", "sku_num", "order_price",
            "split_total_amount", "split_activity_amount",
            "split_coupon_amount",
        ],
        keep_meta=True,
    ).drop("type", "old")))


def _extract_oi(env: DataFrame) -> DataFrame:
    return cdc_extract(
        env,
        "order_info",
        ["insert", "update"],
        ["id", "user_id", "province_id", "operate_time", "order_status"],
        keep_meta=True,
    ).select(
        F.col("id").alias("order_id_oi"),
        "user_id",
        "province_id",
        "operate_time",
        "order_status",
        F.col("type").alias("order_type"),
        F.col("old").alias("order_old"),
    )


def _extract_oda(env: DataFrame) -> DataFrame:
    return cdc_extract(
        env,
        "order_detail_activity",
        ["insert"],
        ["order_detail_id", "activity_id", "activity_rule_id"],
    ).withColumnRenamed("order_detail_id", "oda_detail_id")


def _extract_odc(env: DataFrame) -> DataFrame:
    return cdc_extract(
        env,
        "order_detail_coupon",
        ["insert"],
        ["order_detail_id", "coupon_id"],
    ).withColumnRenamed("order_detail_id", "odc_detail_id")


def order_pre_process(env: DataFrame, base_dic: DataFrame) -> DataFrame:
    od = _extract_od(env)
    oi = _extract_oi(env)
    oda = _extract_oda(env)
    odc = _extract_odc(env)

    joined = (
        od.join(oi, od["order_id"] == oi["order_id_oi"], "inner")
        .join(oda, od["id"] == oda["oda_detail_id"], "left")
        .join(odc, od["id"] == odc["odc_detail_id"], "left")
        .drop("order_id_oi", "oda_detail_id", "odc_detail_id")
    )
    return lookup_join(
        joined, base_dic, "source_type", "dic_code",
        _DIC_ATTRS("source_type_name"),
    )


def order_pre_process_bucketed(
    spark,
    env: DataFrame,
    base_dic: DataFrame,
    buckets: int = 32,
    prefix: str = "bkt_",
) -> DataFrame:
    """order_pre_process with the od x oi fact-to-fact join co-located by
    bucketing (NOTES.md item 1; the batch analog of the reference pinning
    parallelism to Kafka partitions so keyed state never re-shuffles).

    Both CDC extracts are persisted bucketed by order_id with the same
    bucket count, so Catalyst plans the big join as a SortMergeJoin with
    NO shuffle Exchange on either side — at 100 TB this removes the
    dominant shuffle of the nightly fact join. The small sides (activity,
    coupon, dic) join via broadcast, which adds no shuffle either.
    """
    from pyspark.sql.functions import broadcast

    from ..sources.lakehouse import write_bucketed

    od = _extract_od(env)
    # rename the oi key to the od-side name so both tables bucket AND join
    # on the identical column list (the on=["order_id"] equi-join form)
    oi = _extract_oi(env).withColumnRenamed("order_id_oi", "order_id")
    write_bucketed(od, f"{prefix}od", ["order_id"], buckets=buckets)
    write_bucketed(oi, f"{prefix}oi", ["order_id"], buckets=buckets)
    odb = spark.table(f"{prefix}od")
    oib = spark.table(f"{prefix}oi")

    joined = (
        odb.join(oib, ["order_id"], "inner")
        .join(
            broadcast(_extract_oda(env)),
            odb["id"] == F.col("oda_detail_id"),
            "left",
        )
        .join(
            broadcast(_extract_odc(env)),
            odb["id"] == F.col("odc_detail_id"),
            "left",
        )
        .drop("oda_detail_id", "odc_detail_id")
    )
    return lookup_join(
        joined, base_dic, "source_type", "dic_code",
        _DIC_ATTRS("source_type_name"),
    )


def order_detail(pre: DataFrame) -> DataFrame:
    """dwd_trade_order_detail: insert rows of the pre-process changelog
    (DwdTradeOrderDetail.java:49-141)."""
    return pre.filter(F.col("order_type") == "insert").drop(
        "order_type", "order_old"
    )


def cancel_detail(pre: DataFrame) -> DataFrame:
    """dwd_trade_cancel_detail: order flips to cancelled (1003) — P4
    changed-column predicate (DwdTradeCancelDetail.java:110-112)."""
    return pre.filter(
        (F.col("order_type") == "update")
        & (F.col("order_status") == "1003")
        & F.col("order_old")["order_status"].isNotNull()
    ).drop("order_type", "order_old")


# ---------------------------------------------------------------------------
def pay_detail_suc(
    env: DataFrame, order_det: DataFrame, base_dic: DataFrame
) -> DataFrame:
    """dwd_trade_pay_detail_suc (DwdTradePayDetailSuc.java:92-168):
    successful payments joined to (deduped) order detail + dict decode."""
    pay = cdc_extract(
        env,
        "payment_info",
        ["insert"],
        ["user_id", "order_id", "payment_type", "callback_time"],
    ).select(
        F.col("user_id").alias("pay_user_id"),
        F.col("order_id").alias("pay_order_id"),
        "payment_type",
        "callback_time",
    )
    pay = lookup_join(
        pay, base_dic, "payment_type", "dic_code",
        _DIC_ATTRS("payment_type_name"),
    )
    return pay.join(
        order_det, pay["pay_order_id"] == order_det["order_id"], "inner"
    ).drop("pay_order_id")


# ---------------------------------------------------------------------------
def cart_add(env: DataFrame, base_dic: DataFrame) -> DataFrame:
    """dwd_trade_cart_add (DwdTradeCartAdd.java:76-132): inserts, or updates
    that increased sku_num; emitted sku_num is the delta (P5)."""
    grew = (
        (F.col("type") == "update")
        & old_has_key("sku_num")
        & (
            F.col("data")["sku_num"].cast("long")
            > old_value("sku_num").cast("long")
        )
    )
    rows = cdc_extract(
        env,
        "cart_info",
        ["insert", "update"],
        ["id", "user_id", "sku_id", "source_id", "source_type", "sku_num"],
        extra=(F.col("type") == "insert") | grew,
        keep_meta=True,
    )
    delta = F.when(F.col("type") == "insert", F.col("sku_num")).otherwise(
        (
            F.col("sku_num").cast("long")
            - F.col("old")["sku_num"].cast("long")
        ).cast("string")
    )
    return (
        rows.withColumn("sku_num", delta)
        .drop("type", "old")
        .transform(
            lambda d: lookup_join(
                d, base_dic, "source_type", "dic_code",
                _DIC_ATTRS("source_type_name"),
            )
        )
    )


# ---------------------------------------------------------------------------
def order_refund(env: DataFrame, base_dic: DataFrame) -> DataFrame:
    """dwd_trade_order_refund (DwdTradeOrderRefund.java:69-158): refund
    requests x order flips to 1005, same dict joined twice (J4)."""
    ref = cdc_extract(
        env,
        "order_refund_info",
        ["insert"],
        [
            "id", "user_id", "order_id", "sku_id", "refund_type",
            "refund_num", "refund_amount", "refund_reason_type",
            "refund_reason_txt", "create_time",
        ],
        keep_meta=True,
    ).drop("type", "old")
    oi = cdc_extract(
        env,
        "order_info",
        ["update"],
        ["id", "province_id"],
        extra=(F.col("data")["order_status"] == "1005")
        & old_value("order_status").isNotNull(),
    ).select(F.col("id").alias("oi_id"), "province_id")
    out = ref.join(oi, ref["order_id"] == oi["oi_id"], "inner").drop("oi_id")
    out = lookup_join(
        out, base_dic, "refund_type", "dic_code",
        _DIC_ATTRS("refund_type_name"),
    )
    return lookup_join(
        out, base_dic, "refund_reason_type", "dic_code",
        _DIC_ATTRS("refund_reason_type_name"),
    )


def refund_pay_suc(env: DataFrame, base_dic: DataFrame) -> DataFrame:
    """dwd_trade_refund_pay_suc (DwdTradeRefundPaySun.java:67-166):
    successful refund payments x refund info x order info (4-way + dict)."""
    rp = cdc_extract(
        env,
        "refund_payment",
        ["insert", "update"],
        [
            "id", "order_id", "sku_id", "payment_type", "callback_time",
            "total_amount",
        ],
        extra=F.col("data")["refund_status"] == "0702",
    ).select(
        "id",
        F.col("order_id").alias("rp_order_id"),
        F.col("sku_id").alias("rp_sku_id"),
        "payment_type",
        "callback_time",
        "total_amount",
    )
    ri = cdc_extract(
        env,
        "order_refund_info",
        ["insert", "update"],
        ["order_id", "sku_id", "refund_num"],
    ).select(
        F.col("order_id").alias("ri_order_id"),
        F.col("sku_id").alias("ri_sku_id"),
        "refund_num",
    )
    oi = cdc_extract(
        env,
        "order_info",
        ["insert", "update"],
        ["id", "user_id", "province_id"],
    ).select(
        F.col("id").alias("oi_id"), "user_id", "province_id"
    ).dropDuplicates(["oi_id"])
    out = (
        rp.join(
            ri,
            (rp["rp_order_id"] == ri["ri_order_id"])
            & (rp["rp_sku_id"] == ri["ri_sku_id"]),
            "inner",
        )
        .join(oi, rp["rp_order_id"] == oi["oi_id"], "inner")
        .select(
            "id",
            F.col("rp_order_id").alias("order_id"),
            F.col("rp_sku_id").alias("sku_id"),
            "payment_type",
            "callback_time",
            "total_amount",
            "refund_num",
            "user_id",
            "province_id",
        )
    )
    return lookup_join(
        out, base_dic, "payment_type", "dic_code",
        _DIC_ATTRS("payment_type_name"),
    )


# ---------------------------------------------------------------------------
# tool: coupons (DwdToolCouponGet/Order/Pay)
def coupon_get(env: DataFrame) -> DataFrame:
    return cdc_extract(
        env,
        "coupon_use",
        ["insert"],
        ["id", "coupon_id", "user_id", "get_time"],
        keep_meta=True,
    ).drop("type", "old")


def coupon_order(env: DataFrame) -> DataFrame:
    """Updates whose changed-column set contains using_time (P6)."""
    return cdc_extract(
        env,
        "coupon_use",
        ["update"],
        ["id", "coupon_id", "user_id", "order_id", "using_time"],
        extra=old_has_key("using_time"),
    )


def coupon_pay(env: DataFrame) -> DataFrame:
    """Updates whose changed-column set contains used_time (P4/P6)."""
    return cdc_extract(
        env,
        "coupon_use",
        ["update"],
        ["id", "coupon_id", "user_id", "order_id", "used_time"],
        extra=old_has_key("used_time"),
    )


# ---------------------------------------------------------------------------
# interaction + user (DwdInteractionFavorAdd/Comment, DwdUserRegister)
def favor_add(env: DataFrame) -> DataFrame:
    return cdc_extract(
        env,
        "favor_info",
        ["insert"],
        ["id", "user_id", "sku_id", "create_time"],
    )


def comment_info(env: DataFrame, base_dic: DataFrame) -> DataFrame:
    rows = cdc_extract(
        env,
        "comment_info",
        ["insert"],
        ["id", "user_id", "sku_id", "order_id", "create_time", "appraise"],
    )
    return lookup_join(
        rows, base_dic, "appraise", "dic_code", _DIC_ATTRS("appraise_name")
    )


def user_register(env: DataFrame) -> DataFrame:
    rows = cdc_extract(
        env, "user_info", ["insert"], ["id", "create_time"]
    )
    return _with_date_id(rows).select(
        F.col("id").alias("user_id"), "date_id", "create_time"
    )
