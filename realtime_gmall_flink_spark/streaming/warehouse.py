"""End-to-end streaming warehouse: ODS file/Kafka streams -> DWD parquet
tables -> DWS summaries.

The reference runs ~27 always-on jobs; here the same DAG is two
checkpointed streaming queries (log side + db side) fanning out to DWD
tables, with the DWS layer recomputed over the accumulated DWD tables
per trigger (micro-batch materialized-view style).

Join scope note: the db-side fact derivation joins CDC rows *within each
micro-batch* (foreachBatch). The reference's unwindowed stream-stream
joins keep state forever — the Spark equivalent would be stream-stream
joins with generous watermarks; for the bounded test corpora a single
availableNow batch sees all rows, and batch mode remains the semantic
oracle either way (QUIRKS.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..gmall import cdc, dwd_db, log_etl
from .jobs import log_fanout_sink, start_foreach_batch
from .sources import file_stream

LOG_TABLES = ("page", "start", "err", "display", "action", "dirty")
DB_FACTS = (
    "order_detail", "cancel_detail", "cart_add", "order_refund",
    "refund_pay_suc", "coupon_get", "coupon_order", "coupon_pay",
    "favor_add", "comment_info", "user_register",
)


def run_log_side(
    spark: SparkSession, log_dir: str, out_dir: str, checkpoint: str
):
    """topic_log stream -> parse -> 6-way DWD fan-out (one query)."""
    raw = file_stream(spark, log_dir)
    parsed = log_etl.parse_topic_log(raw)

    def split(batch: DataFrame) -> dict[str, DataFrame]:
        s = log_etl.split_log(batch)
        return {f"dwd_traffic_{name}": s[name] for name in LOG_TABLES}

    return start_foreach_batch(
        parsed, log_fanout_sink(split, out_dir), checkpoint
    )


def run_db_side(
    spark: SparkSession,
    db_dir: str,
    base_dic: DataFrame,
    out_dir: str,
    checkpoint: str,
):
    """topic_db stream -> per-batch DWD fact derivation -> parquet tables."""
    raw = file_stream(spark, db_dir)

    def derive(batch: DataFrame, batch_id: int) -> None:
        env = cdc.parse_topic_db(batch).cache()
        try:
            pre = dwd_db.order_pre_process(env, base_dic)
            facts = {
                "order_pre_process": pre,
                "order_detail": dwd_db.order_detail(pre),
                "cancel_detail": dwd_db.cancel_detail(pre),
                "cart_add": dwd_db.cart_add(env, base_dic),
                "order_refund": dwd_db.order_refund(env, base_dic),
                "refund_pay_suc": dwd_db.refund_pay_suc(env, base_dic),
                "coupon_get": dwd_db.coupon_get(env),
                "coupon_order": dwd_db.coupon_order(env),
                "coupon_pay": dwd_db.coupon_pay(env),
                "favor_add": dwd_db.favor_add(env),
                "comment_info": dwd_db.comment_info(env, base_dic),
                "user_register": dwd_db.user_register(env),
            }
            facts["pay_detail_suc"] = dwd_db.pay_detail_suc(
                env, facts["order_detail"], base_dic
            )
            for name, df in facts.items():
                df.write.mode("append").parquet(
                    os.path.join(out_dir, f"dwd_trade_{name}")
                    if name.startswith(("order", "cancel", "cart", "pay", "refund"))
                    else os.path.join(out_dir, f"dwd_{name}")
                )
        finally:
            env.unpersist()

    # raw value stream; parse inside the batch so dirty rows never kill
    # the query
    return start_foreach_batch(raw, derive, checkpoint)


def refresh_dws(
    spark: SparkSession,
    out_dir: str,
    dims: dict[str, DataFrame],
    dws_dir: str,
) -> dict[str, DataFrame]:
    """Materialize the trade/user DWS summaries from the accumulated DWD
    tables (micro-batch materialized-view refresh; the reference keeps
    these incrementally in ClickHouse — recompute-over-parquet gives the
    same tables with batch semantics).

    Log-side DWS jobs consume the page split; they are wired in gmall.dws
    and tested directly — this covers the db-side chain.
    """
    from ..gmall import dws

    def rd(fact: str) -> DataFrame:
        return spark.read.parquet(dwd_path(out_dir, fact))

    order_det = rd("order_detail")
    summaries = {
        "dws_trade_order_window": dws.trade_order_window(order_det),
        "dws_trade_cart_add_uu_window": dws.trade_cart_add_uu_window(
            rd("cart_add")
        ),
        "dws_trade_payment_suc_window": dws.trade_payment_suc_window(
            rd("pay_detail_suc")
        ),
        "dws_trade_province_order_window": dws.trade_province_order_window(
            order_det, dims["dim_base_province"]
        ),
        "dws_trade_trademark_category_user_spu_order_window":
            dws.trade_trademark_category_user_spu_order_window(
                order_det, dims
            ),
        "dws_trade_trademark_category_user_refund_window":
            dws.trade_trademark_category_user_refund_window(
                rd("order_refund"), dims
            ),
        "dws_user_user_register_window": dws.user_user_register_window(
            rd("user_register")
        ),
    }
    for name, df in summaries.items():
        df.write.mode("overwrite").parquet(os.path.join(dws_dir, name))
    return summaries


def dwd_path(out_dir: str, fact: str) -> str:
    prefix = (
        "dwd_trade_"
        if fact.startswith(("order", "cancel", "cart", "pay", "refund"))
        else "dwd_"
    )
    return os.path.join(out_dir, f"{prefix}{fact}")
