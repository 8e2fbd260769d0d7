"""End-to-end streaming warehouse: ODS drops -> DWD parquet -> DWS equals
the batch pipeline on the same corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import cdc, dwd_db, dws
from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA
from realtime_gmall_flink_spark.streaming import warehouse

from . import gmall_fixtures as FX


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wh")
    log_dir = root / "topic_log"
    db_dir = root / "topic_db"
    out = root / "dwd"
    log_dir.mkdir(), db_dir.mkdir()
    (log_dir / "d0.txt").write_text("\n".join(FX.topic_log_rows()) + "\n")
    (db_dir / "d0.txt").write_text("\n".join(FX.topic_db_rows()) + "\n")
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)

    q1 = warehouse.run_log_side(
        spark, str(log_dir), str(out), str(root / "ckpt_log")
    )
    q2 = warehouse.run_db_side(
        spark, str(db_dir), base_dic, str(out), str(root / "ckpt_db")
    )
    q1.awaitTermination()
    q2.awaitTermination()
    return {"out": str(out), "base_dic": base_dic}


def test_log_side_tables(spark, wh):
    page = spark.read.parquet(f"{wh['out']}/dwd_traffic_page")
    assert page.count() == 11
    assert spark.read.parquet(f"{wh['out']}/dwd_traffic_dirty").count() == 1
    assert spark.read.parquet(f"{wh['out']}/dwd_traffic_display").count() == 2


def test_db_side_matches_batch(spark, wh):
    streamed = spark.read.parquet(
        warehouse.dwd_path(wh["out"], "order_detail")
    )
    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_db_rows()], "value string"
    )
    env = cdc.parse_topic_db(raw)
    batch = dwd_db.order_detail(
        dwd_db.order_pre_process(env, wh["base_dic"])
    )
    key = lambda df: {  # noqa: E731
        (r["id"], r["order_id"], r["split_total_amount"], r["row_op_ts"])
        for r in df.select(
            "id", "order_id", "split_total_amount", "row_op_ts"
        ).collect()
    }
    assert key(streamed) == key(batch)


def test_dws_over_streamed_dwd(spark, wh):
    order_det = spark.read.parquet(
        warehouse.dwd_path(wh["out"], "order_detail")
    )
    out = dws.trade_order_window(order_det)
    got = {
        r["stt"]: (
            r["order_unique_user_count"],
            r["order_origin_total_amount"],
        )
        for r in out.collect()
    }
    from datetime import datetime

    w = lambda d, t: datetime.strptime(f"{d} {t}", "%Y-%m-%d %H:%M:%S")  # noqa: E731
    assert got[w(FX.DAY1, "10:01:00")] == (1, 250.0)
    assert got[w(FX.DAY1, "11:01:00")] == (1, 150.0)


def test_refresh_dws_layer(spark, wh, tmp_path):
    from realtime_gmall_flink_spark.gmall import dims as dims_mod
    from realtime_gmall_flink_spark.gmall import cdc

    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_db_rows()], "value string"
    )
    dims = dims_mod.build_dims(cdc.parse_topic_db(raw))
    dws_dir = str(tmp_path / "dws")
    out = warehouse.refresh_dws(spark, wh["out"], dims, dws_dir)
    assert len(out) == 7
    prov = spark.read.parquet(
        f"{dws_dir}/dws_trade_province_order_window"
    )
    rows = {
        (r["province_id"], r["province_name"], r["order_amount"])
        for r in prov.collect()
    }
    assert ("P1", "Beijing-2", 225.0) in rows
    reg = spark.read.parquet(f"{dws_dir}/dws_user_user_register_window")
    assert reg.count() == 2


def test_db_side_restart_with_late_orders(spark, tmp_path):
    """Checkpoint-restart for the db-side chain: a self-contained late
    order (O3 + its detail D4) arrives after a restart; the resumed
    query appends only the new facts and the refreshed DWS layer equals
    batch over the full corpus."""
    rows = FX.topic_db_rows()
    late = [r for r in rows if '"O3"' in r or '"D4"' in r]
    assert len(late) == 2  # order_info O3 + order_detail D4
    first = [r for r in rows if r not in late]

    db_dir = tmp_path / "topic_db"
    db_dir.mkdir()
    out = str(tmp_path / "dwd")
    ckpt = str(tmp_path / "ckpt_db")
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)

    (db_dir / "d0.txt").write_text("\n".join(first) + "\n")
    q = warehouse.run_db_side(spark, str(db_dir), base_dic, out, ckpt)
    q.awaitTermination()
    n_first = spark.read.parquet(
        warehouse.dwd_path(out, "order_detail")
    ).count()

    (db_dir / "d1.txt").write_text("\n".join(late) + "\n")
    q = warehouse.run_db_side(spark, str(db_dir), base_dic, out, ckpt)
    q.awaitTermination()

    streamed = spark.read.parquet(warehouse.dwd_path(out, "order_detail"))
    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    env = cdc.parse_topic_db(raw)
    batch = dwd_db.order_detail(dwd_db.order_pre_process(env, base_dic))
    key = lambda df: {  # noqa: E731
        (r["id"], r["order_id"], r["split_total_amount"])
        for r in df.select(
            "id", "order_id", "split_total_amount"
        ).collect()
    }
    assert key(streamed) == key(batch)
    assert streamed.count() == n_first + 1  # exactly D4 appended, no dups

    # DWS refresh over the resumed DWD equals batch over the full corpus
    from realtime_gmall_flink_spark.gmall import dims as dims_mod
    from realtime_gmall_flink_spark.gmall import dws

    dims = dims_mod.build_dims(env)
    dws_dir = str(tmp_path / "dws")
    warehouse.refresh_dws(spark, out, dims, dws_dir)
    got = spark.read.parquet(f"{dws_dir}/dws_trade_order_window")
    expected = dws.trade_order_window(batch)
    cols = ["stt", "order_unique_user_count", "order_origin_total_amount"]
    rs = lambda df: {  # noqa: E731
        tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()
    }
    assert rs(got) == rs(expected)
