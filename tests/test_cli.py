"""CLI smoke: the warehouse command with --dws drives ODS->DWD->all-11
streaming DWS chains end-to-end over a file-drop corpus."""

from __future__ import annotations

import os

from realtime_gmall_flink_spark.__main__ import main
from realtime_gmall_flink_spark.streaming import dws_jobs

from . import gmall_fixtures as FX


def test_warehouse_cli_full_dws(spark, tmp_path):
    log_dir = tmp_path / "topic_log"
    db_dir = tmp_path / "topic_db"
    log_dir.mkdir()
    db_dir.mkdir()
    (log_dir / "d0.txt").write_text("\n".join(FX.topic_log_rows()) + "\n")
    (db_dir / "d0.txt").write_text("\n".join(FX.topic_db_rows()) + "\n")
    out = tmp_path / "wh"

    rc = main(
        [
            "warehouse",
            "--log-dir", str(log_dir),
            "--db-dir", str(db_dir),
            "--out", str(out),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--dws",
        ]
    )
    assert rc == 0

    dws_dir = out / "dws"
    for table in (
        *dws_jobs.DWS_TABLES,
        *dws_jobs.TRADE_DWS_TABLES,
        dws_jobs.ORDER_DWS_TABLE,
        dws_jobs.PROVINCE_DWS_TABLE,
        dws_jobs.TM_SPU_DWS_TABLE,
        dws_jobs.TM_REFUND_DWS_TABLE,
    ):
        path = dws_dir / table
        assert path.is_dir(), f"missing DWS table dir: {table}"
        # every table materialized with a real schema (rows may be held
        # back by pending dedup timers — that's the documented semantic)
        df = spark.read.parquet(str(path))
        assert df.columns, table
    # the order dedup detail (shared stage) exists and is readable
    assert os.path.isdir(out / "dwd_trade_order_detail_dedup")
