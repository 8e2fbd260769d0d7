"""Streaming DWS chain parity: the four log-side DWS jobs run as chained
Structured Streaming queries (stateful detail stage -> windowed stage)
and must equal the batch pipeline on the same corpus — including across
a checkpointed restart with late-arriving files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import dws, log_etl
from realtime_gmall_flink_spark.streaming import dws_jobs, warehouse

from . import gmall_fixtures as FX


def _batch_page(spark, rows):
    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    return log_etl.split_log(log_etl.parse_topic_log(raw))["page"]


def _batch_dws(page):
    uv = log_etl.unique_visitor_detail(page)
    jump = log_etl.user_jump_detail(page)
    return {
        "dws_traffic_source_keyword_page_view_window":
            dws.traffic_source_keyword_page_view_window(page),
        "dws_traffic_vc_ch_ar_is_new_page_view_window":
            dws.traffic_vc_ch_ar_is_new_page_view_window(page, uv, jump),
        "dws_traffic_page_view_window": dws.traffic_page_view_window(page),
        "dws_user_user_login_window": dws.user_user_login_window(page),
    }


def _rowset(df):
    cols = sorted(df.columns)
    return {tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()}


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dws_chain")
    log_dir = root / "topic_log"
    log_dir.mkdir()
    rows = FX.topic_log_rows()
    # batch 1 must leave NO pending jump-out timer past its watermark
    # (a bounded batch twin emits dangling session starts immediately;
    # the stream correctly holds them until the watermark passes — true
    # of Flink CEP too). M1 day1 + M2 rows qualify: every session start
    # is resolved by a later event within the batch. The M1-day2 start
    # (index 5) and everything from M3 on arrive after the restart.
    first = [rows[i] for i in (0, 1, 2, 3, 4, 6, 7)]
    late = [rows[5]] + rows[8:]
    (log_dir / "d0.txt").write_text("\n".join(first) + "\n")
    dirs = {
        "log": str(log_dir),
        "dwd": str(root / "dwd"),
        "dws": str(root / "dws"),
        "ckpt": str(root / "ckpt"),
    }
    q = warehouse.run_log_side(
        spark, dirs["log"], dirs["dwd"], f"{dirs['ckpt']}/log_side"
    )
    q.awaitTermination()
    dws_jobs.run_traffic_user_dws(
        spark, dirs["dwd"], dirs["dws"], f"{dirs['ckpt']}/dws"
    )
    return {"dirs": dirs, "rows": rows, "first": first, "late": late}


def test_first_run_matches_batch_prefix(spark, chain):
    expected = _batch_dws(_batch_page(spark, chain["first"]))
    for table, batch_df in expected.items():
        got = spark.read.parquet(f"{chain['dirs']['dws']}/{table}")
        assert _rowset(got) == _rowset(batch_df), table


def test_restart_with_late_files_matches_batch_full(spark, chain):
    """Drop the corpus tail, re-run every chained query with the SAME
    checkpoints: file sources must process only the new files, stateful
    operators must resume their keyed state, and the final DWS tables
    must equal batch over the full corpus (no duplicates, no loss)."""
    dirs = chain["dirs"]
    import pathlib

    (pathlib.Path(dirs["log"]) / "d1.txt").write_text(
        "\n".join(chain["late"]) + "\n"
    )
    q = warehouse.run_log_side(
        spark, dirs["log"], dirs["dwd"], f"{dirs['ckpt']}/log_side"
    )
    q.awaitTermination()
    dws_jobs.run_traffic_user_dws(
        spark, dirs["dwd"], dirs["dws"], f"{dirs['ckpt']}/dws"
    )

    expected = _batch_dws(_batch_page(spark, chain["rows"]))
    for table, batch_df in expected.items():
        got = spark.read.parquet(f"{dirs['dws']}/{table}")
        assert _rowset(got) == _rowset(batch_df), table

    # detail stage appended without duplicating already-processed rows
    uv = spark.read.parquet(f"{dirs['dwd']}/dwd_traffic_uv_detail")
    batch_uv = log_etl.unique_visitor_detail(
        _batch_page(spark, chain["rows"])
    )
    assert uv.count() == batch_uv.count()
    assert {(r["mid"], r["ts"]) for r in uv.collect()} == {
        (r["mid"], r["ts"]) for r in batch_uv.collect()
    }


def _rowlist(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()
    )


def _sentinel_rows():
    """Far-future rows that push EVERY stage-2 source's watermark past
    the real corpus, so append mode finalizes all real windows:
    - a keyword search row (the kw query's watermark advances only on
      post-filter search rows);
    - two session starts 20 s apart for one mid with a uid on home
      pages: the first-per-day emission advances the uv / pv-first /
      login detail streams, and the 20 s gap > jump timeout makes the
      first start emit as a jump-out, advancing the jump detail stream.
    Each sentinel's own window stays above the relevant watermark (or
    past the comparison cutoff), so parity against the sentinel-free
    batch corpus holds."""
    return [
        FX._log("SENT_K", uid="SU0", is_new="0",
                page={"page_id": "good_list", "last_page_id": "search",
                      "item": "sentinel probe", "item_type": "keyword",
                      "during_time": 1},
                ts=FX.ms(FX.DAY12, "23:00:00")),
        FX._log("SENT_M", uid="SU1", is_new="0",
                page={"page_id": "home", "during_time": 1},
                ts=FX.ms(FX.DAY12, "23:00:00")),
        FX._log("SENT_M", uid="SU1", is_new="0",
                page={"page_id": "home", "during_time": 1},
                ts=FX.ms(FX.DAY12, "23:00:20")),
    ]


def test_append_mode_windows_match_batch_with_restart(spark, tmp_path):
    """Stage 2 in bounded-state mode (mode="append"): watermarked windows
    emit exactly once when the watermark passes, state is evicted. After
    a checkpointed restart with the late tail plus the far-future
    sentinel, the appended tables equal the batch pipeline row-for-row
    (list compare, so a replayed/double emission would surface as a
    duplicate)."""
    import pathlib

    log_dir = tmp_path / "topic_log"
    log_dir.mkdir()
    rows = FX.topic_log_rows()
    first = [rows[i] for i in (0, 1, 2, 3, 4, 6, 7)]
    late = [rows[5]] + rows[8:]
    (log_dir / "d0.txt").write_text("\n".join(first) + "\n")
    dirs = {
        "log": str(log_dir),
        "dwd": str(tmp_path / "dwd"),
        "dws": str(tmp_path / "dws_append"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    def run_chain():
        q = warehouse.run_log_side(
            spark, dirs["log"], dirs["dwd"], f"{dirs['ckpt']}/log_side"
        )
        q.awaitTermination()
        dws_jobs.run_traffic_user_dws(
            spark,
            dirs["dwd"],
            dirs["dws"],
            f"{dirs['ckpt']}/dws",
            mode="append",
        )

    run_chain()
    (pathlib.Path(dirs["log"]) / "d1.txt").write_text(
        "\n".join(late) + "\n"
    )
    (pathlib.Path(dirs["log"]) / "d2.txt").write_text(
        "\n".join(_sentinel_rows()) + "\n"
    )
    run_chain()

    # real corpus ends DAY12 13:00; sentinels live at DAY12 23:00 — any
    # window at/after the cutoff is sentinel-only bookkeeping
    cutoff = F.to_timestamp(F.lit(f"{FX.DAY12} 14:00:00"))
    expected = _batch_dws(_batch_page(spark, rows))
    for table, batch_df in expected.items():
        got = spark.read.parquet(f"{dirs['dws']}/{table}").filter(
            F.col("stt") < cutoff
        )
        assert _rowlist(got) == _rowlist(batch_df), table


def test_trade_user_dws_streaming_matches_batch(spark, tmp_path):
    """The three insert-only db-side DWS chains (register, cart-add UU,
    payment-suc) run as chained streaming queries and equal the batch
    pipeline, including a checkpointed restart with a late payment."""
    from realtime_gmall_flink_spark.gmall import cdc, dwd_db
    from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

    rows = FX.topic_db_rows()
    # the DWD derive joins CDC rows within each micro-batch, so the ODS
    # corpus lands in one batch; the restart dimension is exercised on
    # the DWS chain itself (re-run with the same checkpoints below)
    db_dir = tmp_path / "topic_db"
    db_dir.mkdir()
    (db_dir / "d0.txt").write_text("\n".join(rows) + "\n")
    dwd = str(tmp_path / "dwd")
    dws = str(tmp_path / "dws")
    ckpt = str(tmp_path / "ckpt")
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)
    q = warehouse.run_db_side(spark, str(db_dir), base_dic, dwd, f"{ckpt}/db")
    q.awaitTermination()

    out = dws_jobs.run_trade_user_dws(spark, dwd, dws, f"{ckpt}/dws")

    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    env = cdc.parse_topic_db(raw)
    from realtime_gmall_flink_spark.gmall import dws as dws_mod

    order_det = dwd_db.order_detail(
        dwd_db.order_pre_process(env, base_dic)
    )
    expected = {
        "dws_user_user_register_window": dws_mod.user_user_register_window(
            dwd_db.user_register(env)
        ),
        "dws_trade_cart_add_uu_window": dws_mod.trade_cart_add_uu_window(
            dwd_db.cart_add(env, base_dic)
        ),
        "dws_trade_payment_suc_window": dws_mod.trade_payment_suc_window(
            dwd_db.pay_detail_suc(env, order_det, base_dic)
        ),
    }
    for table, batch_df in expected.items():
        got = spark.read.parquet(out[table])
        assert _rowset(got) == _rowset(batch_df), table

    # restart: re-running the whole chain with the same checkpoints must
    # be a no-op (no duplicated detail rows, identical DWS output)
    before = _rowset(
        spark.read.parquet(f"{dwd}/dwd_trade_pay_first_detail")
    )
    dws_jobs.run_trade_user_dws(spark, dwd, dws, f"{ckpt}/dws")
    after = _rowset(
        spark.read.parquet(f"{dwd}/dwd_trade_pay_first_detail")
    )
    assert before == after
    for table, batch_df in expected.items():
        got = spark.read.parquet(out[table])
        assert _rowset(got) == _rowset(batch_df), table


def test_trade_window_jobs_append_mode(spark, tmp_path):
    """The three db-side window stages in bounded-state append mode:
    windows finalize once the watermark (driven by a far-future sentinel
    row per source) passes, and a checkpointed re-run with a newer file
    emits the previously-pending window exactly once."""
    from realtime_gmall_flink_spark.operators.windows import tumble_agg

    dwd = tmp_path / "dwd"
    dwd.mkdir()
    dws = str(tmp_path / "dws")
    ckpt = str(tmp_path / "ckpt")
    S1 = FX.sec(FX.DAY1, "10:00:01")
    S2 = FX.sec(FX.DAY1, "10:00:03")
    S3 = FX.sec(FX.DAY1, "10:00:12")
    SENT = FX.sec(FX.DAY12, "23:00:00")
    cutoff = F.to_timestamp(F.lit(f"{FX.DAY12} 14:00:00"))

    reg_schema = "id string, create_time string"
    reg_rows = [
        ("R1", f"{FX.DAY1} 10:00:01"),
        ("R2", f"{FX.DAY1} 10:00:03"),
        ("R3", f"{FX.DAY1} 10:00:12"),
    ]
    reg_sent = [("RS", f"{FX.DAY12} 23:00:00")]
    cart_schema = "user_id string, sec long"
    cart_rows = [("U1", S1), ("U2", S3)]
    cart_sent = [("US", SENT)]
    pay_schema = "pay_user_id string, sec long, is_first_ever int"
    pay_rows = [("U1", S1, 1), ("U2", S2, 0)]
    pay_sent = [("US", SENT, 0)]

    for name, schema, rows in (
        ("dwd_user_register", reg_schema, reg_rows + reg_sent),
        ("dwd_trade_cart_first_detail", cart_schema, cart_rows + cart_sent),
        ("dwd_trade_pay_first_detail", pay_schema, pay_rows + pay_sent),
    ):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(dwd / name)
        )

    def run():
        for q in dws_jobs.run_trade_window_jobs(
            spark, str(dwd), dws, ckpt, mode="append"
        ):
            q.awaitTermination()

    run()

    def batch_win(rows, schema, ts_expr, aggs):
        df = spark.createDataFrame(rows, schema).withColumn(
            "event_time", ts_expr
        )
        return tumble_agg(df, "event_time", "10 seconds", [], aggs)

    expected = {
        "dws_user_user_register_window": batch_win(
            reg_rows, reg_schema, F.to_timestamp("create_time"),
            {"register_ct": F.count(F.lit(1))},
        ),
        "dws_trade_cart_add_uu_window": batch_win(
            cart_rows, cart_schema, F.timestamp_seconds(F.col("sec")),
            {"cart_add_uu_ct": F.count(F.lit(1))},
        ),
        "dws_trade_payment_suc_window": batch_win(
            pay_rows, pay_schema, F.timestamp_seconds(F.col("sec")),
            {
                "payment_suc_unique_user_count": F.count(F.lit(1)),
                "payment_suc_new_user_count": F.sum("is_first_ever"),
            },
        ),
    }
    for table, batch_df in expected.items():
        got = spark.read.parquet(f"{dws}/{table}").filter(
            F.col("stt") < cutoff
        )
        assert _rowlist(got) == _rowlist(batch_df), table

    # restart: a register row AHEAD of the restored watermark (22:59:57
    # — anything behind it is correctly dropped as late) plus a farther
    # sentinel that finalizes both it and the first sentinel's window;
    # exactly-once means the re-run adds those windows without
    # duplicating any earlier one
    spark.createDataFrame(
        [("R4", f"{FX.DAY12} 23:10:01"), ("RS2", f"{FX.DAY12} 23:30:00")],
        reg_schema,
    ).write.mode("append").parquet(str(dwd / "dwd_user_register"))
    run()
    cutoff2 = F.to_timestamp(F.lit(f"{FX.DAY12} 23:20:00"))
    got = spark.read.parquet(f"{dws}/dws_user_user_register_window").filter(
        F.col("stt") < cutoff2
    )
    expected_reg = batch_win(
        reg_rows + reg_sent + [("R4", f"{FX.DAY12} 23:10:01")],
        reg_schema,
        F.to_timestamp("create_time"),
        {"register_ct": F.count(F.lit(1))},
    )
    assert _rowlist(got) == _rowlist(expected_reg)


def test_auto_compact_hook_matches_uncompacted_twin(spark, tmp_path):
    """The runners' opt-in auto_compact hook: after each availableNow
    run the TERMINAL dws table dirs are compacted (file counts bounded,
    _spark_metadata rewritten), intermediate detail dirs stay
    untouched, and across a mid-run compaction + checkpointed re-run
    with new data every downstream reader of the chain's output sees
    rows identical to an uncompacted twin chain."""
    import os

    S1 = FX.sec(FX.DAY1, "10:00:01")
    S3 = FX.sec(FX.DAY1, "10:00:12")
    SENT1 = FX.sec(FX.DAY12, "23:00:00")
    SENT2 = FX.sec(FX.DAY12, "23:30:00")

    def seed(dwd):
        os.makedirs(dwd)
        spark.createDataFrame(
            [
                ("R1", f"{FX.DAY1} 10:00:01"),
                ("R2", f"{FX.DAY1} 10:00:12"),
                ("RS1", f"{FX.DAY12} 23:00:00"),
                ("RS2", f"{FX.DAY12} 23:30:00"),
            ],
            "id string, create_time string",
        ).write.mode("append").parquet(f"{dwd}/dwd_user_register")
        # stateful stage-1 chains need TWO far-future sentinels: the
        # first flushes real keys (held by its own quiesce timer), the
        # second flushes the first, whose event time then advances the
        # window stage (NOTES.md)
        spark.createDataFrame(
            [
                ("C1", "U1", S1),
                ("C2", "U2", S3),
                ("CS1", "ZA", SENT1),
                ("CS2", "ZB", SENT2),
            ],
            "id string, user_id string, ts long",
        ).write.mode("append").parquet(f"{dwd}/dwd_trade_cart_add")
        spark.createDataFrame(
            [
                ("U1", f"{FX.DAY1} 10:00:01"),
                ("U2", f"{FX.DAY1} 10:00:03"),
                ("ZA", f"{FX.DAY12} 23:00:00"),
                ("ZB", f"{FX.DAY12} 23:30:00"),
            ],
            "pay_user_id string, callback_time string",
        ).write.mode("append").parquet(f"{dwd}/dwd_trade_pay_detail_suc")

    results = {}
    for variant, ac in (("compacted", 1), ("plain", None)):
        dwd = str(tmp_path / f"{variant}_dwd")
        dws_dir = str(tmp_path / f"{variant}_dws")
        ckpt = str(tmp_path / f"{variant}_ckpt")
        seed(dwd)
        out = dws_jobs.run_trade_user_dws(
            spark, dwd, dws_dir, ckpt, mode="append", auto_compact=ac
        )
        # mid-run: new register data ahead of the restored watermark,
        # then the chain re-runs on the compacted (or plain) history
        spark.createDataFrame(
            [
                ("R4", f"{FX.DAY12} 23:40:01"),
                ("RS3", f"{FX.DAY12} 23:59:00"),
            ],
            "id string, create_time string",
        ).write.mode("append").parquet(f"{dwd}/dwd_user_register")
        out = dws_jobs.run_trade_user_dws(
            spark, dwd, dws_dir, ckpt, mode="append", auto_compact=ac
        )
        results[variant] = {
            t: _rowset(spark.read.parquet(p)) for t, p in out.items()
        }
        if ac is not None:
            reg_dir = out["dws_user_user_register_window"]
            names = os.listdir(reg_dir)
            assert any(n.startswith("compacted-") for n in names)
            # intermediate (stream-consumed) detail dirs must be intact
            for d in ("dwd_trade_cart_first_detail",
                      "dwd_trade_pay_first_detail"):
                assert not any(
                    n.startswith("compacted-")
                    for n in os.listdir(f"{dwd}/{d}")
                ), d

    assert results["compacted"] == results["plain"]
    for table, rows in results["compacted"].items():
        assert rows, f"{table} empty — vacuous parity"


def test_trade_order_window_streaming_matches_batch(spark, tmp_path):
    """The changelog-consuming order window runs as a three-stage
    streaming chain (latest-wins dedup timer -> user-first state ->
    additive union window) and equals the batch twin. Keys whose dedup
    timer the watermark has not passed stay pending (Flink holds them in
    the 5 s timer state too); a later tick row flushes them."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.gmall import cdc, dwd_db
    from realtime_gmall_flink_spark.gmall import dws as dws_mod
    from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

    rows = FX.topic_db_rows()
    db_dir = tmp_path / "topic_db"
    db_dir.mkdir()
    (db_dir / "d0.txt").write_text("\n".join(rows) + "\n")
    dwd = str(tmp_path / "dwd")
    dws_dir = str(tmp_path / "dws")
    ckpt = str(tmp_path / "ckpt")
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)
    warehouse.run_db_side(
        spark, str(db_dir), base_dic, dwd, f"{ckpt}/db"
    ).awaitTermination()

    target = dws_jobs.run_trade_order_dws(spark, dwd, dws_dir, f"{ckpt}/ord")

    # flush pending dedup timers: a far-future tick row advances the
    # watermark past every real key's quiesce horizon, then re-run
    tick_sec = 4102444800  # 2100-01-01, far past any fixture ts
    spark.createDataFrame(
        [(
            "__tick__", "__tick__", "u0", "P0", "S0", str(tick_sec),
            "1", "0", "0", "0", "0", tick_sec,
        )],
        "id string, order_id string, user_id string, province_id string,"
        " sku_id string, ts string, sku_num string, order_price string,"
        " split_activity_amount string, split_coupon_amount string,"
        " split_total_amount string, row_op_ts long",
    ).write.mode("append").parquet(f"{dwd}/dwd_trade_order_detail")
    dws_jobs.run_trade_order_dws(spark, dwd, dws_dir, f"{ckpt}/ord")

    got = spark.read.parquet(target).filter(
        F.col("stt") < F.timestamp_seconds(F.lit(tick_sec - 60))
    )
    env = cdc.parse_topic_db(
        spark.createDataFrame([(r,) for r in rows], "value string")
    )
    expected = dws_mod.trade_order_window(
        dwd_db.order_detail(dwd_db.order_pre_process(env, base_dic))
    )
    assert _rowset(got) == _rowset(expected)


def test_trade_changelog_windows_streaming_match_batch(spark, tmp_path):
    """The three remaining changelog-consuming windows (province,
    trademark/category/user/spu order, trademark/category/user refund)
    stream off the shared dedup detail: first-arrival dedup stages turn
    the reference's in-window id-set states into countable streams, and
    the union windows + batch-side dim cascades equal the batch twins —
    completing streaming coverage of all 11 DWS tables."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.gmall import cdc, dwd_db
    from realtime_gmall_flink_spark.gmall import dims as dims_mod
    from realtime_gmall_flink_spark.gmall import dws as dws_mod
    from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

    rows = FX.topic_db_rows()
    db_dir = tmp_path / "topic_db"
    db_dir.mkdir()
    (db_dir / "d0.txt").write_text("\n".join(rows) + "\n")
    dwd = str(tmp_path / "dwd")
    dws_dir = str(tmp_path / "dws")
    ckpt = str(tmp_path / "ckpt")
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)
    warehouse.run_db_side(
        spark, str(db_dir), base_dic, dwd, f"{ckpt}/db"
    ).awaitTermination()

    env = cdc.parse_topic_db(
        spark.createDataFrame([(r,) for r in rows], "value string")
    )
    dims = dims_mod.build_dims(env)

    # order chain (dedup detail) then province chain; tick flushes timers
    dws_jobs.run_trade_order_dws(spark, dwd, dws_dir, f"{ckpt}/ord")
    tick_sec = 4102444800
    spark.createDataFrame(
        [(
            "__tick__", "__tick__", "u0", "P0", "S0", str(tick_sec),
            "1", "0", "0", "0", "0", tick_sec,
        )],
        "id string, order_id string, user_id string, province_id string,"
        " sku_id string, ts string, sku_num string, order_price string,"
        " split_activity_amount string, split_coupon_amount string,"
        " split_total_amount string, row_op_ts long",
    ).write.mode("append").parquet(f"{dwd}/dwd_trade_order_detail")
    dws_jobs.run_trade_order_dws(spark, dwd, dws_dir, f"{ckpt}/ord")

    target = dws_jobs.run_trade_province_dws(
        spark, dwd, dws_dir, f"{ckpt}/prov", dims["dim_base_province"]
    )

    got = spark.read.parquet(target).filter(
        F.col("stt") < F.timestamp_seconds(F.lit(tick_sec - 60))
    )
    batch_order_det = dwd_db.order_detail(
        dwd_db.order_pre_process(env, base_dic)
    )
    expected = dws_mod.trade_province_order_window(
        batch_order_det, dims["dim_base_province"]
    )
    assert _rowset(got) == _rowset(expected)

    # trademark/category/user/spu order window (shares the dedup detail)
    tm_target = dws_jobs.run_trade_tm_spu_dws(
        spark, dwd, dws_dir, f"{ckpt}/tm_spu", dims
    )
    got_tm = spark.read.parquet(tm_target).filter(
        F.col("stt") < F.timestamp_seconds(F.lit(tick_sec - 60))
    )
    exp_tm = dws_mod.trade_trademark_category_user_spu_order_window(
        batch_order_det, dims
    )
    assert _rowset(got_tm) == _rowset(exp_tm)

    # trademark/category/user refund window (insert-only source, no tick)
    rf_target = dws_jobs.run_trade_tm_refund_dws(
        spark, dwd, dws_dir, f"{ckpt}/tm_refund", dims
    )
    got_rf = spark.read.parquet(rf_target)
    exp_rf = dws_mod.trade_trademark_category_user_refund_window(
        dwd_db.order_refund(env, base_dic), dims
    )
    assert _rowset(got_rf) == _rowset(exp_rf)


_ORDER_TICK_SCHEMA = (
    "id string, order_id string, user_id string, province_id string,"
    " sku_id string, ts string, sku_num string, order_price string,"
    " split_activity_amount string, split_coupon_amount string,"
    " split_total_amount string, row_op_ts long"
)


def test_trade_changelog_windows_append_mode(spark, tmp_path):
    """All four changelog-consuming trade DWS chains in bounded-state
    append mode (the reference's fire-once-and-evict window lifecycle,
    DwsTradeOrderWindow.java:233-235 family): watermarked stage-2/3
    windows emit exactly once via the parquet sink, dim cascades apply
    in-stream as stateless broadcast joins, and the appended tables
    equal the batch twins row-for-row (list compare — a replayed or
    double emission would surface as a duplicate). A no-new-data re-run
    with the same checkpoints must be a no-op."""
    from realtime_gmall_flink_spark.gmall import cdc, dwd_db
    from realtime_gmall_flink_spark.gmall import dims as dims_mod
    from realtime_gmall_flink_spark.gmall import dws as dws_mod
    from realtime_gmall_flink_spark.schemas import BASE_DIC_SCHEMA

    rows = FX.topic_db_rows()
    db_dir = tmp_path / "topic_db"
    db_dir.mkdir()
    (db_dir / "d0.txt").write_text("\n".join(rows) + "\n")
    dwd = str(tmp_path / "dwd")
    dws_dir = str(tmp_path / "dws_append")
    ckpt = str(tmp_path / "ckpt")
    base_dic = spark.createDataFrame(FX.base_dic_rows(), BASE_DIC_SCHEMA)
    warehouse.run_db_side(
        spark, str(db_dir), base_dic, dwd, f"{ckpt}/db"
    ).awaitTermination()

    env = cdc.parse_topic_db(
        spark.createDataFrame([(r,) for r in rows], "value string")
    )
    dims = dims_mod.build_dims(env)
    batch_order_det = dwd_db.order_detail(
        dwd_db.order_pre_process(env, base_dic)
    )
    tick_sec = 4102444800  # 2100-01-01, far past any fixture ts
    cutoff = F.timestamp_seconds(F.lit(tick_sec - 60))

    def run_order():
        return dws_jobs.run_trade_order_dws(
            spark, dwd, dws_dir, f"{ckpt}/ord", mode="append"
        )

    def tick(name: str, sec: int):
        spark.createDataFrame(
            [(
                name, name, "u0", "P0", "S0", str(sec),
                "1", "0", "0", "0", "0", sec,
            )],
            _ORDER_TICK_SCHEMA,
        ).write.mode("append").parquet(f"{dwd}/dwd_trade_order_detail")

    # run 1 leaves pending dedup timers + unfinalized windows. Tick 1
    # flushes the real pending keys out of the dedup stage (run 2) but is
    # itself held by its own quiesce timer — the window stage's watermark
    # only reaches the last REAL event. Tick 2 (run 3) flushes tick 1,
    # whose event time then pushes the window watermark past every real
    # window: the chained-stage form of the register test's two
    # sentinels. Windows finalize exactly once across the three runs.
    run_order()
    tick("__tick__", tick_sec)
    run_order()
    tick("__tick2__", tick_sec + 3600)
    target = run_order()

    exp_order = dws_mod.trade_order_window(batch_order_det)
    got = spark.read.parquet(target).filter(F.col("stt") < cutoff)
    assert _rowlist(got) == _rowlist(exp_order)

    # no-new-data restart with the same checkpoints is a no-op
    run_order()
    got = spark.read.parquet(target).filter(F.col("stt") < cutoff)
    assert _rowlist(got) == _rowlist(exp_order)

    # province window: dim joins in-stream ahead of the parquet sink
    prov_target = dws_jobs.run_trade_province_dws(
        spark, dwd, dws_dir, f"{ckpt}/prov", dims["dim_base_province"],
        mode="append",
    )
    got_prov = spark.read.parquet(prov_target).filter(F.col("stt") < cutoff)
    exp_prov = dws_mod.trade_province_order_window(
        batch_order_det, dims["dim_base_province"]
    )
    assert _rowlist(got_prov) == _rowlist(exp_prov)

    # trademark/category/user/spu window: 6-hop cascade in-stream
    tm_target = dws_jobs.run_trade_tm_spu_dws(
        spark, dwd, dws_dir, f"{ckpt}/tm_spu", dims, mode="append"
    )
    got_tm = spark.read.parquet(tm_target).filter(F.col("stt") < cutoff)
    exp_tm = dws_mod.trade_trademark_category_user_spu_order_window(
        batch_order_det, dims
    )
    assert _rowlist(got_tm) == _rowlist(exp_tm)

    # refund window needs its own sentinel (insert-only source whose
    # watermark nothing else advances): clone a real row far-future
    ref_path = f"{dwd}/dwd_trade_order_refund"
    one = spark.read.parquet(ref_path).limit(1)
    dt = dict(one.dtypes)
    sent = (
        one.withColumn("order_id", F.lit("__tick__").cast(dt["order_id"]))
        .withColumn("sku_id", F.lit("S0").cast(dt["sku_id"]))
        .withColumn("user_id", F.lit("u0").cast(dt["user_id"]))
        .withColumn("ts", F.lit(tick_sec).cast(dt["ts"]))
    )
    sent.write.mode("append").parquet(ref_path)
    rf_target = dws_jobs.run_trade_tm_refund_dws(
        spark, dwd, dws_dir, f"{ckpt}/tm_refund", dims, mode="append"
    )
    got_rf = spark.read.parquet(rf_target).filter(F.col("stt") < cutoff)
    exp_rf = dws_mod.trade_trademark_category_user_refund_window(
        dwd_db.order_refund(env, base_dic), dims
    )
    assert _rowlist(got_rf) == _rowlist(exp_rf)
