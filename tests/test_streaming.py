"""Streaming mode: batch/streaming parity on the same fixture corpus.

Each test feeds the fixture rows through a file-drop source (the Kafka
stand-in), runs the streaming job with availableNow, and asserts the result
equals the batch pipeline's output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import log_etl
from realtime_gmall_flink_spark.operators.windows import tumble_agg
from realtime_gmall_flink_spark.streaming import jobs, sources, stateful

from . import gmall_fixtures as FX


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("topic_log")
    (d / "part-0.txt").write_text("\n".join(FX.topic_log_rows()) + "\n")
    return str(d)


def _rowset(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_streaming_window_agg_matches_batch(spark, log_dir):
    def pipeline(raw):
        page = log_etl.split_log(log_etl.parse_topic_log(raw))["page"]
        rows = page.withColumn(
            "event_time", F.timestamp_millis(F.col("ts"))
        ).select(
            "event_time", F.col("common.is_new").alias("is_new")
        )
        return tumble_agg(
            rows,
            "event_time",
            "10 seconds",
            ["is_new"],
            {"pv_ct": F.count(F.lit(1))},
            watermark="3 seconds",
        )

    stream_out = jobs.run_to_memory(
        pipeline(sources.file_stream(spark, log_dir)), mode="complete"
    )
    batch_raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    batch_out = pipeline(batch_raw)
    cols = ["stt", "edt", "is_new", "pv_ct"]
    assert _rowset(stream_out, cols) == _rowset(batch_out, cols)
    assert stream_out.count() > 0


def test_streaming_uv_first_per_day(spark, log_dir):
    """A6 via applyInPandasWithState equals the batch window-function UV."""
    raw = sources.file_stream(spark, log_dir)
    page = log_etl.split_log(log_etl.parse_topic_log(raw))["page"]
    sess = page.filter(F.col("page.last_page_id").isNull()).select(
        F.col("common.mid").alias("mid"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
        F.col("ts").alias("ts"),
    ).withWatermark("event_time", "3 seconds")
    uv_stream = stateful.streaming_first_per_day(
        sess,
        key="mid",
        ts_col="event_time",
        out_schema="mid string, ts long",
        out_cols=["mid", "ts"],
    )
    got = _rowset(
        jobs.run_to_memory(uv_stream, mode="append"), ["mid", "ts"]
    )

    batch_raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    batch_page = log_etl.split_log(log_etl.parse_topic_log(batch_raw))["page"]
    expected = _rowset(
        log_etl.unique_visitor_detail(batch_page).select("mid", "ts"),
        ["mid", "ts"],
    )
    assert got == expected


def test_streaming_jump_out(spark, log_dir):
    """W5 via event-time timers equals the batch lead() form."""
    raw = sources.file_stream(spark, log_dir)
    page = log_etl.split_log(log_etl.parse_topic_log(raw))["page"]
    rows = page.select(
        F.col("common.mid").alias("mid"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
        F.col("ts").alias("ts"),
        F.col("page.last_page_id").isNull().alias("is_start"),
    ).withWatermark("event_time", "3 seconds")
    jump_stream = stateful.streaming_jump_out(
        rows,
        key="mid",
        ts_col="event_time",
        start_col="is_start",
        out_schema="mid string, ts long",
        out_cols=["mid", "ts"],
        timeout_seconds=10,
    )
    got = _rowset(
        jobs.run_to_memory(jump_stream, mode="append"), ["mid", "ts"]
    )

    batch_raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    batch_page = log_etl.split_log(log_etl.parse_topic_log(batch_raw))["page"]
    expected = {
        (r["mid"], r["ts"])
        for r in log_etl.user_jump_detail(batch_page)
        .select(F.col("common.mid").alias("mid"), "ts")
        .collect()
    }
    assert got == expected


def test_upsert_sink_latest_wins(spark, tmp_path):
    """D1 at the sink: changelog re-emits collapse to latest-per-key."""
    src_dir = tmp_path / "changelog"
    src_dir.mkdir()
    (src_dir / "b1.txt").write_text(
        "D1,1,100.00\nD1,2,175.00\nD2,1,50.00\n"
    )
    raw = sources.file_stream(spark, str(src_dir))
    parsed = raw.select(
        F.split("value", ",")[0].alias("id"),
        F.split("value", ",")[1].cast("long").alias("version"),
        F.split("value", ",")[2].alias("amount"),
    )
    target = str(tmp_path / "target")
    q = jobs.start_foreach_batch(
        parsed,
        jobs.upsert_sink(target, keys=["id"], version_col="version"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {
        (r["id"], r["version"], r["amount"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {("D1", 2, "175.00"), ("D2", 1, "50.00")}

    # second drop: late lower version must NOT overwrite, higher must
    (src_dir / "b2.txt").write_text("D1,1,999.00\nD2,3,60.00\n")
    q = jobs.start_foreach_batch(
        parsed,
        jobs.upsert_sink(target, keys=["id"], version_col="version"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {
        (r["id"], r["version"], r["amount"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {("D1", 2, "175.00"), ("D2", 3, "60.00")}


def test_log_fanout(spark, log_dir, tmp_path):
    raw = sources.file_stream(spark, log_dir)
    parsed = log_etl.parse_topic_log(raw)
    base = str(tmp_path / "dwd")

    def split_counts(df):
        split = log_etl.split_log(df, )
        return {
            "page": split["page"].select("raw"),
            "start": split["start"].select("raw"),
            "err": split["err"].select("raw"),
            "dirty": split["dirty"],
        }

    q = jobs.start_foreach_batch(
        parsed,
        jobs.log_fanout_sink(split_counts, base),
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination()
    assert spark.read.parquet(f"{base}/page").count() == 11
    assert spark.read.parquet(f"{base}/start").count() == 1
    assert spark.read.parquet(f"{base}/err").count() == 1
    assert spark.read.parquet(f"{base}/dirty").count() == 1


def test_kafka_payload_shape(spark):
    from realtime_gmall_flink_spark.streaming.sinks import kafka_payload
    import json

    df = spark.createDataFrame(
        [("D1", 2, 175.0)], "id string, version int, amount double"
    )
    out = kafka_payload(df, key_cols=["id", "version"]).collect()
    assert [c for c in kafka_payload(df, ["id"]).columns] == ["key", "value"]
    assert out[0]["key"] == "D1|2"
    assert json.loads(out[0]["value"]) == {
        "id": "D1", "version": 2, "amount": 175.0
    }
    # unkeyed topics get a value-only payload
    assert kafka_payload(df).columns == ["value"]


def test_streaming_dws_keyword_job(spark, log_dir):
    """One reference DWS job run in streaming mode equals its batch form
    (tumble-agg path of dws.traffic_source_keyword_page_view_window)."""
    from realtime_gmall_flink_spark.gmall import dws

    def run(raw):
        page = log_etl.split_log(log_etl.parse_topic_log(raw))["page"]
        return dws.traffic_source_keyword_page_view_window(page)

    stream_out = jobs.run_to_memory(
        run(sources.file_stream(spark, log_dir)), mode="complete"
    )
    batch_out = run(
        spark.createDataFrame([(r,) for r in FX.topic_log_rows()], "value string")
    )
    cols = ["stt", "edt", "keyword", "keyword_count", "source"]
    assert _rowset(stream_out, cols) == _rowset(batch_out, cols)
    assert stream_out.count() == 4


def test_tws_first_per_day_matches_batch(spark, log_dir):
    """A6 via Spark 4 transformWithStateInPandas equals the batch UV."""
    # the tws runtime needs a functional protobuf install
    pytest.importorskip("google.protobuf.descriptor")
    from realtime_gmall_flink_spark.streaming import tws

    raw = sources.file_stream(spark, log_dir)
    page = log_etl.split_log(log_etl.parse_topic_log(raw))["page"]
    sess = page.filter(F.col("page.last_page_id").isNull()).select(
        F.col("common.mid").alias("mid"),
        F.timestamp_millis(F.col("ts")).alias("event_time"),
        F.col("ts").alias("ts"),
    ).withWatermark("event_time", "3 seconds")
    uv = tws.tws_first_per_day(
        sess,
        key="mid",
        ts_col="event_time",
        out_schema="mid string, ts long",
        out_cols=["mid", "ts"],
    )
    got = _rowset(jobs.run_to_memory(uv, mode="append"), ["mid", "ts"])

    batch_raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    batch_page = log_etl.split_log(log_etl.parse_topic_log(batch_raw))["page"]
    expected = _rowset(
        log_etl.unique_visitor_detail(batch_page).select("mid", "ts"),
        ["mid", "ts"],
    )
    assert got == expected


def test_run_to_memory_survives_lingering_query(spark, log_dir):
    """Harness-interaction hardening, scoped: a leaked memsink query from
    a previous run_to_memory caller is pre-stopped, but a CONCURRENT
    foreign query (e.g. a DWS runner sharing the session) must be left
    running — run_to_memory completes alongside it."""
    raw = sources.file_stream(spark, log_dir)
    foreign = (
        raw.writeStream.format("memory")
        .queryName("dws_runner_concurrent")
        .outputMode("append")
        .start()
    )
    stale_memsink = (
        raw.writeStream.format("memory")
        .queryName("memsink_stale_leak")
        .outputMode("append")
        .start()
    )
    try:
        assert len(spark.streams.active) >= 2
        agg = tumble_agg(
            raw.withColumn("event_time", F.current_timestamp()).select(
                "event_time", "value"
            ),
            "event_time",
            "10 seconds",
            [],
            {"n": F.count(F.lit(1))},
            watermark="0 seconds",
        )
        out = jobs.run_to_memory(agg, mode="complete")
        assert out.count() >= 0
        assert not stale_memsink.isActive  # own family reaped
        assert foreign.isActive  # concurrent work untouched
    finally:
        for q in (foreign, stale_memsink):
            try:
                q.stop()
            except Exception:
                pass


def test_upsert_sink_untouched_buckets_not_rewritten(spark, tmp_path):
    """The merge must be partition-scoped: a second batch touching one
    key's bucket leaves every other bucket's parquet files untouched
    (same paths, same mtimes) — not a full-table rewrite."""
    import os as _os

    src_dir = tmp_path / "changelog2"
    src_dir.mkdir()
    # 40 keys spread across the 16 hash buckets
    (src_dir / "b1.txt").write_text(
        "".join(f"K{i},1,{i}.00\n" for i in range(40))
    )
    raw = sources.file_stream(spark, str(src_dir))
    parsed = raw.select(
        F.split("value", ",")[0].alias("id"),
        F.split("value", ",")[1].cast("long").alias("version"),
        F.split("value", ",")[2].alias("amount"),
    )
    target = str(tmp_path / "target2")
    sink = jobs.upsert_sink(target, keys=["id"], version_col="version")
    q = jobs.start_foreach_batch(
        parsed, sink, checkpoint=str(tmp_path / "ckpt3")
    )
    q.awaitTermination()

    def file_state():
        out = {}
        for root, _, files in _os.walk(target):
            for f in files:
                if f.endswith(".parquet"):
                    p = _os.path.join(root, f)
                    out[p] = _os.stat(p).st_mtime_ns
        return out

    before = file_state()
    buckets_before = {
        p.split("pk_bucket=")[1].split("/")[0] for p in before
    }
    assert len(buckets_before) > 1  # keys really spread over buckets

    # second batch updates a single key -> exactly one bucket touched
    (src_dir / "b2.txt").write_text("K0,2,999.00\n")
    q = jobs.start_foreach_batch(
        parsed, sink, checkpoint=str(tmp_path / "ckpt3")
    )
    q.awaitTermination()
    after = file_state()

    touched_bucket = [
        r[0]
        for r in spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit("K0")), F.lit(16)).cast("int")
        )
        .collect()
    ][0]
    untouched_before = {
        p: t for p, t in before.items()
        if f"pk_bucket={touched_bucket}/" not in p
    }
    untouched_after = {
        p: t for p, t in after.items()
        if f"pk_bucket={touched_bucket}/" not in p
    }
    assert untouched_before == untouched_after  # same files, same mtimes
    # and the merge itself is still correct
    rows = {
        (r["id"], r["version"], r["amount"])
        for r in spark.read.parquet(target).collect()
    }
    assert ("K0", 2, "999.00") in rows
    assert ("K1", 1, "1.00") in rows
    assert len(rows) == 40


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """W7 native form: duplicates inside the watermark horizon are
    suppressed; each key survives exactly once."""
    src = tmp_path / "dedup_src"
    src.mkdir()
    (src / "a.txt").write_text(
        "K1,2024-05-01 10:00:00\n"
        "K1,2024-05-01 10:00:03\n"  # dup within horizon -> dropped
        "K2,2024-05-01 10:00:05\n"
        "K1,2024-05-01 10:00:06\n"  # still within horizon -> dropped
    )
    raw = sources.file_stream(spark, str(src))
    parsed = raw.select(
        F.split("value", ",")[0].alias("k"),
        F.to_timestamp(F.split("value", ",")[1]).alias("t"),
    )
    out = jobs.run_to_memory(
        jobs.streaming_dedup(parsed, ["k"], "t", watermark="10 seconds"),
        mode="append",
    )
    got = sorted((r["k"], str(r["t"])) for r in out.collect())
    assert got == [
        ("K1", "2024-05-01 10:00:00"),
        ("K2", "2024-05-01 10:00:05"),
    ]


def test_streaming_latest_per_key_dedup(spark, tmp_path):
    """Latest-wins dedup timer: revisions inside the quiesce horizon
    collapse to the greatest row by order_by, emitted when the watermark
    passes; keys still inside the horizon stay pending and fire on the
    next run (the reference's DwsTradeOrderWindow 5 s state timer)."""
    from realtime_gmall_flink_spark.streaming.stateful import (
        streaming_latest_per_key,
    )

    src = tmp_path / "rev_src"
    src.mkdir()
    out = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.txt").write_text(
        "A,v1,1,2024-05-01 10:00:00\n"
        "A,v2,2,2024-05-01 10:00:01\n"   # revision -> wins
        "B,v1,1,2024-05-01 10:00:02\n"
        "C,v1,1,2024-05-01 12:00:00\n"   # advances watermark; stays pending
    )

    def run():
        raw = sources.file_stream(spark, str(src))
        p = raw.select(
            F.split("value", ",")[0].alias("k"),
            F.split("value", ",")[1].alias("payload"),
            F.split("value", ",")[2].cast("long").alias("rev"),
            F.to_timestamp(F.split("value", ",")[3]).alias("t"),
        ).withWatermark("t", "3 seconds")
        ded = streaming_latest_per_key(
            p,
            key="k",
            ts_col="t",
            order_by=["rev"],
            out_schema="k string, payload string, rev long",
            out_cols=["k", "payload", "rev"],
        )
        q = (
            ded.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["k"], r["payload"], r["rev"])
            for r in spark.read.parquet(out).collect()
        }

    got = run()
    assert got == {("A", "v2", 2), ("B", "v1", 1)}

    # run 2: a later row advances the watermark past C's timer
    (src / "b.txt").write_text("D,v1,1,2024-05-01 14:00:00\n")
    got = run()
    assert got == {("A", "v2", 2), ("B", "v1", 1), ("C", "v1", 1)}


def test_streaming_latest_per_key_lagging_key(spark, tmp_path):
    """A revision for a key whose event time lags the global watermark
    must not crash the query. Spark's late-events filter runs one batch
    behind the eviction watermark, so a lagging (but not yet filtered)
    row reaches the operator while last_ms + quiesce is already at or
    below the watermark — Spark rejects such a timer. The operator
    clamps to watermark + 1 and emits on the next advance (regression:
    this killed the stream with 'timeout timestamp cannot be earlier
    than the current watermark')."""
    import time

    from realtime_gmall_flink_spark.streaming.stateful import (
        streaming_latest_per_key,
    )

    src = tmp_path / "lag_src"
    src.mkdir()
    out = str(tmp_path / "lag_out")
    ckpt = str(tmp_path / "lag_ckpt")

    # one file per micro-batch (mod-time ordered): batch 1 drives the
    # watermark to ~11:59:57; batch 2's lagging revision still passes
    # the (one-batch-behind) late filter; batch 3 fires all timers
    (src / "a.txt").write_text(
        "A,v1,1,2024-05-01 10:00:00\n"
        "Z,v1,1,2024-05-01 12:00:00\n"
    )
    time.sleep(0.3)
    (src / "b.txt").write_text("A,v2,2,2024-05-01 10:00:05\n")
    time.sleep(0.3)
    (src / "c.txt").write_text("Y,v1,1,2024-05-01 14:00:00\n")

    raw = sources.file_stream(spark, str(src), max_files_per_trigger=1)
    p = raw.select(
        F.split("value", ",")[0].alias("k"),
        F.split("value", ",")[1].alias("payload"),
        F.split("value", ",")[2].cast("long").alias("rev"),
        F.to_timestamp(F.split("value", ",")[3]).alias("t"),
    ).withWatermark("t", "3 seconds")
    ded = streaming_latest_per_key(
        p,
        key="k",
        ts_col="t",
        order_by=["rev"],
        out_schema="k string, payload string, rev long",
        out_cols=["k", "payload", "rev"],
    )
    q = (
        ded.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["payload"], r["rev"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("A", "v2", 2), ("Z", "v1", 1)}


def test_streaming_jump_out_lagging_key(spark, tmp_path):
    """Same lagging-key clamp for the jump-out timer: a session start
    lagging the eviction watermark (but passing the one-batch-behind
    late filter) must set a valid timer (watermark + 1) and be emitted
    as a jump-out on the next advance instead of crashing."""
    import time

    from realtime_gmall_flink_spark.streaming.stateful import (
        streaming_jump_out,
    )

    src = tmp_path / "jump_lag_src"
    src.mkdir()
    out = str(tmp_path / "jump_lag_out")
    ckpt = str(tmp_path / "jump_lag_ckpt")

    (src / "a.txt").write_text(
        "M1,home,x,2024-05-01 10:00:00\n"
        "Z,home,x,2024-05-01 12:00:00\n"
    )
    time.sleep(0.3)
    (src / "b.txt").write_text("M2,home,x,2024-05-01 10:00:05\n")
    time.sleep(0.3)
    (src / "c.txt").write_text("Y,detail,x,2024-05-01 14:00:00\n")

    raw = sources.file_stream(spark, str(src), max_files_per_trigger=1)
    p = raw.select(
        F.split("value", ",")[0].alias("mid"),
        F.split("value", ",")[1].alias("page"),
        F.to_timestamp(F.split("value", ",")[3]).alias("t"),
    ).withWatermark("t", "3 seconds")
    p = p.withColumn("is_start", F.col("page") == "home")
    jd = streaming_jump_out(
        p,
        key="mid",
        ts_col="t",
        start_col="is_start",
        out_schema="mid string, page string",
        out_cols=["mid", "page"],
    )
    q = (
        jd.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["mid"], r["page"]) for r in spark.read.parquet(out).collect()
    }
    assert {("M1", "home"), ("M2", "home"), ("Z", "home")} <= got


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Flink's intervalJoin maps NATIVELY to a Spark stream-stream inner
    join with watermarks + a time-range condition (state auto-evicted
    past watermark + interval width). Same operator body as the batch
    interval_join; results must equal the batch run on the same corpus."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    # watermarks require TIMESTAMP (LTZ); the driver tables are NTZ
    views_b = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    pur_b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("pts"),
    )
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    views_b.write.parquet(vdir)
    pur_b.write.parquet(pdir)

    v = (
        spark.readStream.schema(views_b.schema)
        .parquet(vdir)
        .withWatermark("ts", "10 seconds")
    )
    p = (
        spark.readStream.schema(pur_b.schema)
        .parquet(pdir)
        .withWatermark("pts", "10 seconds")
    )
    joined = v.join(
        p,
        (v["user_id"] == p["p_user_id"])
        & (p["pts"] > v["ts"])
        & (p["pts"] <= v["ts"] + F.expr("INTERVAL 30 MINUTES")),
    ).select("view_id", "purchase_id", "user_id")
    got = {
        (r["view_id"], r["purchase_id"])
        for r in jobs.run_to_memory(joined, mode="append").collect()
    }
    expected = {
        (r["view_id"], r["purchase_id"])
        for r in views_b.join(
            pur_b,
            (views_b["user_id"] == pur_b["p_user_id"])
            & (pur_b["pts"] > views_b["ts"])
            & (pur_b["pts"] <= views_b["ts"] + F.expr("INTERVAL 30 MINUTES")),
        )
        .select("view_id", "purchase_id")
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_text_scoring_matches_batch(spark):
    """The LLM text-pipeline scoring surface (language ID, quality,
    token/fingerprint columns — all codegen expressions) composes with
    Structured Streaming unchanged: scoring the documents table as a
    file stream equals the batch result row-for-row. This is the
    streaming-ingestion curation path (score-on-arrival) for the
    pipeline operators."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.textstats import (
        doc_fingerprint,
        predict_language,
        quality_score,
        token_count,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table
    from realtime_gmall_flink_spark.streaming.jobs import run_to_memory

    sf_dir = "/root/testdata/sf0.001"
    batch = load_table(spark, sf_dir, "documents")

    def score(df):
        return df.select(
            "doc_id",
            predict_language("text").alias("lang_pred"),
            F.round(quality_score("text"), 6).alias("quality"),
            token_count("text").alias("tok_ct"),
            doc_fingerprint("text").alias("fp"),
        )

    # the streaming file source wants a directory; glob-filter to the
    # one table file inside the sf dir
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    got = run_to_memory(score(stream), mode="append")
    expected = score(batch)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session windows compose with Structured Streaming: the
    watermarked streaming session_window aggregation (append mode,
    state evicted as sessions close) equals the batch sessionization
    row-for-row. Two checkpointed availableNow passes with far-future
    sentinels: the second pass's watermark advance deterministically
    flushes any session the first pass still held (the trailing
    no-data-batch flush is not guaranteed to drain everything in one
    run). Window bounds compare as epoch micros so the check is
    independent of session-timezone rendering."""
    import os

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.traffic import SESSION_GAP_S

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    batch0 = spark.read.parquet(src)
    ts_long = dict(batch0.dtypes)["ts"] == "bigint"

    def add_sentinel(stamp, ns):
        sent_ts = (
            F.lit(ns).cast("long")
            if ts_long
            else F.lit(stamp).cast(batch0.schema["ts"].dataType)
        )
        batch0.limit(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            sent_ts.alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("").alias("props"),
        ).write.mode("append").parquet(src)

    def ev_col(df):
        if ts_long:
            return F.timestamp_micros(F.expr("ts div 1000"))
        return F.col("ts").cast("timestamp")

    def sessions(df):
        return (
            df.groupBy(
                F.session_window(
                    "event_time", f"{SESSION_GAP_S} seconds"
                ),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("event_ct"))
            .select(
                "user_id",
                F.unix_micros(F.col("session_window.start")).alias("s_us"),
                F.unix_micros(F.col("session_window.end")).alias("e_us"),
                "event_ct",
            )
        )

    def run_pass():
        full = spark.read.parquet(src)
        stream = (
            spark.readStream.schema(full.schema)
            .parquet(src)
            .select("user_id", ev_col(full).alias("event_time"))
            .withWatermark("event_time", "3 seconds")
        )
        q = (
            sessions(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    add_sentinel("2100-01-01 00:00:00", 4102444800 * 10**9)
    run_pass()
    add_sentinel("2100-02-01 00:00:00", 4105123200 * 10**9)
    run_pass()

    full = spark.read.parquet(src)
    expected = sessions(
        full.select("user_id", ev_col(full).alias("event_time"))
    ).filter(F.col("user_id") >= 0)
    got = spark.read.parquet(out_dir).filter(F.col("user_id") >= 0)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
    assert got.count() > 0
