"""Checkpoint-restart recovery: a second availableNow run with the same
checkpoint processes only newly dropped files — no duplicates, no loss
(the structured-streaming analog of the reference's 3 s EXACTLY_ONCE
checkpoints)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.streaming import jobs, sources


def _drop(dirpath, name, rows):
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_windowed_sink_restart_no_duplicates(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        raw = sources.file_stream(spark, str(src))
        parsed = raw.select(
            F.get_json_object("value", "$.k").alias("k"),
            F.get_json_object("value", "$.v").cast("long").alias("v"),
        )

        def write(batch, batch_id):
            batch.write.mode("append").parquet(out)

        return jobs.start_foreach_batch(parsed, write, ckpt)

    _drop(src, "a.txt", [{"k": "x", "v": 1}, {"k": "y", "v": 2}])
    q = start()
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    # restart with the same checkpoint, nothing new -> no reprocessing
    q = start()
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    # drop more data, restart -> only the new file is processed
    _drop(src, "b.txt", [{"k": "x", "v": 3}])
    q = start()
    q.awaitTermination()
    rows = {(r["k"], r["v"]) for r in spark.read.parquet(out).collect()}
    assert rows == {("x", 1), ("y", 2), ("x", 3)}


def test_stateful_operator_state_survives_restart(spark, tmp_path):
    """first-per-day state persists across restarts: a key seen in run 1
    is not re-emitted for the same day in run 2."""
    from realtime_gmall_flink_spark.streaming.stateful import (
        streaming_first_per_day,
    )

    src = tmp_path / "src2"
    src.mkdir()
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    def start():
        raw = sources.file_stream(spark, str(src))
        rows = raw.select(
            F.get_json_object("value", "$.mid").alias("mid"),
            F.to_timestamp(
                F.get_json_object("value", "$.t")
            ).alias("event_time"),
        ).withWatermark("event_time", "1 second")
        uv = streaming_first_per_day(
            rows,
            key="mid",
            ts_col="event_time",
            out_schema="mid string, event_time timestamp",
            out_cols=["mid", "event_time"],
        )

        def write(batch, batch_id):
            batch.write.mode("append").parquet(out)

        return jobs.start_foreach_batch(uv, write, ckpt)

    _drop(src, "a.txt", [{"mid": "m1", "t": "2024-05-01 10:00:00"}])
    q = start()
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 1

    # same mid, same day, later time -> suppressed by restored state;
    # new day -> emitted
    _drop(
        src,
        "b.txt",
        [
            {"mid": "m1", "t": "2024-05-01 18:00:00"},
            {"mid": "m1", "t": "2024-05-02 09:00:00"},
        ],
    )
    q = start()
    q.awaitTermination()
    got = sorted(
        str(r["event_time"]) for r in spark.read.parquet(out).collect()
    )
    assert got == ["2024-05-01 10:00:00", "2024-05-02 09:00:00"]
