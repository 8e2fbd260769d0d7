"""Checkpoint-restart recovery: a second availableNow run with the same
checkpoint processes only newly dropped files — no duplicates, no loss
(the structured-streaming analog of the reference's 3 s EXACTLY_ONCE
checkpoints)."""

from __future__ import annotations

import json

import pytest
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


def test_upsert_sink_crash_mid_batch_recovers(spark, tmp_path):
    """Worst-case failure window: the upsert body fully wrote the batch,
    then the job died BEFORE the checkpoint committed. The restarted query
    reprocesses the batch; the latest-wins merge must converge (no
    duplicate keys, no lost updates, late lower versions still ignored)."""
    src = tmp_path / "src3"
    src.mkdir()
    target = str(tmp_path / "target3")
    ckpt = str(tmp_path / "ckpt3")

    def parsed():
        raw = sources.file_stream(spark, str(src))
        return raw.select(
            F.get_json_object("value", "$.id").alias("id"),
            F.get_json_object("value", "$.ver").cast("long").alias("ver"),
            F.get_json_object("value", "$.val").alias("val"),
        )

    real = jobs.upsert_sink(target, keys=["id"], version_col="ver")

    _drop(src, "a.txt", [{"id": "A", "ver": 1, "val": "a1"},
                         {"id": "B", "ver": 1, "val": "b1"}])
    q = jobs.start_foreach_batch(parsed(), real, ckpt)
    q.awaitTermination()

    # batch 2 writes fully, then the "process" crashes pre-commit
    def crashing(batch, batch_id):
        real(batch, batch_id)
        raise RuntimeError("injected crash after write, before commit")

    _drop(src, "b.txt", [{"id": "A", "ver": 2, "val": "a2"},
                         {"id": "C", "ver": 1, "val": "c1"}])
    q = jobs.start_foreach_batch(parsed(), crashing, ckpt)
    with pytest.raises(Exception):
        q.awaitTermination()

    # restart clean: the uncommitted batch is reprocessed; merge must be
    # idempotent. Then a late lower version must still lose.
    q = jobs.start_foreach_batch(parsed(), real, ckpt)
    q.awaitTermination()
    _drop(src, "c.txt", [{"id": "A", "ver": 1, "val": "stale"}])
    q = jobs.start_foreach_batch(parsed(), real, ckpt)
    q.awaitTermination()

    rows = [
        (r["id"], r["ver"], r["val"])
        for r in spark.read.parquet(target).collect()
    ]
    assert sorted(rows) == [("A", 2, "a2"), ("B", 1, "b1"), ("C", 1, "c1")]
    assert len(rows) == len({r[0] for r in rows})  # one row per key


def test_fanout_crash_mid_batch_no_duplicates(spark, tmp_path):
    """Crash after a partial fan-out (some branches written, checkpoint
    uncommitted): the retried batch overwrites its own batch=N output, so
    downstream readers never see duplicated rows."""
    src = tmp_path / "src4"
    src.mkdir()
    base = str(tmp_path / "fanout")
    ckpt = str(tmp_path / "ckpt4")

    def parsed():
        raw = sources.file_stream(spark, str(src))
        return raw.select(
            F.get_json_object("value", "$.side").alias("side"),
            F.get_json_object("value", "$.v").cast("long").alias("v"),
        )

    def split(df):
        return {
            "even": df.filter(F.col("v") % 2 == 0),
            "odd": df.filter(F.col("v") % 2 == 1),
        }

    real = jobs.log_fanout_sink(split, base)

    def crashing(batch, batch_id):
        real(batch, batch_id)  # full fan-out written...
        raise RuntimeError("injected crash before checkpoint commit")

    _drop(src, "a.txt", [{"side": "s", "v": 1}, {"side": "s", "v": 2},
                         {"side": "s", "v": 3}])
    q = jobs.start_foreach_batch(parsed(), crashing, ckpt)
    with pytest.raises(Exception):
        q.awaitTermination()

    q = jobs.start_foreach_batch(parsed(), real, ckpt)
    q.awaitTermination()

    odd = spark.read.parquet(f"{base}/odd")
    even = spark.read.parquet(f"{base}/even")
    assert sorted(r["v"] for r in odd.collect()) == [1, 3]
    assert sorted(r["v"] for r in even.collect()) == [2]
