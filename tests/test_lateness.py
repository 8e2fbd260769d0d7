"""W4 allowedLateness: late rows within the horizon RE-FIRE corrected
window totals; rows past the horizon go to the side output and leave the
window untouched — the one Flink window semantic Spark lacks natively
(DwsTrafficVcChArIsNewPageViewWindow.java:235-237)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.streaming import jobs, lateness, sources


def _drop(dirpath, name, rows):
    (dirpath / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _run(spark, src, sink, ckpt):
    raw = sources.file_stream(spark, str(src))
    parsed = raw.select(
        F.to_timestamp(F.get_json_object("value", "$.t")).alias("t"),
        F.get_json_object("value", "$.k").alias("k"),
        F.get_json_object("value", "$.v").cast("long").alias("v"),
    )
    q = jobs.start_foreach_batch(parsed, sink, ckpt)
    q.awaitTermination()


def _windows(spark, target):
    return {
        (str(r["stt"])[11:19], r["k"]): (r["cnt"], r["vsum"])
        for r in lateness.read_windows(spark, target).collect()
    }


def test_late_row_refires_too_late_row_sidelined(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "wins")
    ckpt = str(tmp_path / "ckpt")
    sink = lateness.late_window_sink(
        target,
        "t",
        "10 seconds",
        ["k"],
        {"cnt": F.count(F.lit(1)), "vsum": F.sum("v")},
        allowed_lateness="10 seconds",
    )

    # batch 1: two windows fire
    _drop(src, "a.txt", [
        {"t": "2024-05-01 10:00:01", "k": "x", "v": 1},
        {"t": "2024-05-01 10:00:03", "k": "x", "v": 2},
        {"t": "2024-05-01 10:00:12", "k": "x", "v": 5},
    ])
    _run(spark, src, sink, ckpt)
    assert _windows(spark, target) == {
        ("10:00:00", "x"): (2, 3),
        ("10:00:10", "x"): (1, 5),
    }

    # batch 2: watermark is 10:00:12. A row for the 10:00:00 window
    # (closed 10:00:10, within 10:00:10 > 10:00:12 - 10s lateness... it
    # is NOT too late) must RE-FIRE that window with a corrected total;
    # a row for 09:59:00 (window closed 09:59:10 <= 10:00:02 horizon) is
    # too late: side output, no window change.
    _drop(src, "b.txt", [
        {"t": "2024-05-01 10:00:05", "k": "x", "v": 10},
        {"t": "2024-05-01 09:59:01", "k": "x", "v": 99},
    ])
    _run(spark, src, sink, ckpt)
    got = _windows(spark, target)
    assert got[("10:00:00", "x")] == (3, 13)  # re-fired, corrected
    assert got[("10:00:10", "x")] == (1, 5)  # untouched
    assert ("09:59:00", "x") not in got  # too-late never merged

    late = lateness.read_too_late(spark, target)
    assert late is not None
    late_rows = {
        (str(r["stt"])[11:19], r["k"], r["vsum"]) for r in late.collect()
    }
    assert late_rows == {("09:59:00", "x", 99)}

    # batch 3: the watermark advanced to 10:00:12 in batch 2? No — batch
    # 2's max event (10:00:05) does not move it backwards: high watermark
    # stays 10:00:12. A 10:00:00-window row is still within lateness.
    _drop(src, "c.txt", [
        {"t": "2024-05-01 10:00:07", "k": "x", "v": 100},
    ])
    _run(spark, src, sink, ckpt)
    assert _windows(spark, target)[("10:00:00", "x")] == (4, 113)
