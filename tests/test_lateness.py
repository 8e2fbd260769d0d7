"""W4 allowedLateness: late rows within the horizon RE-FIRE corrected
window totals; rows past the horizon go to the side output and leave the
window untouched — the one Flink window semantic Spark lacks natively
(DwsTrafficVcChArIsNewPageViewWindow.java:235-237)."""

from __future__ import annotations

import json
import os

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


def test_late_sink_crash_mid_batch_recovers(spark, tmp_path):
    """Crash AFTER the sink body completed but BEFORE the checkpoint
    commit: the replayed batch must not double-count window totals or
    duplicate the late side output (the meta's last-merged batch_id
    short-circuits it)."""
    import pytest

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

    _drop(src, "a.txt", [
        {"t": "2024-05-01 10:00:01", "k": "x", "v": 1},
        {"t": "2024-05-01 10:00:12", "k": "x", "v": 5},
    ])
    _run(spark, src, sink, ckpt)

    def crashing(batch, batch_id):
        sink(batch, batch_id)
        raise RuntimeError("injected crash after body, before commit")

    # batch 2: a re-fire for the 10:00:00 window plus a too-late row
    _drop(src, "b.txt", [
        {"t": "2024-05-01 10:00:05", "k": "x", "v": 10},
        {"t": "2024-05-01 09:59:01", "k": "x", "v": 99},
    ])
    raw = sources.file_stream(spark, str(src))
    parsed = raw.select(
        F.to_timestamp(F.get_json_object("value", "$.t")).alias("t"),
        F.get_json_object("value", "$.k").alias("k"),
        F.get_json_object("value", "$.v").cast("long").alias("v"),
    )
    q = jobs.start_foreach_batch(parsed, crashing, ckpt)
    with pytest.raises(Exception):
        q.awaitTermination()

    # restart: the uncommitted batch replays; totals must be exactly-once
    _run(spark, src, sink, ckpt)
    got = _windows(spark, target)
    assert got[("10:00:00", "x")] == (2, 11)
    assert got[("10:00:10", "x")] == (1, 5)
    late = lateness.read_too_late(spark, target)
    late_rows = [
        (str(r["stt"])[11:19], r["k"], r["vsum"]) for r in late.collect()
    ]
    assert late_rows == [("09:59:00", "x", 99)]


def test_late_sink_crash_between_merge_and_meta(spark, tmp_path):
    """Crash in the narrower window: data merge done, meta NOT yet
    advanced. The replay re-enters the merge path, but rows stamped with
    its own batch_id are kept as-is instead of re-adding the partials
    (row-level idempotency), and the late/batch=<id> overwrite replaces
    its own side output."""
    import shutil

    target = str(tmp_path / "wins")
    meta = str(tmp_path / "wins/_high_watermark")
    meta_bak = str(tmp_path / "meta_bak")
    sink = lateness.late_window_sink(
        target,
        "t",
        "10 seconds",
        ["k"],
        {"cnt": F.count(F.lit(1)), "vsum": F.sum("v")},
        allowed_lateness="10 seconds",
    )

    def batch_df(rows):
        return spark.createDataFrame(
            [(r["t"], r["k"], r["v"]) for r in rows],
            "t string, k string, v long",
        ).select(F.to_timestamp("t").alias("t"), "k", "v")

    b1 = batch_df([
        {"t": "2024-05-01 10:00:01", "k": "x", "v": 1},
        {"t": "2024-05-01 10:00:12", "k": "x", "v": 5},
    ])
    sink(b1, 0)
    shutil.copytree(meta, meta_bak)

    b2 = batch_df([
        {"t": "2024-05-01 10:00:05", "k": "x", "v": 10},
        {"t": "2024-05-01 09:59:01", "k": "x", "v": 99},
    ])
    sink(b2, 1)
    # simulate the crash: roll the meta back to its pre-batch-2 state,
    # leaving the merged data and late output in place, then replay
    shutil.rmtree(meta)
    shutil.copytree(meta_bak, meta)
    sink(b2, 1)

    got = _windows(spark, target)
    assert got[("10:00:00", "x")] == (2, 11)
    assert got[("10:00:10", "x")] == (1, 5)
    late = lateness.read_too_late(spark, target)
    late_rows = [
        (str(r["stt"])[11:19], r["k"], r["vsum"]) for r in late.collect()
    ]
    assert late_rows == [("09:59:00", "x", 99)]


def test_vc_window_job_with_allowed_lateness(spark, tmp_path):
    """W4 in its home job (DwsTrafficVcChArIsNewPageViewWindow): a late
    page view within the horizon re-fires its vc/ch/ar window; one past
    the horizon is side-lined."""
    from realtime_gmall_flink_spark.streaming import dws_jobs, warehouse

    from . import gmall_fixtures as FX

    log_dir = tmp_path / "topic_log"
    log_dir.mkdir()
    rows = FX.topic_log_rows()
    (log_dir / "d0.txt").write_text("\n".join(rows) + "\n")
    dwd = str(tmp_path / "dwd")
    q = warehouse.run_log_side(
        spark, str(log_dir), dwd, str(tmp_path / "ckpt_log")
    )
    q.awaitTermination()

    target = str(tmp_path / "vc_late")
    q = dws_jobs.run_vc_window_with_lateness(
        spark, dwd, target, str(tmp_path / "ckpt_vc")
    )
    q.awaitTermination()
    wins = lateness.read_windows(spark, target)
    # page-view counts must match the batch pv branch of the vc window
    batch_page = spark.createDataFrame(
        [(r,) for r in rows], "value string"
    )
    from realtime_gmall_flink_spark.gmall import log_etl

    page = log_etl.split_log(log_etl.parse_topic_log(batch_page))["page"]
    assert wins.agg(F.sum("pv_ct")).collect()[0][0] == page.count()

    # a late page view for M1's first window (watermark is far ahead at
    # DAY12; the 10s horizon has passed) -> side output, windows intact
    import json as _json

    late_row = _json.dumps(
        {
            "common": {"mid": "M9", "uid": "U9", "vc": "v2.1",
                       "ch": "app", "ar": "110000", "is_new": "1"},
            "page": {"page_id": "home", "during_time": 100},
            "ts": FX.ms(FX.DAY1, "10:00:02"),
        }
    )
    (log_dir / "d1.txt").write_text(late_row + "\n")
    q = warehouse.run_log_side(
        spark, str(log_dir), dwd, str(tmp_path / "ckpt_log")
    )
    q.awaitTermination()
    q = dws_jobs.run_vc_window_with_lateness(
        spark, dwd, target, str(tmp_path / "ckpt_vc")
    )
    q.awaitTermination()
    before_total = page.count()
    wins2 = lateness.read_windows(spark, target)
    assert wins2.agg(F.sum("pv_ct")).collect()[0][0] == before_total
    late = lateness.read_too_late(spark, target)
    assert late is not None and late.agg(F.sum("pv_ct")).collect()[0][0] == 1


def _direct_sink(spark, target):
    return lateness.late_window_sink(
        target,
        "t",
        "10 seconds",
        ["k"],
        {"cnt": F.count(F.lit(1)), "vsum": F.sum("v")},
        allowed_lateness="10 seconds",
    )


def _batch_df(spark, rows):
    return spark.createDataFrame(
        [(r["t"], r["k"], r["v"]) for r in rows],
        "t string, k string, v long",
    ).select(F.to_timestamp("t").alias("t"), "k", "v")


def test_garbled_meta_raises_instead_of_resetting_watermark(
    spark, tmp_path
):
    """A corrupt meta parquet must raise, not silently read as "no
    watermark yet" — a silent reset would merge genuinely too-late rows
    as in-time."""
    import pytest

    target = str(tmp_path / "wins")
    sink = _direct_sink(spark, target)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:01", "k": "x", "v": 1}]), 0)

    meta = tmp_path / "wins" / "_high_watermark"
    for f in meta.iterdir():
        if f.suffix == ".parquet":
            f.write_bytes(b"not a parquet file")
    with pytest.raises(Exception, match="(?i)parquet|corrupt"):
        sink(
            _batch_df(spark, [{"t": "2024-05-01 10:00:21", "k": "x", "v": 2}]),
            1,
        )


def test_fresh_checkpoint_against_old_target_fails_loudly(spark, tmp_path):
    """Reusing a target dir with a FRESH checkpoint restarts batch ids at
    0; the sink must refuse (silently skipping would drop every early
    batch of the new run)."""
    import pytest

    target = str(tmp_path / "wins")
    sink = _direct_sink(spark, target)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:01", "k": "x", "v": 1}]), 0)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:12", "k": "x", "v": 5}]), 1)

    with pytest.raises(RuntimeError, match="behind the last merged"):
        sink(
            _batch_df(spark, [{"t": "2024-05-01 10:00:21", "k": "x", "v": 2}]),
            0,
        )


def test_meta_write_crash_window_recovers_from_tmp(spark, tmp_path):
    """The meta write is tmp-then-rename; its only crash window is
    "old meta removed, complete tmp not yet renamed". Recovery must
    restore the tmp as the live meta, preserving the watermark — the
    sink keeps classifying late rows instead of resetting to -inf."""
    import shutil

    target = str(tmp_path / "wins")
    sink = _direct_sink(spark, target)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:01", "k": "x", "v": 1}]), 0)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:01:00", "k": "x", "v": 5}]), 1)

    # reconstruct the crash state: meta gone, batch-1 tmp complete
    meta = f"{target}/_high_watermark"
    shutil.copytree(meta, f"{meta}.tmp-1")
    shutil.rmtree(meta)

    wm, last = lateness._read_meta(spark, meta)
    assert last == 1 and wm is not None
    assert os.path.isdir(meta) and not os.path.isdir(f"{meta}.tmp-1")

    # too-late row (window closed > 10s+10s before the restored wm)
    # still lands in the side output, proving the watermark survived
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:02", "k": "x", "v": 9}]), 2)
    late = lateness.read_too_late(spark, target)
    assert late is not None and late.count() == 1
    got = _windows(spark, target)
    assert got[("10:00:00", "x")] == (1, 1)  # not re-merged


def test_meta_gutted_dir_with_complete_tmp_rolls_forward(spark, tmp_path):
    """Crash mid-rmtree of the OLD meta (the step between tmp write and
    rename): meta still exists as a gutted, unreadable directory while
    the complete tmp sits beside it. Recovery must roll FORWARD — the
    tmp is the committed state — instead of trusting the corpse and
    discarding the one artifact that can heal the sink."""
    import shutil

    target = str(tmp_path / "wins")
    sink = _direct_sink(spark, target)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:01", "k": "x", "v": 1}]), 0)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:01:00", "k": "x", "v": 5}]), 1)

    meta = f"{target}/_high_watermark"
    # crash state: batch-1 meta copied to a complete tmp, live meta
    # gutted mid-rmtree (parquet part gone, _SUCCESS left behind)
    shutil.copytree(meta, f"{meta}.tmp-1")
    for f in os.listdir(meta):
        if f.endswith(".parquet"):
            os.remove(os.path.join(meta, f))

    wm, last = lateness._read_meta(spark, meta)
    assert last == 1 and wm is not None
    assert os.path.isdir(meta) and not os.path.isdir(f"{meta}.tmp-1")
    # the sink keeps working (replay of batch 1 skips, batch 2 merges)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:01:00", "k": "x", "v": 5}]), 1)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:02:00", "k": "x", "v": 7}]), 2)
    got = _windows(spark, target)
    assert got[("10:02:00", "x")] == (1, 7)


def test_meta_incomplete_tmp_is_discarded(spark, tmp_path):
    """A tmp WITHOUT _SUCCESS is a crash mid-tmp-write: the live meta
    was never touched, so the junk is discarded and the meta stands."""
    target = str(tmp_path / "wins")
    sink = _direct_sink(spark, target)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:01", "k": "x", "v": 1}]), 0)

    meta = f"{target}/_high_watermark"
    junk = f"{meta}.tmp-1"
    os.makedirs(junk)
    with open(os.path.join(junk, "part-00000.parquet"), "wb") as f:
        f.write(b"partial garbage")

    wm, last = lateness._read_meta(spark, meta)
    assert last == 0 and wm is not None
    assert not os.path.isdir(junk)


def test_legacy_windows_dir_without_batch_stamp_merges(spark, tmp_path):
    """A windows/ dir written before the replay-guard layout (no
    last_merged_batch column) must merge instead of raising
    AnalysisException: the stamp column is backfilled with -1."""
    target = str(tmp_path / "wins")
    sink = _direct_sink(spark, target)
    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:01", "k": "x", "v": 1}]), 0)

    # strip the stamp column in place, simulating the pre-guard layout
    data = f"{target}/windows"
    legacy = spark.read.parquet(data).drop("last_merged_batch")
    legacy.write.mode("overwrite").parquet(f"{target}/legacy")
    import shutil

    shutil.rmtree(data)
    shutil.copytree(f"{target}/legacy", data)

    sink(_batch_df(spark, [{"t": "2024-05-01 10:00:05", "k": "x", "v": 10}]), 1)
    all_rows = lateness.read_windows(spark, target).collect()
    assert len(all_rows) == 1  # no duplicate layout remnants
    got = _windows(spark, target)
    assert got[("10:00:00", "x")] == (2, 11)


def test_late_sink_killpoint_fuzz(spark, tmp_path, monkeypatch):
    """Deterministic kill-point sweep over the whole sink protocol —
    the mechanical form of the hand-picked crash tests above. A batch
    that exercises every mutating step (too-late side output, merge
    staging, dynamic partition overwrite, meta tmp write, old-meta
    rmtree, meta rename) is killed at each primitive call, replayed
    (as Structured Streaming would after a crash before the checkpoint
    commit), and driven one batch further: the final windows and late
    side output must equal a pristine twin's for EVERY kill-point."""
    import shutil as real_shutil

    import pyspark.sql.readwriter as RW

    def batch_df(rows):
        return spark.createDataFrame(
            [(r["t"], r["k"], r["v"]) for r in rows],
            "t string, k string, v long",
        ).select(F.to_timestamp("t").alias("t"), "k", "v")

    def make_sink(target):
        return lateness.late_window_sink(
            target,
            "t",
            "10 seconds",
            ["k"],
            {"cnt": F.count(F.lit(1)), "vsum": F.sum("v")},
            allowed_lateness="10 seconds",
        )

    b1 = [
        {"t": "2024-05-01 10:00:01", "k": "x", "v": 1},
        {"t": "2024-05-01 10:00:12", "k": "x", "v": 5},
    ]
    # b2 walks every branch: a re-fire row (merge), a too-late row
    # (side output), so the protocol runs late-write -> staging ->
    # data overwrite -> meta tmp -> old-meta rmtree -> meta rename
    b2 = [
        {"t": "2024-05-01 10:00:05", "k": "x", "v": 10},
        {"t": "2024-05-01 09:59:01", "k": "x", "v": 99},
    ]
    b3 = [{"t": "2024-05-01 10:00:07", "k": "x", "v": 100}]

    def run_all(target, dying_batch=None):
        sink = make_sink(target)
        sink(batch_df(b1), 0)
        if dying_batch is not None:
            dying_batch(sink)  # killed attempt
        sink(batch_df(b2), 1)  # replay (or first run, pristine twin)
        sink(batch_df(b3), 2)
        wins = {
            (str(r["stt"])[11:19], r["k"]): (r["cnt"], r["vsum"])
            for r in lateness.read_windows(spark, target).collect()
        }
        late = lateness.read_too_late(spark, target)
        late_rows = sorted(
            (str(r["stt"])[11:19], r["k"], r["vsum"])
            for r in late.collect()
        )
        return wins, late_rows

    expected = run_all(str(tmp_path / "pristine"))
    assert expected[0][("10:00:00", "x")] == (3, 111)
    assert expected[1] == [("09:59:00", "x", 99)]

    class Kill(Exception):
        pass

    real_parquet = RW.DataFrameWriter.parquet
    real_rmtree = real_shutil.rmtree
    real_rename = os.rename
    # parquet x4 = late output, merge staging, data overwrite, meta tmp;
    # rmtree x2 = staging cleanup, old-meta removal; rename x1 = meta flip
    cases = (
        [("parquet", n) for n in (1, 2, 3, 4)]
        + [("rmtree", n) for n in (1, 2)]
        + [("rename", 1)]
    )
    for i, (prim, kill_at) in enumerate(cases):
        target = str(tmp_path / f"case{i}")
        calls = {"n": 0}

        def arm(name):
            def maybe_kill():
                if prim == name:
                    calls["n"] += 1
                    if calls["n"] >= kill_at:
                        raise Kill()

            return maybe_kill

        k_parquet, k_rmtree, k_rename = (
            arm("parquet"),
            arm("rmtree"),
            arm("rename"),
        )

        def dying_parquet(self, path, **kw):
            k_parquet()
            return real_parquet(self, path, **kw)

        def dying_rmtree(path, *a, **kw):
            k_rmtree()
            return real_rmtree(path, *a, **kw)

        def dying_rename(a, b):
            k_rename()
            return real_rename(a, b)

        def dying_batch(sink):
            monkeypatch.setattr(RW.DataFrameWriter, "parquet", dying_parquet)
            monkeypatch.setattr(real_shutil, "rmtree", dying_rmtree)
            monkeypatch.setattr(os, "rename", dying_rename)
            try:
                sink(batch_df(b2), 1)
                raise AssertionError(f"no kill fired: {prim} {kill_at}")
            except Kill:
                pass
            finally:
                monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)
                monkeypatch.setattr(real_shutil, "rmtree", real_rmtree)
                monkeypatch.setattr(os, "rename", real_rename)

        got = run_all(target, dying_batch)
        assert got == expected, (prim, kill_at, got)
