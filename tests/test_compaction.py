"""Small-file compaction: multi-batch streaming appends end with bounded
file counts and byte-identical query results — including through the
FileStreamSink metadata log and across a checkpointed restart."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.streaming.compaction import (
    compact_dir,
    compact_topics,
    recover_sink_log_dir,
)


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()
    )


def _pq_count(d):
    return sum(
        1
        for root, dirs, files in os.walk(d)
        if "_spark_metadata" not in root
        for f in files
        if f.endswith(".parquet") and not f.startswith(".")
    )


def test_plain_append_dir_compacts_and_preserves_rows(spark, tmp_path):
    d = str(tmp_path / "topic")
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(d)
    before = _rowset(spark.read.parquet(d))
    assert _pq_count(d) >= 12

    stats = compact_dir(spark, d, max_files=8)
    assert stats and _pq_count(d) <= 8
    assert _rowset(spark.read.parquet(d)) == before

    # re-run is a no-op below the threshold
    assert compact_dir(spark, d, max_files=8) == {}
    assert _rowset(spark.read.parquet(d)) == before


def test_partitioned_dir_compacts_only_fragmented_leaves(spark, tmp_path):
    d = str(tmp_path / "topic")
    for i in range(12):
        spark.createDataFrame(
            [("2024-05-01", i)], "win_date string, v long"
        ).write.mode("append").parquet(f"{d}/win_date=2024-05-01")
    spark.createDataFrame(
        [("x", 99)], "k string, v long"
    ).write.mode("append").parquet(f"{d}/win_date=2024-05-02")
    untouched = sorted(os.listdir(f"{d}/win_date=2024-05-02"))
    before = _rowset(spark.read.parquet(d))

    stats = compact_dir(spark, d, max_files=8)
    assert list(stats) == [f"{d}/win_date=2024-05-01"]
    assert sorted(os.listdir(f"{d}/win_date=2024-05-02")) == untouched
    assert _rowset(spark.read.parquet(d)) == before


def _start_stream(spark, src, out, ckpt):
    q = (
        spark.readStream.schema("id long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sink_log_dir_compacts_and_survives_restart(spark, tmp_path):
    """The FileStreamSink case: per-micro-batch files collapse, the
    metadata log is rewritten in place (names preserved), reads keep
    going THROUGH the log, and a restarted query continues appending
    with its original batch numbering — no loss, no duplicates."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, ckpt)
    assert _pq_count(out) >= 12
    before = _rowset(spark.read.parquet(out))
    assert len(before) == 12

    stats = compact_dir(spark, out, max_files=8)
    assert stats[out][0] >= 12 and stats[out][1] <= 8
    assert _pq_count(out) <= 8
    # the read follows the rewritten log, not stray directory listings
    assert _rowset(spark.read.parquet(out)) == before

    # restart with MORE source data: the sink must resume numbering and
    # append on top of the compacted history
    spark.createDataFrame(
        [(100, "late1"), (101, "late2")], "id long, v string"
    ).write.mode("append").parquet(src)
    _start_stream(spark, src, out, ckpt)
    after = _rowset(spark.read.parquet(out))
    assert len(after) == 14
    assert set(before) <= set(after)

    # and a second compaction pass over the grown dir still round-trips
    compact_dir(spark, out, max_files=1)
    assert _rowset(spark.read.parquet(out)) == after


def _start_partitioned_stream(spark, src, out, ckpt):
    q = (
        spark.readStream.schema("id long, part string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("parquet")
        .outputMode("append")
        .partitionBy("part")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _partitioned_src(spark, tmp_path, n=10):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i in range(n):
        spark.createDataFrame(
            [(i, "a" if i % 2 else "b")], "id long, part string"
        ).write.mode("append").parquet(src)
    return src


def test_partitioned_sink_log_dir_compacts_per_leaf(spark, tmp_path):
    """Partitioned FileStreamSink dirs compact per partition LEAF —
    compacted files land back inside their own part=... dir so
    partition pruning survives, the log lists the union of compacted +
    untouched entries, rows round-trip through the log, and a restarted
    query keeps appending with its original numbering."""
    src = _partitioned_src(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _start_partitioned_stream(spark, src, out, ckpt)
    before = _rowset(spark.read.parquet(out))
    assert len(before) == 10
    assert _pq_count(out) >= 10

    stats = compact_dir(spark, out, max_files=2)
    assert set(stats) == {f"{out}/part=a", f"{out}/part=b"}
    assert _pq_count(out) <= 4
    assert _rowset(spark.read.parquet(out)) == before
    # pruning survives: a partition filter reaches the scan
    df = spark.read.parquet(out).filter("part = 'a'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan
    assert len(df.collect()) == 5

    # re-run is a no-op
    assert compact_dir(spark, out, max_files=2) == {}

    # the stream continues after compaction with no loss/duplication
    spark.createDataFrame(
        [(100, "a")], "id long, part string"
    ).write.mode("append").parquet(src)
    _start_partitioned_stream(spark, src, out, ckpt)
    after = _rowset(spark.read.parquet(out))
    assert len(after) == 11
    assert set(before) <= set(after)


def test_partitioned_sink_log_mixed_thresholds(spark, tmp_path):
    """Only over-threshold leaves are rewritten; an untouched leaf
    keeps its original files byte-for-byte and its log entries
    verbatim."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 6 rows to part=b, 1 row to part=a
    for i in range(6):
        spark.createDataFrame(
            [(i, "b")], "id long, part string"
        ).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(99, "a")], "id long, part string"
    ).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    _start_partitioned_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))
    a_files = sorted(os.listdir(f"{out}/part=a"))

    stats = compact_dir(spark, out, max_files=2)
    assert list(stats) == [f"{out}/part=b"]
    assert sorted(os.listdir(f"{out}/part=a")) == a_files
    assert _rowset(spark.read.parquet(out)) == before


def test_partitioned_sink_log_midflip_crash_recovers(spark, tmp_path):
    """A crash mid-flip on a partitioned sink dir heals exactly like
    the flat case: the next compact_dir restores the log, drops the
    dead attempt's orphans (walking partition subdirs), and completes
    the rewrite with identical rows."""
    from realtime_gmall_flink_spark.streaming import compaction as C

    # 12 batches: the newest log file is a DELTA (the batch-9 .compact
    # is two behind), forcing the multi-file backup+rewrite flip — with
    # a .compact newest the flip is one atomic write and never reaches
    # a second _write_log_file call
    src = _partitioned_src(spark, tmp_path, n=12)
    out = str(tmp_path / "out")
    _start_partitioned_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))

    class Kill(Exception):
        pass

    real_write = C._write_log_file
    calls = {"n": 0}

    def dying_write(meta, name, entries):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise Kill()
        return real_write(meta, name, entries)

    C._write_log_file = dying_write
    try:
        with pytest.raises(Kill):
            compact_dir(spark, out, max_files=2)
    finally:
        C._write_log_file = real_write
    # heal + complete
    stats = compact_dir(spark, out, max_files=2)
    assert stats
    assert _rowset(spark.read.parquet(out)) == before


def test_compact_topics_sweeps_table_dirs(spark, tmp_path):
    root = str(tmp_path / "dws")
    for t in ("t1", "t2"):
        for i in range(10):
            spark.createDataFrame(
                [(i,)], "v long"
            ).write.mode("append").parquet(f"{root}/{t}")
    before = {
        t: _rowset(spark.read.parquet(f"{root}/{t}")) for t in ("t1", "t2")
    }
    stats = compact_topics(spark, root, max_files=4)
    assert set(stats) == {f"{root}/t1", f"{root}/t2"}
    for t in ("t1", "t2"):
        assert _pq_count(f"{root}/{t}") <= 4
        assert _rowset(spark.read.parquet(f"{root}/{t}")) == before[t]


def test_sink_log_dir_noop_below_threshold_returns_empty(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for i in range(3):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, str(tmp_path / "ckpt"))
    # both layouts report below-threshold dirs identically: {}
    assert compact_dir(spark, out, max_files=8) == {}


def test_sink_log_flip_crash_is_recovered(spark, tmp_path):
    """Crash INSIDE the multi-file log flip: the backup manifest exists,
    an earlier log file has already been emptied, and the attempt's
    compacted data files sit in the dir. That intermediate state loses
    rows for a naive reader — recovery (run implicitly by the next
    compact_dir) must restore the original log byte-for-byte, drop the
    crashed run's orphans, and then compact cleanly."""
    import json as _json
    import shutil as _shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))
    assert len(before) == 12

    meta = os.path.join(out, "_spark_metadata")
    log_names = sorted(
        (f for f in os.listdir(meta) if not f.startswith(".")),
        key=lambda f: int(f.split(".")[0]),
    )
    originals = {
        n: open(os.path.join(meta, n), "rb").read() for n in log_names
    }
    # the latest log file must be a DELTA for the multi-file flip path
    assert not log_names[-1].endswith(".compact")

    # hand-build the crash state a mid-flip failure leaves behind
    run = "cafe0123"
    bdir = os.path.join(meta, f".compact-backup-{run}")
    os.makedirs(bdir)
    for n in log_names:
        _shutil.copyfile(os.path.join(meta, n), os.path.join(bdir, n))
    with open(os.path.join(bdir, "MANIFEST"), "w") as f:
        _json.dump({"log_files": log_names, "old_data_files": []}, f)
    # orphan data file from the crashed run
    spark.createDataFrame(
        [(999, "orphan")], "id long, v string"
    ).write.parquet(str(tmp_path / "orphan"))
    part = next(
        f
        for f in os.listdir(str(tmp_path / "orphan"))
        if f.endswith(".parquet")
    )
    _shutil.copy(
        str(tmp_path / "orphan" / part),
        os.path.join(out, f"compacted-{run}-00000.snappy.parquet"),
    )
    # ... and the flip died after emptying the first earlier log file
    victim = [n for n in log_names if not n.endswith(".compact")][0]
    with open(os.path.join(meta, victim), "w") as f:
        f.write("v1")

    assert recover_sink_log_dir(out) is True
    for n in log_names:
        assert open(os.path.join(meta, n), "rb").read() == originals[n]
    assert not any(f.startswith(f"compacted-{run}-") for f in os.listdir(out))
    assert _rowset(spark.read.parquet(out)) == before

    # a fresh compaction on the healed dir round-trips
    stats = compact_dir(spark, out, max_files=8)
    assert stats and _rowset(spark.read.parquet(out)) == before


def test_sink_log_committed_flip_rolls_forward(spark, tmp_path):
    """Crash AFTER the flip completed (COMMITTED marker stamped) but
    before old-file deletion / backup cleanup. The stream may have
    appended — even folded a new .compact referencing the compacted
    files — so recovery must NOT restore the pre-flip log; it finishes
    the job instead: delete the manifest-listed old data files, keep
    the live log, drop the backup."""
    import json as _json
    import shutil as _shutil

    from realtime_gmall_flink_spark.streaming.compaction import (
        recover_sink_log_dir,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))

    # run a REAL compaction, then reconstruct the crash state it would
    # have left mid-phase-2: backup + manifest + COMMITTED, one stale
    # old data file undeleted
    meta = os.path.join(out, "_spark_metadata")
    pre_log = {
        n: open(os.path.join(meta, n), "rb").read()
        for n in os.listdir(meta)
        if not n.startswith(".")
    }
    stats = compact_dir(spark, out, max_files=8)
    assert stats
    post_log = {
        n: open(os.path.join(meta, n), "rb").read()
        for n in os.listdir(meta)
        if not n.startswith(".")
    }
    stale = os.path.join(out, "stale-old-file.snappy.parquet")
    with open(stale, "wb") as f:
        f.write(b"PAR1junkPAR1")
    bdir = os.path.join(meta, ".compact-backup-0ddba11a")
    os.makedirs(bdir)
    for n, content in pre_log.items():
        with open(os.path.join(bdir, n), "wb") as f:
            f.write(content)
    with open(os.path.join(bdir, "MANIFEST"), "w") as f:
        _json.dump(
            {"log_files": sorted(pre_log), "old_data_files": [stale]}, f
        )
    with open(os.path.join(bdir, "COMMITTED"), "w") as f:
        f.write("1")

    assert recover_sink_log_dir(out) is True
    assert not os.path.exists(stale)  # roll-forward finished deletion
    assert not os.path.isdir(bdir)
    for n, content in post_log.items():  # live log untouched
        assert open(os.path.join(meta, n), "rb").read() == content
    assert _rowset(spark.read.parquet(out)) == before


def test_sink_log_recovery_is_idempotent(spark, tmp_path):
    """Recovery itself can crash mid-restore; a second pass must still
    find every manifest-listed file in the backup and converge to the
    same healed state (restore copies out of the backup — it never
    consumes it)."""
    import json as _json
    import shutil as _shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for i in range(6):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))
    meta = os.path.join(out, "_spark_metadata")
    log_names = sorted(
        (f for f in os.listdir(meta) if not f.startswith(".")),
        key=lambda f: int(f.split(".")[0]),
    )
    originals = {
        n: open(os.path.join(meta, n), "rb").read() for n in log_names
    }

    bdir = os.path.join(meta, ".compact-backup-feed0001")
    os.makedirs(bdir)
    for n in log_names:
        _shutil.copyfile(os.path.join(meta, n), os.path.join(bdir, n))
    with open(os.path.join(bdir, "MANIFEST"), "w") as f:
        _json.dump(log_names, f)
    # simulate a crash mid-flip AND a prior recovery attempt that died
    # after restoring only the first file: live log half-mangled, but
    # the backup is complete
    with open(os.path.join(meta, log_names[0]), "w") as f:
        f.write("v1")

    # two consecutive recoveries: both succeed, same healed state
    assert recover_sink_log_dir(out) is True
    # re-create the crash state for the second pass (backup was cleaned
    # up by the successful first pass)
    os.makedirs(bdir)
    for n in log_names:
        _shutil.copyfile(os.path.join(meta, n), os.path.join(bdir, n))
    with open(os.path.join(bdir, "MANIFEST"), "w") as f:
        _json.dump(log_names, f)
    assert recover_sink_log_dir(out) is True
    for n in log_names:
        assert open(os.path.join(meta, n), "rb").read() == originals[n]
    assert _rowset(spark.read.parquet(out)) == before


def test_sink_log_backup_without_manifest_is_discarded(spark, tmp_path):
    """Crash DURING backup creation (no manifest yet): the live log was
    never touched, so recovery just discards the partial backup."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for i in range(3):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))
    meta = os.path.join(out, "_spark_metadata")
    bdir = os.path.join(meta, ".compact-backup-deadbeef")
    os.makedirs(bdir)
    with open(os.path.join(bdir, "0"), "w") as f:
        f.write("half-copied")

    assert recover_sink_log_dir(out) is False
    assert not os.path.isdir(bdir)
    assert _rowset(spark.read.parquet(out)) == before


def test_sink_log_flip_killpoint_fuzz(spark, tmp_path, monkeypatch):
    """Deterministic kill-point sweep over the multi-file flip: inject a
    crash at the 1st/2nd/3rd call of each mutating primitive (backup
    copy, log rewrite), then heal with a plain compact_dir re-run. Every
    kill-point must leave a recoverable dir whose rows after heal +
    compaction equal the pristine baseline — the property the two-phase
    protocol claims for ALL its crash windows, not just the hand-picked
    ones in the tests above."""
    import shutil as real_shutil

    from realtime_gmall_flink_spark.streaming import compaction as C

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)

    class Kill(Exception):
        pass

    real_write = C._write_log_file
    real_copy = real_shutil.copyfile
    cases = [("write_log", n) for n in (1, 2, 3)] + [
        ("copyfile", n) for n in (1, 2, 3)
    ]
    before = None
    for i, (prim, kill_at) in enumerate(cases):
        # each case gets its own streamed sink dir: the log stores
        # ABSOLUTE data-file paths, so copytree'd twins would share
        # (and then compact away) one underlying file set
        out = str(tmp_path / f"case{i}")
        _start_stream(spark, src, out, str(tmp_path / f"ckpt{i}"))
        if before is None:
            before = _rowset(spark.read.parquet(out))
            assert len(before) == 12
        calls = {"n": 0}

        def dying_write(meta, name, entries):
            if prim == "write_log":
                calls["n"] += 1
                if calls["n"] >= kill_at:
                    raise Kill()
            return real_write(meta, name, entries)

        def dying_copy(a, b):
            if prim == "copyfile":
                calls["n"] += 1
                if calls["n"] >= kill_at:
                    raise Kill()
            return real_copy(a, b)

        monkeypatch.setattr(C, "_write_log_file", dying_write)
        monkeypatch.setattr(C.shutil, "copyfile", dying_copy)
        try:
            compact_dir(spark, out, max_files=8)
            died = False
        except Kill:
            died = True
        finally:
            monkeypatch.setattr(C, "_write_log_file", real_write)
            monkeypatch.setattr(C.shutil, "copyfile", real_copy)
        assert died, (prim, kill_at)
        # crash state must still read consistently OR be healed by the
        # next run; either way the re-run compacts and rows round-trip
        stats = compact_dir(spark, out, max_files=8)
        assert stats, (prim, kill_at)
        assert _rowset(spark.read.parquet(out)) == before, (prim, kill_at)
        real_shutil.rmtree(out, ignore_errors=True)


def test_compacting_chained_detail_dir_duplicates(spark, tmp_path):
    """PINNED HAZARD — why the runners' auto-compact hook refuses
    intermediate dirs: a downstream FileStreamSource checkpoint
    remembers the ORIGINAL file names, so after an upstream compaction
    it treats the compacted files as brand-new input and re-processes
    every row. Compaction is only safe for terminal topic dirs (batch
    readers go through the rewritten _spark_metadata and see identical
    rows; the sink's own restart resumes numbering)."""
    src = str(tmp_path / "src")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    os.makedirs(src)
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, a, str(tmp_path / "ck_a"))
    _start_stream(spark, a, b, str(tmp_path / "ck_b"))
    assert spark.read.parquet(b).count() == 12

    compact_dir(spark, a, max_files=4)
    spark.createDataFrame(
        [(100, "late")], "id long, v string"
    ).write.mode("append").parquet(src)
    _start_stream(spark, src, a, str(tmp_path / "ck_a"))
    _start_stream(spark, a, b, str(tmp_path / "ck_b"))
    # 13 would mean chained sources dedup compacted files — they don't:
    # the 12 pre-compaction rows are re-read from the compacted files
    assert spark.read.parquet(b).count() == 12 + 1 + 12


def test_sink_log_dir_ignores_orphan_files(spark, tmp_path):
    """Crash window of the log-dir path: compacted data files written
    but the log NOT yet flipped. Readers resolve through the log, so the
    orphans must be invisible — no duplicates, no phantom rows — and a
    subsequent compaction run still round-trips."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    for i in range(10):
        spark.createDataFrame([(i, f"v{i}")], "id long, v string").write.mode(
            "append"
        ).parquet(src)
    _start_stream(spark, src, out, str(tmp_path / "ckpt"))
    before = _rowset(spark.read.parquet(out))

    # simulate the crashed attempt: valid-looking parquet dropped into
    # the dir without a log entry
    spark.createDataFrame(
        [(999, "orphan")], "id long, v string"
    ).write.parquet(str(tmp_path / "orphan"))
    import shutil

    part = next(
        f
        for f in os.listdir(str(tmp_path / "orphan"))
        if f.endswith(".parquet")
    )
    shutil.copy(
        str(tmp_path / "orphan" / part),
        os.path.join(out, "compacted-deadbeef-99999.snappy.parquet"),
    )

    assert _rowset(spark.read.parquet(out)) == before
    compact_dir(spark, out, max_files=4)
    assert _rowset(spark.read.parquet(out)) == before


def test_media_and_curation_batch_dirs_compact_with_reader_dedup(
    spark, tmp_path
):
    """The r8 ingest side outputs (media_stats, scored_docs) are
    claimed compaction-eligible: compact their batch=N trees AFTER a
    checkpoint-loss replay (so stale-batch duplicate rows exist on
    disk) and assert the READER-level results — which dedup by key
    against exactly those stale rows — are unchanged. Compaction must
    preserve duplicates as stored rows (it is a file rewrite, not a
    semantic merge); the dedup stays the reader's job."""
    import shutil

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.media import (
        synth_media_from_docs,
    )
    from realtime_gmall_flink_spark.plans.textops import _docs
    from realtime_gmall_flink_spark.streaming import curation as CU
    from realtime_gmall_flink_spark.streaming import media_ingest as MI

    sf = "/root/testdata/sf0.001"

    # --- media: two batches, lose the checkpoint, replay into batch=0
    msrc = str(tmp_path / "m_arrivals")
    mout = str(tmp_path / "m_out")
    mckpt = str(tmp_path / "m_ckpt")
    media = synth_media_from_docs(_docs(spark, sf))
    media.filter(F.col("media_id") < 40).write.mode("append").parquet(msrc)
    MI.run_media_ingest(spark, msrc, mout, mckpt).awaitTermination()
    media.filter(
        (F.col("media_id") >= 40) & (F.col("media_id") < 60)
    ).write.mode("append").parquet(msrc)
    MI.run_media_ingest(spark, msrc, mout, mckpt).awaitTermination()
    shutil.rmtree(mckpt)
    MI.run_media_ingest(spark, msrc, mout, mckpt).awaitTermination()

    before = _rowset(MI.read_media_stats(spark, mout))
    raw_before = spark.read.parquet(f"{mout}/media_stats").count()
    stats = compact_dir(spark, f"{mout}/media_stats", max_files=1)
    assert stats  # the replayed tree was fragmented enough to rewrite
    for leaf in stats:
        assert _pq_count(leaf) <= 1
    # stored rows (incl. stale-batch duplicates) survive byte-for-row…
    assert spark.read.parquet(f"{mout}/media_stats").count() == raw_before
    # …and the deduping reader sees the identical result
    assert _rowset(MI.read_media_stats(spark, mout)) == before

    # --- curation: same lifecycle over scored_docs
    csrc = str(tmp_path / "c_arrivals")
    cout = str(tmp_path / "c_out")
    cckpt = str(tmp_path / "c_ckpt")
    docs = _docs(spark, sf)
    docs.filter(F.col("doc_id") < 300).select("doc_id", "text").write.mode(
        "append"
    ).parquet(csrc)
    CU.run_curation_ingest(spark, csrc, cout, cckpt).awaitTermination()
    docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 500)
    ).select("doc_id", "text").write.mode("append").parquet(csrc)
    CU.run_curation_ingest(spark, csrc, cout, cckpt).awaitTermination()
    shutil.rmtree(cckpt)
    CU.run_curation_ingest(spark, csrc, cout, cckpt).awaitTermination()

    funnel_before = _rowset(CU.finalize_curation(spark, cout))
    craw = spark.read.parquet(f"{cout}/scored_docs").count()
    cstats = compact_dir(spark, f"{cout}/scored_docs", max_files=1)
    assert cstats
    assert spark.read.parquet(f"{cout}/scored_docs").count() == craw
    assert _rowset(CU.finalize_curation(spark, cout)) == funnel_before


# --- index-layout compaction (indexutil.compact_layout) --------------------


def _files_per_unit(root):
    import os

    out = {}
    for e in sorted(os.listdir(root)):
        p = os.path.join(root, e)
        if os.path.isdir(p) and "=" in e:
            out[e] = len(
                [f for f in os.listdir(p) if f.endswith(".parquet")]
            )
    return out


def test_index_compact_partitioned_preserves_probe_results(spark, tmp_path):
    """ivfpq_compact over an append-heavy layout: many tiny appends
    leave many files per cell; compaction shrinks each oversized cell
    to one file, preserves row counts, keeps the payload column, and
    the probe returns BIT-IDENTICAL results before and after (the
    rewrite moves whole rows, never values)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        ivfpq_append,
        ivfpq_build,
        ivfpq_compact,
        ivfpq_probe,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "cpq")
    ivfpq_build(emb, idx, payload_cols=("label",))
    corpus = emb
    for i in range(6):
        arr = emb.filter(F.col("vec_id") < 3).select(
            (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        ivfpq_append(spark, idx, arr)
        corpus = corpus.unionByName(arr)
    before_files = _files_per_unit(f"{idx}/codes")
    assert max(before_files.values()) > 3  # appends really fragmented
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    before = ivfpq_probe(
        spark, idx, q, corpus, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    # the drift report carries the fragmentation cue with the compact
    # (not rebuild) remedy
    from realtime_gmall_flink_spark.plans.vectors import ivfpq_drift

    drift = ivfpq_drift(spark, idx, frag_warn=3)
    assert drift["compaction_recommended"] is True
    assert drift["max_unit_files"] > 3
    rep = ivfpq_compact(spark, idx, max_files=3)
    assert rep["units_compacted"] >= 1
    assert rep["files_after"] < rep["files_before"]
    after_files = _files_per_unit(f"{idx}/codes")
    assert all(v <= 3 or before_files[k] <= 3 for k, v in after_files.items())
    after = ivfpq_probe(
        spark, idx, q, corpus, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert after == before
    assert (
        ivfpq_drift(spark, idx, frag_warn=3)["compaction_recommended"]
        is False
    )
    # payload survived the rewrite
    lbl = spark.read.parquet(f"{idx}/codes").select("label")
    assert lbl.filter(lbl["label"].isNull()).count() == 0


def test_index_compact_flat_layout_and_noop(spark, tmp_path):
    """pq_compact (flat codes subdir): the whole-subdir swap compacts
    an append-fragmented PQ layout without changing probe results; a
    layout already under max_files is a no-op that touches nothing."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        QUERY_VEC_ID,
        _emb,
        pq_append,
        pq_build,
        pq_compact,
        pq_probe,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "cp")
    pq_build(emb, idx)
    corpus = emb.select("vec_id", "embedding")
    for i in range(5):
        arr = emb.filter(F.col("vec_id") < 2).select(
            (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"),
            "embedding",
        )
        pq_append(spark, idx, arr)
        corpus = corpus.unionByName(arr)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    before = pq_probe(
        spark, idx, q, corpus, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    rep = pq_compact(spark, idx, max_files=2)
    assert rep["units_compacted"] == 1
    after = pq_probe(
        spark, idx, q, corpus, exclude_vec_id=QUERY_VEC_ID
    ).collect()
    assert after == before
    noop = pq_compact(spark, idx, max_files=2)
    assert noop["units_compacted"] == 0
    assert noop["files_after"] == noop["files_before"]


def test_index_compact_crash_rollback(spark, tmp_path):
    """The crash window between the two swap renames: the live unit is
    missing and its tomb holds the original — recover_compaction (run
    implicitly by the next compact call) ROLLS BACK, and the layout
    reads exactly its pre-crash rows."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.indexutil import recover_compaction
    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivfpq_build,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "crash")
    ivfpq_build(emb, idx)
    codes = f"{idx}/codes"
    rows_before = spark.read.parquet(codes).count()
    unit = sorted(
        e for e in os.listdir(codes) if e.startswith("cid=")
    )[0]
    # manufacture the mid-swap crash: live unit renamed to its tomb,
    # stage debris left behind
    tomb = os.path.join(codes, ".compact-tomb-test")
    stage = os.path.join(codes, ".compact-stage-test")
    os.makedirs(tomb)
    os.makedirs(os.path.join(stage, unit))
    os.rename(os.path.join(codes, unit), os.path.join(tomb, unit))
    assert recover_compaction(codes) is True
    assert os.path.isdir(os.path.join(codes, unit))
    assert not os.path.isdir(tomb) and not os.path.isdir(stage)
    assert spark.read.parquet(codes).count() == rows_before


def test_index_compact_flat_crash_heals_via_compact_and_recover_index(
    spark, tmp_path
):
    """The two previously-unhealed crash shapes: (a) a FLAT layout
    (pq codes) crashed mid-swap — the codes subdir is gone and its
    only copy sits tombed under the INDEX dir — must heal on the next
    compact call (recovery now runs before the missing-dir early
    return); (b) the same state must also heal through recover_index,
    which staged builds and rebuilds run first — otherwise
    staged_index_build would judge the index invalid and rmtree it,
    tomb included."""
    import os

    from realtime_gmall_flink_spark.indexutil import recover_index
    from realtime_gmall_flink_spark.plans.vectors import (
        PQ_SUBDIRS,
        _emb,
        pq_build,
        pq_compact,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)

    def crash_mid_swap(idx):
        codes = os.path.join(idx, "codes")
        rows = spark.read.parquet(codes).count()
        tomb = os.path.join(idx, ".compact-tomb-test")
        os.makedirs(tomb)
        os.rename(codes, os.path.join(tomb, "codes"))
        return codes, rows

    # (a) the next compact call heals before any early return
    idx_a = str(tmp_path / "fa")
    pq_build(emb, idx_a)
    codes_a, rows_a = crash_mid_swap(idx_a)
    rep = pq_compact(spark, idx_a, max_files=10_000)
    assert rep["rolled_back"] is True
    assert spark.read.parquet(codes_a).count() == rows_a
    # (b) recover_index heals it too (the staged-build/rebuild path)
    idx_b = str(tmp_path / "fb")
    pq_build(emb, idx_b)
    codes_b, rows_b = crash_mid_swap(idx_b)
    assert recover_index(idx_b, PQ_SUBDIRS) is True
    assert spark.read.parquet(codes_b).count() == rows_b


def test_index_compact_only_unit_crash_heals(spark, tmp_path):
    """A partitioned layout whose ONLY partition unit was mid-swap:
    the codes dir exists but holds no 'cid=' unit and no parts — the
    old early return skipped recovery and stranded the tomb. The next
    compact call must roll it back and report it."""
    import os

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivfpq_build,
        ivfpq_compact,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "only")
    # single-cell index: one centroid -> exactly one cid= unit
    ivfpq_build(emb, idx, n_centroids=1)
    codes = os.path.join(idx, "codes")
    rows = spark.read.parquet(codes).count()
    unit = [e for e in os.listdir(codes) if e.startswith("cid=")][0]
    tomb = os.path.join(codes, ".compact-tomb-test")
    os.makedirs(tomb)
    os.rename(os.path.join(codes, unit), os.path.join(tomb, unit))
    rep = ivfpq_compact(spark, idx, max_files=10_000)
    assert rep["rolled_back"] is True
    assert spark.read.parquet(codes).count() == rows


def test_refresh_if_drifted_compacts_without_rebuilding(spark, tmp_path):
    """The maintenance entry point routes each problem to its remedy:
    a fragmented-but-not-drifted layout gets COMPACTED (no quantizer
    retrain), and once compacted the next refresh is a full no-op."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        _emb,
        ivfpq_append,
        ivfpq_build,
        ivfpq_refresh_if_drifted,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "mnt")
    ivfpq_build(emb, idx)
    corpus = emb.select("vec_id", "embedding")
    for i in range(5):
        arr = emb.filter(F.col("vec_id") < 2).select(
            (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"),
            "embedding",
        )
        ivfpq_append(spark, idx, arr)
        corpus = corpus.unionByName(arr)
    # tiny appends: far under growth/skew thresholds, over frag_warn
    rep = ivfpq_refresh_if_drifted(
        spark, idx, corpus, frag_warn=3, growth_warn=0.9, skew_warn=50.0
    )
    assert rep["rebuilt"] is False and rep["compacted"] is True
    rep2 = ivfpq_refresh_if_drifted(
        spark, idx, corpus, frag_warn=3, growth_warn=0.9, skew_warn=50.0
    )
    assert rep2["compacted"] is False and rep2["rebuilt"] is False
    assert rep2["max_unit_files"] <= 3


def test_lsh_drift_carries_fragmentation_cue(spark, tmp_path):
    """LSH was the one append-capable family without a fragmentation
    cue: appends land one file per touched bkt_hi partition, so a long
    ingest fragments the probe's pruned scan with nothing flagging it.
    lsh_drift now carries max_unit_files/compaction_recommended (and
    never recommends a rebuild — sign hyperplanes cannot go stale),
    and lsh_refresh_if_fragmented routes the remedy."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.plans.vectors import (
        ANN_BITS,
        _emb,
        lsh_append,
        lsh_build,
        lsh_drift,
        lsh_refresh_if_fragmented,
    )

    from .conftest import SF_DIR

    emb = _emb(spark, SF_DIR)
    idx = str(tmp_path / "lshfrag")
    lsh_build(emb, idx)
    for i in range(6):
        lsh_append(
            spark,
            idx,
            emb.filter(F.col("vec_id") < 4).select(
                (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"),
                "embedding",
            ),
        )
    drift = lsh_drift(spark, idx, frag_warn=3)
    assert drift["bits"] == ANN_BITS
    assert drift["rebuild_recommended"] is False
    assert drift["compaction_recommended"] is True
    assert drift["max_unit_files"] > 3
    n_before = spark.read.parquet(f"{idx}/buckets").count()
    rep = lsh_refresh_if_fragmented(spark, idx, frag_warn=3)
    assert rep["compacted"] is True
    assert spark.read.parquet(f"{idx}/buckets").count() == n_before
    assert (
        lsh_drift(spark, idx, frag_warn=3)["compaction_recommended"]
        is False
    )
    with pytest.raises(ValueError, match="not a valid LSH index"):
        lsh_drift(spark, str(tmp_path / "nope"))
