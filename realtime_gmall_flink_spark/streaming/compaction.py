"""Small-file compaction for streaming parquet topic dirs.

Append-mode sinks write one parquet file per micro-batch per partition
(dws_jobs._start_append_parquet, the jobs.py fan-out, lateness side
outputs). At 100 TB with frequent triggers that is the classic
small-file death: listing cost grows linearly with trigger count and
scan tasks shrink to kilobytes. This module rewrites over-fragmented
directories into size-targeted files, preserving results exactly.

Two layouts:

- Plain / hive-partitioned dirs (foreachBatch appenders, ``late/batch=N``
  side outputs, bucketed upsert targets): each LEAF directory whose
  parquet-file count exceeds the threshold is rewritten independently —
  the touched-bucket pattern, untouched leaves keep their files
  byte-identical.
- Streaming-sink dirs carrying a ``_spark_metadata`` FileStreamSink log:
  readers trust the log, not the directory listing, so the log is
  rewritten in lock-step: every existing log file keeps its NAME (batch
  ids and the arithmetic compact positions must not move), earlier
  entries become header-only, and the latest lists exactly the
  compacted files. PARTITIONED sink dirs compact per partition leaf
  (compacted files go back inside their own ``part=...`` dir, so
  partition pruning survives; under-threshold leaves keep their
  entries verbatim) and flow through the same log flip. Hadoop ``.crc`` sidecars of rewritten files are
  dropped (a stale checksum would fail the next read). The streaming
  query keeps its numbering on restart: the next micro-batch appends
  batch N+1 as if compaction never happened.

Operational contract: run while the writing query is STOPPED (between
availableNow runs, or in the trigger gap of a maintenance window) —
parquet directories are not transactional, and the old-file deletion at
the end of a leaf rewrite is not atomic with the move-in (a crash in
that window leaves duplicate rows that the next compaction pass
removes). Log-dirs are crash-RECOVERABLE rather than crash-atomic:
when the flip must touch more than one log file, the originals are
first copied into a manifest-stamped backup dir inside
``_spark_metadata``; a crash mid-flip is healed by the next
``compact_dir`` call (or an explicit :func:`recover_sink_log_dir`),
which restores the original log byte-for-byte and deletes that
attempt's orphaned ``compacted-*`` data files. The only flip that is a
true single rename is the common steady-state case where the newest
log file is already a ``.compact`` snapshot — then one ``os.replace``
switches readers to the compacted set and no other log file needs to
change. On a lakehouse table (Delta/Iceberg) this whole module is
``OPTIMIZE``; the parquet form keeps the container dependency-free,
same plan shape.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

_META = "_spark_metadata"
_LOG_HEADER = "v1"


def _parquet_files(d: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def _leaf_dirs(root: str):
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames if d != _META and not d.startswith(".")
        ]
        if any(
            f.endswith(".parquet") and not f.startswith(".")
            for f in filenames
        ):
            yield dirpath


def _drop_crc(d: str, name: str) -> None:
    crc = os.path.join(d, f".{name}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def _compact_into(
    spark: SparkSession,
    df,
    dest: str,
    run: str,
    total: int,
    target_bytes: int,
    prefix: str = "",
) -> list[str]:
    """The shared rewrite step of every compaction path: write ``df``
    size-targeted into a staging dir inside ``dest``, rename the parts
    to ``compacted-<run>-<prefix><i>`` names, drop staging. Returns the
    new file paths; deleting the old files is the CALLER's protocol
    (leaf rewrites delete immediately, sink-log paths only after the
    log flip)."""
    n_out = max(1, math.ceil(total / target_bytes))
    staging = os.path.join(dest, f".compact-staging-{run}")
    df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    new_paths = []
    for i, f in enumerate(_parquet_files(staging)):
        name = f"compacted-{run}-{prefix}{i:05d}.snappy.parquet"
        dst = os.path.join(dest, name)
        os.replace(os.path.join(staging, f), dst)
        new_paths.append(dst)
    shutil.rmtree(staging, ignore_errors=True)
    return new_paths


def _rewrite_leaf(
    spark: SparkSession, leaf: str, files: list[str], target_bytes: int
) -> int:
    total = sum(os.path.getsize(os.path.join(leaf, f)) for f in files)
    new_paths = _compact_into(
        spark,
        spark.read.parquet(*[os.path.join(leaf, f) for f in files]),
        leaf,
        uuid.uuid4().hex[:8],
        total,
        target_bytes,
    )
    for f in files:
        os.remove(os.path.join(leaf, f))
        _drop_crc(leaf, f)
    return len(new_paths)


def _read_log_entries(meta: str, name: str) -> list[dict]:
    with open(os.path.join(meta, name)) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    if not lines or lines[0] != _LOG_HEADER:
        raise ValueError(
            f"unrecognized FileStreamSink log format in {meta}/{name}"
        )
    return [json.loads(ln) for ln in lines[1:]]


def _write_log_file(meta: str, name: str, entries: list[dict]) -> None:
    tmp = os.path.join(meta, f".{name}.compact-tmp")
    with open(tmp, "w") as f:
        f.write(_LOG_HEADER)
        for e in entries:
            f.write("\n" + json.dumps(e, separators=(",", ":")))
    os.replace(tmp, os.path.join(meta, name))
    _drop_crc(meta, name)


def _log_file_names(meta: str) -> list[str]:
    names = [
        f
        for f in os.listdir(meta)
        if not f.startswith(".") and f.split(".")[0].isdigit()
    ]
    return sorted(names, key=lambda f: int(f.split(".")[0]))


def _valid_log_entries(meta: str, names: list[str]) -> list[dict]:
    """The file set a reader resolves: the latest ``.compact`` snapshot
    plus every delta after it (CompactibleFileStreamLog semantics)."""
    compacts = [n for n in names if n.endswith(".compact")]
    start = int(compacts[-1].split(".")[0]) if compacts else -1
    entries: list[dict] = []
    for n in names:
        bid = int(n.split(".")[0])
        if n.endswith(".compact"):
            if bid == start:
                entries = list(_read_log_entries(meta, n))
        elif bid > start:
            entries.extend(_read_log_entries(meta, n))
    return [e for e in entries if e.get("action") == "add"]


def _local_path(uri: str) -> str:
    if uri.startswith("file://"):
        return uri[len("file:") :]
    return uri


_BACKUP_PREFIX = ".compact-backup-"
_MANIFEST = "MANIFEST"
_COMMITTED = "COMMITTED"


def _walk_data_dirs(path: str):
    """(dirpath, filenames) for the data tree of a sink dir — _META and
    dot-dirs pruned, staging dirs removed as encountered (they are
    always debris in the stopped-writer windows this module runs in).
    Walks partition subdirs too (partitioned FileStreamSink layout)."""
    for dirpath, dirnames, filenames in os.walk(path):
        for d in list(dirnames):
            if d.startswith(".compact-staging-"):
                shutil.rmtree(
                    os.path.join(dirpath, d), ignore_errors=True
                )
        dirnames[:] = [
            d for d in dirnames if d != _META and not d.startswith(".")
        ]
        yield dirpath, filenames


def _sweep_unreferenced(path: str, meta: str) -> None:
    """Delete parquet data files and staging dirs no log entry anywhere
    references — debris of compactions that crashed before their backup
    existed (compacted-* from a pre-manifest crash) AND old part files
    orphaned by a crash between the single-file .compact flip and its
    old-file deletion loop. Safe: FileStreamSink readers resolve files
    only through the log, and a file absent from EVERY log file (not
    just the valid reader window) is invisible to every reader, present
    or future — a restarted sink writes fresh file names, never these
    (and the sweep only runs in stopped-writer windows: inside
    compact_dir and the runners' pre-start recovery). File identity is
    by basename: Spark part files and our compacted-* names embed a
    UUID, so basenames are unique across partition subdirs."""
    referenced = set()
    for n in _log_file_names(meta):
        try:
            for e in _read_log_entries(meta, n):
                referenced.add(
                    os.path.basename(_local_path(e.get("path", "")))
                )
        except (OSError, ValueError, json.JSONDecodeError):
            return  # mid-flip log state: never sweep on partial info
    for dirpath, filenames in _walk_data_dirs(path):
        for f in filenames:
            if (
                f.endswith(".parquet")
                and not f.startswith(".")
                and f not in referenced
            ):
                os.remove(os.path.join(dirpath, f))
                _drop_crc(dirpath, f)


def recover_sink_log_dir(path: str) -> bool:
    """Heal a crashed multi-file log flip (two-phase). Returns True if
    a roll-back or roll-forward was performed.

    Protocol: a flip that must rewrite more than one log file first
    copies every original into ``_spark_metadata/.compact-backup-<run>/``
    and stamps a MANIFEST (written atomically last, so its presence
    means the backup is complete: ``{"log_files": [...],
    "old_data_files": [...]}``). After every log file is rewritten, a
    COMMITTED marker lands in the backup; only then are the old data
    files deleted and the backup removed. Recovery therefore decides by
    marker, never by guesswork:

    - MANIFEST without COMMITTED → the flip may be half-done: ROLL BACK
      (restore the listed log files byte-for-byte — by copy, so a
      crashed recovery re-runs cleanly — and delete the attempt's
      ``compacted-<run>-*`` files, which no restored entry references).
    - MANIFEST with COMMITTED → the flip finished and newer log files
      may already reference the compacted files: ROLL FORWARD (finish
      deleting the manifest-listed old data files, keep the log as-is).
      Restoring here would corrupt a log the stream has since built on.
    - no MANIFEST → crash during backup; the live log was never
      touched: discard the partial backup.

    Finishes with a sweep of compacted files referenced by NO log entry
    (debris of attempts that died before their backup existed)."""
    meta = os.path.join(path, _META)
    if not os.path.isdir(meta):
        return False
    recovered = False
    for d in sorted(os.listdir(meta)):
        if not d.startswith(_BACKUP_PREFIX):
            continue
        bdir = os.path.join(meta, d)
        manifest = os.path.join(bdir, _MANIFEST)
        if os.path.exists(manifest):
            with open(manifest) as f:
                m = json.load(f)
            # legacy manifests were a bare name list (roll-back only)
            names = m["log_files"] if isinstance(m, dict) else m
            old_files = m.get("old_data_files", []) if isinstance(
                m, dict
            ) else []
            if os.path.exists(os.path.join(bdir, _COMMITTED)):
                for p in old_files:
                    if os.path.exists(p):
                        os.remove(p)
                        _drop_crc(
                            os.path.dirname(p), os.path.basename(p)
                        )
            else:
                for n in names:
                    # COPY out of the backup (tmp + atomic rename),
                    # never move: recovery itself can crash, and a
                    # re-run must still find every manifest-listed file
                    # in the backup
                    tmp = os.path.join(meta, f".{n}.recover-tmp")
                    shutil.copyfile(os.path.join(bdir, n), tmp)
                    os.replace(tmp, os.path.join(meta, n))
                    _drop_crc(meta, n)
                run = d[len(_BACKUP_PREFIX):]
                for dirpath, filenames in _walk_data_dirs(path):
                    for f in filenames:
                        if f.startswith(f"compacted-{run}-"):
                            os.remove(os.path.join(dirpath, f))
                            _drop_crc(dirpath, f)
            recovered = True
        shutil.rmtree(bdir, ignore_errors=True)
    _sweep_unreferenced(path, meta)
    return recovered


def _compact_sink_log_dir(
    spark: SparkSession, path: str, max_files: int, target_bytes: int
) -> dict[str, tuple[int, int]]:
    meta = os.path.join(path, _META)
    recover_sink_log_dir(path)
    names = _log_file_names(meta)
    if not names:
        return {}
    entries = _valid_log_entries(meta, names)
    run = uuid.uuid4().hex[:8]
    partitioned = any(
        "=" in os.path.relpath(_local_path(e["path"]), path)
        for e in entries
    )
    if partitioned:
        # per-PARTITION rewrite (the layout-preserving form the flat
        # path cannot use): group committed entries by their partition
        # leaf, compact only over-threshold leaves back INTO their own
        # leaf (data files of a partitioned FileStreamSink carry no
        # partition columns — the dir name is the value, so a direct
        # file-list read + same-leaf write round-trips exactly), keep
        # under-threshold leaves' entries verbatim, then run the same
        # crash-recoverable log flip over the combined entry list.
        by_part: dict[str, list[dict]] = {}
        for e in entries:
            rel = os.path.relpath(
                os.path.dirname(_local_path(e["path"])), path
            )
            by_part.setdefault("" if rel == "." else rel, []).append(e)
        new_entries: list[dict] = []
        old_local: list[str] = []
        rewritten: dict[str, tuple[int, int]] = {}
        for pidx, pdir in enumerate(sorted(by_part)):
            es = by_part[pdir]
            locs = [_local_path(e["path"]) for e in es]
            if len(locs) <= max_files:
                new_entries.extend(es)
                continue
            leaf = os.path.join(path, pdir)
            total = sum(e.get("size") or 0 for e in es) or sum(
                os.path.getsize(p) for p in locs if os.path.exists(p)
            )
            new_paths = _compact_into(
                spark,
                spark.read.parquet(*locs),
                leaf,
                run,
                total,
                target_bytes,
                prefix=f"{pidx:03d}-",
            )
            new_entries.extend(_add_entry(p) for p in new_paths)
            rewritten[leaf] = (len(locs), len(new_paths))
            old_local.extend(locs)
        if not rewritten:
            return {}
        _flip_log(path, meta, names, run, new_entries, old_local)
        return rewritten

    old_local = [_local_path(e["path"]) for e in entries]
    if len(old_local) <= max_files:
        return {}

    total = sum(e.get("size") or 0 for e in entries) or sum(
        os.path.getsize(p) for p in old_local if os.path.exists(p)
    )
    # read THROUGH the log (spark.read honors _spark_metadata), so
    # exactly the committed file set is compacted
    new_paths = _compact_into(
        spark, spark.read.parquet(path), path, run, total, target_bytes
    )
    new_entries = [_add_entry(p) for p in new_paths]
    _flip_log(path, meta, names, run, new_entries, old_local)
    return {path: (len(old_local), len(new_entries))}


def _add_entry(dst: str) -> dict:
    st = os.stat(dst)
    return {
        "path": f"file://{dst}",
        "size": st.st_size,
        "isDir": False,
        "modificationTime": int(st.st_mtime * 1000),
        "blockReplication": 1,
        "blockSize": 33554432,
        "action": "add",
    }


def _flip_log(
    path: str,
    meta: str,
    names: list[str],
    run: str,
    new_entries: list[dict],
    old_local: list[str],
) -> None:
    # the log flip: the LATEST log file ends up carrying exactly the
    # compacted set. Names (batch ids, .compact suffixes) must not
    # change — the reader finds compact snapshots by batch-id arithmetic
    # and the writer resumes numbering from the latest id.
    #
    # Crash-safety is case-split:
    # - newest file is a .compact snapshot → readers resolve ONLY that
    #   file, so rewriting it is the whole flip: one atomic os.replace,
    #   earlier log files stay untouched (readers and the resuming
    #   writer both ignore pre-snapshot deltas).
    # - newest file is a delta → readers resolve snapshot+deltas, so
    #   every earlier-than-latest file must also become header-only and
    #   no single-file ordering keeps intermediate states exact. Back
    #   the originals up first (manifest written last = backup valid);
    #   any crash mid-flip is healed by recover_sink_log_dir at the
    #   next compaction (restore originals, drop this run's orphans).
    if names[-1].endswith(".compact"):
        _write_log_file(meta, names[-1], new_entries)
        for p in old_local:
            if os.path.exists(p):
                os.remove(p)
                _drop_crc(os.path.dirname(p), os.path.basename(p))
    else:
        bdir = os.path.join(meta, f"{_BACKUP_PREFIX}{run}")
        os.makedirs(bdir)
        for n in names:
            shutil.copyfile(os.path.join(meta, n), os.path.join(bdir, n))
        mtmp = os.path.join(bdir, f".{_MANIFEST}.tmp")
        with open(mtmp, "w") as f:
            json.dump(
                {"log_files": names, "old_data_files": old_local}, f
            )
        os.replace(mtmp, os.path.join(bdir, _MANIFEST))
        for n in names[:-1]:
            _write_log_file(meta, n, [])
        _write_log_file(meta, names[-1], new_entries)
        # phase 2: the flip is complete — mark it so a crash below
        # rolls FORWARD (finish old-file deletion) instead of
        # restoring a log that later batches may build on
        ctmp = os.path.join(bdir, f".{_COMMITTED}.tmp")
        with open(ctmp, "w") as f:
            f.write("1")
        os.replace(ctmp, os.path.join(bdir, _COMMITTED))
        for p in old_local:
            if os.path.exists(p):
                os.remove(p)
                _drop_crc(os.path.dirname(p), os.path.basename(p))
        shutil.rmtree(bdir, ignore_errors=True)


def compact_dir(
    spark: SparkSession,
    path: str,
    max_files: int = 8,
    target_bytes: int = 128 << 20,
) -> dict[str, tuple[int, int]]:
    """Compact one topic directory; returns {dir: (files_before,
    files_after)} for every directory actually rewritten (threshold
    check makes re-runs no-ops). Dispatches on layout: FileStreamSink
    dirs go through the log-rewriting path, everything else is
    per-leaf."""
    if os.path.isdir(os.path.join(path, _META)):
        return _compact_sink_log_dir(spark, path, max_files, target_bytes)
    out: dict[str, tuple[int, int]] = {}
    for leaf in _leaf_dirs(path):
        files = _parquet_files(leaf)
        if len(files) <= max_files:
            continue
        out[leaf] = (
            len(files),
            _rewrite_leaf(spark, leaf, files, target_bytes),
        )
    return out


def compact_topics(
    spark: SparkSession,
    root: str,
    max_files: int = 8,
    target_bytes: int = 128 << 20,
) -> dict[str, tuple[int, int]]:
    """Compact every topic table under a dwd/dws root (one subdir per
    table, the layout run_traffic_user_dws and friends produce)."""
    out: dict[str, tuple[int, int]] = {}
    if not os.path.isdir(root):
        return out
    for table in sorted(os.listdir(root)):
        d = os.path.join(root, table)
        if os.path.isdir(d):
            out.update(compact_dir(spark, d, max_files, target_bytes))
    return out
