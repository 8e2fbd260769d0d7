"""allowedLateness re-fire (W4) as a foreachBatch window corrector.

Flink semantics (DwsTrafficVcChArIsNewPageViewWindow.java:235-237): a
window fires at watermark, then re-fires an updated (accumulating) result
for each late row arriving within ``allowedLateness``; rows later than
that go to a side output. Structured Streaming has no native equivalent —
its watermark both finalizes windows and drops late rows in one knob.

This operator reproduces the semantic in foreachBatch over the raw
stream: an accumulating window-results table merged additively per
micro-batch. Each batch
1. computes its own per-window partial aggregates (map-side combine
   shape: the shuffle moves one row per touched window, not raw events);
2. splits too-late windows off against the stream's high watermark
   (max event time seen across all batches, kept in a one-row metadata
   table — driver-side, metadata-sized) and appends those rows' windows
   to a ``late/`` side output;
3. merges in-time partials into the target by summing with the already
   materialized window rows — the re-fire: a touched window's row is
   replaced by its corrected total, untouched windows are not rewritten
   (the target is partitioned by window-start date, and only touched
   date partitions go through dynamic partition overwrite).

Only additive aggregates (counts/sums) can merge this way — the same
restriction Flink's incremental ReduceFunction windows have.

Replay safety (a foreachBatch body re-runs its batch when the process
crashes before the checkpoint commit):
- the metadata row carries the last MERGED batch_id and is written only
  AFTER the data merge; a replayed batch that already fully merged is
  skipped outright (also keeping its late/in-time classification pinned
  to the watermark it originally saw);
- every accumulated window row is stamped with the batch that last
  touched it; if the crash landed between the data merge and the meta
  write, the replay sees its own stamp and keeps those rows as-is
  instead of adding the batch's partials a second time;
- too-late side outputs go to ``late/batch=<id>`` with overwrite (the
  log_fanout pattern) so a replay replaces its own rows, never appends
  duplicates.

Migration: a ``windows/`` dir from before the replay-guard layout (no
batch-stamp column) is backfilled with a ``-1`` sentinel on read, and a
meta row without ``batch_id`` reads as "no replay guard yet". Old FLAT
``late/`` files (pre-``late/batch=<id>``) are NOT auto-migrated — they
break partition discovery when mixed with the partitioned layout; move
them into a ``late/batch=-1`` subdir or rebuild the target.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WM_TABLE = "_high_watermark"
_LATE_DIR = "late"
_PART_COL = "win_date"
_BATCH_COL = "last_merged_batch"


def _recover_meta(meta_path: str) -> None:
    """The meta write protocol is: build the new row in a sibling
    ``<meta>.tmp-<batch>`` dir, remove the old meta, rename the tmp into
    place. A COMPLETE tmp (Spark stamped its ``_SUCCESS``) therefore IS
    the newest committed meta state, and once it exists the old meta is
    disposable — the crashed writer was about to delete it, and a crash
    mid-``rmtree`` can leave it as a gutted, unreadable directory.
    Recovery ROLLS FORWARD: whenever a complete tmp exists, finish the
    protocol (remove whatever remains of the old meta, rename the
    newest complete tmp into place). Incomplete tmps (crash mid-write —
    the live meta was never touched) are discarded. The replayed batch
    then sees its own batch id in the restored meta and skips, exactly
    as if the write had finished."""
    import shutil

    parent, base = os.path.split(meta_path)
    if not os.path.isdir(parent):
        return
    tmps = [
        d
        for d in os.listdir(parent)
        if d.startswith(f"{base}.tmp-")
        and os.path.isdir(os.path.join(parent, d))
    ]
    complete = sorted(
        (d for d in tmps
         if os.path.exists(os.path.join(parent, d, "_SUCCESS"))),
        key=lambda d: int(d.rsplit("-", 1)[1]),
    )
    if complete:
        newest = complete.pop()
        shutil.rmtree(meta_path, ignore_errors=True)
        os.rename(os.path.join(parent, newest), meta_path)
        tmps.remove(newest)
    for d in tmps:
        shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def _read_meta(spark, meta_path: str):
    """(high watermark, last merged batch_id) or (None, None) when no
    meta exists yet. Only a MISSING path means "fresh target"; an
    existing-but-unreadable meta raises — swallowing corruption would
    silently reset the watermark to None and merge genuinely too-late
    rows as in-time. A legacy meta row without batch_id (pre-replay-
    guard layout) reads defensively as (max_ts, None). A crashed
    atomic-rename meta write is healed first (_recover_meta)."""
    _recover_meta(meta_path)
    if not os.path.isdir(meta_path):
        return None, None
    rows = spark.read.parquet(meta_path).collect()
    if not rows:
        return None, None
    d = rows[0].asDict()
    return d.get("max_ts"), d.get("batch_id")


def late_window_sink(
    target_dir: str,
    ts_col: str,
    size: str,
    dims: list[str],
    aggs: Mapping[str, Column],
    allowed_lateness: str = "10 seconds",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body implementing accumulating windows with
    allowedLateness. ``aggs`` must be additive (sum/count built on input
    columns); output columns are stt, edt, dims, then one column per agg.

    Too-late rows' window partials are appended under
    ``<target>/late/`` (the side-output analog) instead of merging.
    """

    def write(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        meta = os.path.join(target_dir, _WM_TABLE)
        data = os.path.join(target_dir, "windows")
        late = os.path.join(target_dir, _LATE_DIR)

        # replay of a fully merged batch (crash AFTER the meta write,
        # before the checkpoint commit): everything below already
        # happened, and re-classifying against the advanced watermark
        # would judge the batch's own rows late — skip outright. Only
        # the EXACT last-merged batch can legitimately replay; a batch
        # id BEHIND it means the target dir is being driven by a
        # different (fresh) checkpoint whose ids restarted at 0 —
        # silently skipping would drop every early batch, so fail.
        prev_wm, last_merged = _read_meta(spark, meta)
        if last_merged is not None:
            if batch_id < last_merged:
                raise RuntimeError(
                    f"late_window_sink target {target_dir!r}: batch"
                    f" {batch_id} is behind the last merged batch"
                    f" {last_merged}. The target dir is coupled to the"
                    " checkpoint that wrote it (batch ids restart on a"
                    " fresh checkpoint); rebuild the target or restore"
                    " the original checkpoint."
                )
            if batch_id == last_merged:
                return

        win = F.window(F.col(ts_col), size)
        partial = (
            batch.groupBy(win.alias("__w"), *[F.col(d) for d in dims])
            .agg(*[c.alias(n) for n, c in aggs.items()])
            .select(
                F.col("__w.start").alias("stt"),
                F.col("__w.end").alias("edt"),
                *dims,
                *aggs,
            )
            .withColumn(_PART_COL, F.to_date("stt"))
        )
        batch_max = batch.agg(F.max(ts_col)).collect()[0][0]
        if batch_max is None:
            return

        # too-late: window closed before (watermark - lateness). Rows are
        # judged against the PREVIOUS batch's watermark, like Flink, where
        # the watermark only advances behind the records that carried it;
        # before any batch the watermark is -inf (nothing is late).
        if prev_wm is not None:
            horizon = F.lit(prev_wm) - F.expr(
                f"INTERVAL {allowed_lateness}"
            )
            too_late = partial.filter(F.col("edt") <= horizon)
            in_time = partial.filter(F.col("edt") > horizon)
            if too_late.limit(1).count() > 0:
                # per-batch overwrite dir: a replayed batch replaces its
                # own side output instead of appending duplicates
                too_late.drop(_PART_COL).write.mode("overwrite").parquet(
                    os.path.join(late, f"batch={batch_id}")
                )
        else:
            in_time = partial
        in_time = in_time.withColumn(_BATCH_COL, F.lit(batch_id))

        has_target = os.path.isdir(data) and any(
            f.endswith(".parquet")
            for _r, _, files in os.walk(data)
            for f in files
        )
        merged = None
        if has_target:
            touched = [
                r[0]
                for r in in_time.select(_PART_COL).distinct().collect()
            ]
            if touched:
                current = spark.read.parquet(data).filter(
                    F.col(_PART_COL).isin(touched)
                )
                # windows dirs written before the replay-guard layout
                # carry no batch stamps: backfill a sentinel that can
                # never equal a real batch id, so legacy rows merge as
                # ordinary unstamped state
                if _BATCH_COL not in current.columns:
                    current = current.withColumn(
                        _BATCH_COL, F.lit(-1).cast("long")
                    )
                # rows already stamped with THIS batch mean the crash hit
                # between the data merge and the meta write: their totals
                # already include this batch's partials — keep them
                # untouched and add partials only to unstamped windows.
                already = current.filter(F.col(_BATCH_COL) == batch_id)
                stale = current.filter(F.col(_BATCH_COL) != batch_id)
                fresh = in_time.join(
                    already.select("stt", "edt", *dims),
                    on=["stt", "edt", *dims],
                    how="left_anti",
                )
                merged = (
                    stale.unionByName(fresh)
                    .groupBy("stt", "edt", *dims, _PART_COL)
                    .agg(
                        *[F.sum(n).alias(n) for n in aggs],
                        F.max(_BATCH_COL).alias(_BATCH_COL),
                    )
                    .unionByName(already)
                )
        elif in_time.limit(1).count() > 0:
            merged = in_time
        if merged is not None:
            staging = f"{data}.staging-{batch_id}"
            try:
                merged.write.mode("overwrite").parquet(staging)
                (
                    spark.read.parquet(staging)
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(_PART_COL)
                    .parquet(data)
                )
            finally:
                import shutil

                shutil.rmtree(staging, ignore_errors=True)

        # watermark + merged-batch marker advance only after the merge:
        # a crash anywhere above replays with the original classification.
        # The write itself is tmp-then-rename so its own crash windows
        # can only yield missing-or-complete meta (a missing meta reads
        # as fresh, and the batch-stamp guard keeps the re-merge
        # idempotent; _recover_meta restores the complete tmp anyway) —
        # never a partially-written dir that would wedge the sink.
        high_wm = max(prev_wm, batch_max) if prev_wm else batch_max
        ts_type = batch.schema[ts_col].dataType.simpleString()
        meta_tmp = f"{meta}.tmp-{batch_id}"
        spark.createDataFrame(
            [(high_wm, batch_id)], f"max_ts {ts_type}, batch_id long"
        ).write.mode("overwrite").parquet(meta_tmp)
        import shutil

        shutil.rmtree(meta, ignore_errors=True)
        os.rename(meta_tmp, meta)

    return write


def read_windows(spark, target_dir: str) -> DataFrame:
    """Current accumulated window results (post all re-fires)."""
    return spark.read.parquet(os.path.join(target_dir, "windows")).drop(
        _PART_COL, _BATCH_COL
    )


def read_too_late(spark, target_dir: str) -> DataFrame | None:
    path = os.path.join(target_dir, _LATE_DIR)
    if not os.path.isdir(path):
        return None
    # drop the batch=<id> partition dir column (replay bookkeeping)
    return spark.read.parquet(path).drop("batch")
