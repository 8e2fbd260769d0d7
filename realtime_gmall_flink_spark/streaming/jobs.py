"""End-to-end streaming jobs and sinks.

- windowed aggregation with watermark (W1-W3): shares tumble_agg with batch.
- memory-sink runner for tests/driver demos (availableNow trigger = process
  everything currently in the source, then stop — the batch-parity mode).
- changelog upsert sink (K2/K3/D1 streaming): per micro-batch latest-row
  dedup merged into a parquet target, keep max version per PK — the
  upsert-kafka/Phoenix analog. Production target would be a lakehouse MERGE
  (same plan shape); parquet keeps the container dependency-free.
- log fan-out (K5): one foreachBatch writing the 5-way split in a single
  checkpointed query, like the reference's five producers in one job.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import latest_row_per_key
from ..operators.windows import tumble_agg

_MEMSINK_SEQ = 0


def _compact_error(exc: BaseException, head: int = 1500, tail: int = 300) -> str:
    """Streaming failures embed the full logical plan in the message; keep
    the head (the actual error) and a sliver of tail so a harness that
    truncates long errors still records the cause."""
    msg = str(exc)
    if len(msg) <= head + tail:
        return msg
    return f"{msg[:head]} ... [{len(msg) - head - tail} chars elided] ... {msg[-tail:]}"


def run_to_memory(
    df: DataFrame, mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Run a streaming DF with availableNow into a memory sink; block until
    done; return the result table. Complete mode surfaces all windows
    (append would hold back windows the final watermark hasn't passed).

    Hardened for external harnesses that share one session across many
    queries: stops lingering active queries first (a leaked query holding
    source/checkpoint state can fail a later start), pins an explicit
    throwaway checkpoint dir (no reliance on implicit temp checkpoints),
    and retries once with fresh state before surfacing a compact error.
    """
    global _MEMSINK_SEQ
    spark = df.sparkSession
    # a previous caller's un-stopped memory-sink query (crash, harness
    # timeout) can wedge the shared session; availableNow runs are finite
    # so a lingering memsink query is leaked state. Only this function's
    # own query family is stopped — concurrent foreachBatch/DWS runners
    # sharing the session are someone else's live work.
    for active in list(spark.streams.active):
        try:
            if (active.name or "").startswith("memsink_"):
                active.stop()
        except Exception:
            pass

    last_err: BaseException | None = None
    for attempt in range(2):
        _MEMSINK_SEQ += 1
        qname = name or f"memsink_{os.getpid()}_{_MEMSINK_SEQ}_{uuid.uuid4().hex[:8]}"
        ckpt = os.path.join(
            tempfile.gettempdir(), f"rtg_ckpt_{qname}_{attempt}"
        )
        q = None
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(qname)
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.table(qname)
        except Exception as exc:  # retry once with fresh name/checkpoint
            last_err = exc
            if q is not None:
                try:
                    q.stop()
                except Exception:
                    pass
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
    raise RuntimeError(
        f"streaming memory-sink run failed after retry: {_compact_error(last_err)}"
    ) from last_err


def streaming_tumble_agg(
    stream: DataFrame,
    ts_col: str,
    size: str,
    dims: list[str],
    aggs: Mapping[str, Column],
    watermark: str = "3 seconds",
) -> DataFrame:
    """W1+W3: watermarked tumbling aggregation (the SQL-job shape,
    DwsTrafficSourceKeywordPageViewWindow.java:81-113)."""
    return tumble_agg(
        stream, ts_col, size, dims, aggs, watermark=watermark
    )


_UPSERT_BUCKET_COL = "pk_bucket"


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet")
        for _root, _, files in os.walk(path)
        for f in files
    )


def hash_bucket(keys: list[str], num_buckets: int) -> Column:
    """THE key-hash bucket expression for hash-bucket-partitioned
    layouts (upsert_sink's target, snapshot_ingest's fingerprint
    index): one definition so two layouts claiming the same bucketing
    cannot silently diverge in hash or cast."""
    return F.pmod(F.xxhash64(*keys), F.lit(num_buckets)).cast("int")


def upsert_sink(
    target_dir: str,
    keys: list[str],
    version_col: str,
    num_buckets: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: collapse the micro-batch to latest-per-key, merge
    with the target, keep max version (D1 applied at the sink boundary).

    The dependency-free stand-in for ``MERGE INTO target USING batch ON
    keys WHEN MATCHED AND batch.version > target.version THEN UPDATE``.
    The target is hash-bucketed on the key (``pk_bucket`` partition
    column); each batch reads back ONLY the buckets its keys hash into
    (partition pruning on the read) and rewrites ONLY those via dynamic
    partition overwrite — merge I/O is proportional to touched buckets,
    not table size. A micro-batch touching k of N buckets leaves the
    other N-k partitions' files untouched on disk.

    ``num_buckets`` is fixed at table creation (it's baked into the
    layout); size it so one bucket ~ one comfortable task at the target
    scale. The per-batch staging write bounds self-overwrite (Spark
    cannot overwrite partitions it is concurrently reading).
    """

    bucket = hash_bucket(keys, num_buckets)

    def write(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        collapsed = latest_row_per_key(
            batch, keys=keys, order_by=[version_col]
        ).withColumn(_UPSERT_BUCKET_COL, bucket)
        if _has_parquet(target_dir):
            # touched-bucket set: bounded by num_buckets, metadata-sized
            touched = [
                r[0]
                for r in collapsed.select(
                    _UPSERT_BUCKET_COL
                ).distinct().collect()
            ]
            if not touched:
                return
            current = spark.read.parquet(target_dir).filter(
                F.col(_UPSERT_BUCKET_COL).isin(touched)
            )
            merged = latest_row_per_key(
                current.unionByName(collapsed),
                keys=keys,
                order_by=[version_col],
            )
        else:
            merged = collapsed
        staging = f"{target_dir.rstrip('/')}.staging-{batch_id}"
        try:
            merged.write.mode("overwrite").parquet(staging)
            (
                spark.read.parquet(staging)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(_UPSERT_BUCKET_COL)
                .parquet(target_dir)
            )
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    return write


def log_fanout_sink(
    split_fn: Callable[[DataFrame], dict[str, DataFrame]],
    base_dir: str,
) -> Callable[[DataFrame, int], None]:
    """K5: one checkpointed query, N append targets (the reference's 5
    Kafka producers, BaseLogApp.java:281-285).

    Exactly-once on retry: each branch writes to a ``batch=<id>``
    subdirectory with overwrite — if the job crashes mid-fan-out (some
    branches written, checkpoint uncommitted), the reprocessed batch
    replaces its own partial output instead of appending a duplicate.
    This is the idempotent-producer analog of the reference's Kafka
    transactions (KafkaUtil.java:26-64); readers see the branch dir as a
    batch-partitioned table."""

    def write(batch: DataFrame, batch_id: int) -> None:
        batch = batch.cache()
        try:
            for name, branch in split_fn(batch).items():
                branch.write.mode("overwrite").parquet(
                    os.path.join(base_dir, name, f"batch={batch_id}")
                )
        finally:
            batch.unpersist()

    return write


def start_foreach_batch(
    stream: DataFrame,
    body: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> "object":
    """Wire a foreachBatch job with availableNow + checkpoint (3 s
    exactly-once checkpoints in the reference -> structured-streaming
    checkpointing here)."""
    return (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 seconds",
) -> DataFrame:
    """W7: streaming duplicate suppression with bounded state — the
    proc-time dedup timer of the reference (keyed state + 10 s timer)
    maps to ``dropDuplicatesWithinWatermark``: a key's duplicates are
    dropped while its first arrival is within the watermark horizon, and
    the key's state is evicted once the watermark passes (the timer
    analog). Unlike dropDuplicates, state does NOT grow with distinct
    keys forever."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
