"""Corpus-version tracking on arrival — the streaming twin of
plans.textops.snapshot_diff.

A persisted FINGERPRINT INDEX holds the corpus's last-seen content
hash per document (doc_id -> md5(text)), hash-bucket-partitioned on
the key like streaming/jobs.upsert_sink's layout. Each micro-batch of
(doc_id, lang, text) arrivals is classified added / changed /
unchanged against the index, the classification lands in a per-batch
overwrite side output (the log-fanout replay pattern), and the new
fingerprints fold back into ONLY the buckets the batch touched.
'removed' is not observable from an arrival stream (absence is not an
event) — :func:`reconcile_removed` closes that loop: run it
periodically (or at snapshot boundaries) against a current full
snapshot and it emits the 'removed' rows and deletes them from the
index; ingest + reconcile together reproduce the batch snapshot_diff
exactly (pytest-pinned).

Replay safety is the interesting part: foreachBatch can REPLAY a batch
after a crash, and by then the index already holds the batch's own
fingerprints — a naive classify would report every replayed 'added'
doc as 'unchanged' and break exactly-once outputs. Each index row
therefore keeps a per-key batch watermark: (fp, last_batch, prev_fp,
prev_pres). A classify of batch N compares a doc whose row says
last_batch == N against its PREVIOUS state (prev_fp / prev_pres, the
state before N first applied) instead of fp — so a replay reproduces
the first attempt's categories bit-for-bit, and the re-apply writes
the same rows it wrote before (idempotent by construction, not by
hoping the batch never crashes).

Scale: the classify join prunes the index read to the batch's touched
buckets via a literal partition filter (bounded by num_buckets), the
apply rewrites only those buckets through a staged dynamic partition
overwrite (merge IO proportional to touched buckets, not corpus size),
and every projection that moves is (key, 3 fingerprint-ish columns) —
document bodies never shuffle, same argument as snapshot_diff.
"""

from __future__ import annotations

from ..indexutil import read_layout as _read_layout  # noqa: E402

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FP_SUBDIRS = ("fingerprints", "meta")
FP_BUCKETS = 16
_BUCKET_COL = "fp_bucket"


def _fp_rows(docs: DataFrame, num_buckets: int) -> DataFrame:
    """The skinny fingerprint projection of a doc frame: key, lang,
    md5-of-text, bucket (the shared upsert hash_bucket — one bucketing
    contract with the upsert_sink layout). Text never leaves this
    select."""
    from .jobs import hash_bucket

    return docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("fp"),
        hash_bucket(["doc_id"], num_buckets).alias(_BUCKET_COL),
    )


def _prepared_rows(
    index_dir: str, batch: DataFrame, rows: DataFrame | None
) -> DataFrame:
    """The per-batch fingerprint frame classify and apply SHARE —
    md5-over-text, dedup, and the checkpoint happen once per
    micro-batch. The duplicate pick is CONTENT-DETERMINISTIC (max
    fingerprint per key, NULLs last, lang as tiebreak), not
    dropDuplicates' arbitrary first-row: a crash-replayed batch re-runs
    this from the same files and must land on the SAME copy, or the
    watermark replay path would compare against a different
    fingerprint than the first attempt applied."""
    if rows is not None:
        return rows
    nb = _fp_meta(index_dir)["num_buckets"]
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("fp").desc_nulls_last(), F.col("lang").asc_nulls_last()
    )
    return (
        _fp_rows(batch, nb)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )


def _fp_write(docs: DataFrame, num_buckets: int):
    """The shared build/rebuild materialization closure: base-version
    rows (last_batch = -1, no previous state) partitioned by bucket,
    plus the meta row."""
    from ..indexutil import write_meta_into

    spark = docs.sparkSession

    def write(staging: str) -> None:
        rows = _fp_rows(docs.dropDuplicates(["doc_id"]), num_buckets)
        rows.select(
            "doc_id",
            "lang",
            "fp",
            F.lit(-1).cast("long").alias("last_batch"),
            F.lit(None).cast("string").alias("prev_fp"),
            F.lit(0).alias("prev_pres"),
            _BUCKET_COL,
        ).write.partitionBy(_BUCKET_COL).parquet(
            os.path.join(staging, "fingerprints")
        )
        n = _read_layout(spark, 
            os.path.join(staging, "fingerprints")
        ).count()
        write_meta_into(
            spark,
            os.path.join(staging, "meta"),
            {"n_docs": n, "num_buckets": num_buckets},
        )

    return write


def fp_index_build(
    docs: DataFrame, index_dir: str, num_buckets: int = FP_BUCKETS
) -> str:
    """Materialize the fingerprint index from a corpus snapshot
    (staged + atomic rename; complete index reused, debris rebuilt).
    Build-time rows carry last_batch = -1 and no previous state —
    every later arrival classifies against them as the base version."""
    from ..indexutil import staged_index_build

    return staged_index_build(
        index_dir, FP_SUBDIRS, _fp_write(docs, num_buckets)
    )


def _touched_buckets(rows: DataFrame) -> list:
    """The batch's touched-bucket list (bounded by num_buckets) — ONE
    driver collect per micro-batch, shared by classify and apply via
    their ``touched`` parameter."""
    return [
        r[0] for r in rows.select(_BUCKET_COL).distinct().collect()
    ]


def _fp_meta(index_dir: str) -> dict:
    from ..indexutil import read_index_meta

    row = read_index_meta(index_dir)
    if row is None:
        raise ValueError(
            f"not a valid fingerprint index: {index_dir!r} (no meta/)"
            " — rerun fp_index_build"
        )
    return row


def classify_new_docs(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    batch_id: int,
    rows: DataFrame | None = None,
    touched: list | None = None,
) -> DataFrame:
    """(doc_id, lang, fp, category) for an arrival batch vs the index:
    'added' (key never seen), 'changed' (fingerprint differs),
    'unchanged'. The index read prunes to the batch's touched buckets
    (a literal partition filter, bounded by num_buckets). Rows whose
    watermark says THIS batch already applied are classified against
    their pre-batch state, so a crash-replay reproduces the original
    categories (module docstring). ``batch_id`` is meaningful within
    ONE checkpoint lineage — see run_snapshot_ingest. ``rows`` is the
    internal share-the-fingerprints hook (the new_sh/pre_encoded
    convention); ``touched`` shares its bucket list the same way."""
    recover_fp_buckets(index_dir)  # a crashed swap must not read short
    rows = _prepared_rows(index_dir, batch, rows)
    touched = _touched_buckets(rows) if touched is None else touched
    if not touched:
        return rows.select(
            "doc_id", "lang", "fp", F.lit("added").alias("category")
        ).limit(0)
    idx = (
        _read_layout(spark, os.path.join(index_dir, "fingerprints"))
        .filter(F.col(_BUCKET_COL).isin(touched))
        .select(
            "doc_id",
            F.col("fp").alias("__cur"),
            "last_batch",
            "prev_fp",
            "prev_pres",
            F.lit(1).alias("__pres"),
        )
    )
    j = rows.join(idx, "doc_id", "left")
    replay = F.col("last_batch") == F.lit(batch_id)
    # the comparison target: pre-batch state under replay, else current
    old_pres = F.when(
        F.col("__pres").isNull(), F.lit(0)
    ).when(replay, F.col("prev_pres")).otherwise(F.lit(1))
    old_fp = F.when(replay, F.col("prev_fp")).otherwise(F.col("__cur"))
    cat = (
        F.when(old_pres == 0, F.lit("added"))
        .when(old_fp.eqNullSafe(F.col("fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", "lang", "fp", cat.alias("category"))


def fp_index_apply(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    batch_id: int,
    rows: DataFrame | None = None,
    touched: list | None = None,
) -> int:
    """Fold a batch's fingerprints into the index, touched buckets
    only (the upsert_sink merge shape): for each batch key, the row
    becomes (fp=new, last_batch=batch_id, prev_* = the pre-batch
    state). Re-applying the SAME batch_id keeps prev_* frozen at the
    pre-batch state — idempotent under replay. Returns rows upserted.
    Unchanged docs may be skipped by the caller (their row is already
    correct); applying them anyway is harmless. ``rows`` shares the
    prepared fingerprints with classify_new_docs (one md5 pass, one
    duplicate pick per micro-batch); ``touched`` its bucket list."""
    recover_fp_buckets(index_dir)
    rows = _prepared_rows(index_dir, batch, rows)
    touched = _touched_buckets(rows) if touched is None else touched
    if not touched:
        return 0
    fp_path = os.path.join(index_dir, "fingerprints")
    current = (
        _read_layout(spark, fp_path)
        .filter(F.col(_BUCKET_COL).isin(touched))
    )
    old = current.select(
        "doc_id",
        F.col("fp").alias("__cur"),
        F.col("last_batch").alias("__lb"),
        F.col("prev_fp").alias("__pf"),
        F.col("prev_pres").alias("__pp"),
    )
    replay = F.col("__lb") == F.lit(batch_id)
    merged_batch = rows.join(old, "doc_id", "left").select(
        "doc_id",
        "lang",
        "fp",
        F.lit(batch_id).cast("long").alias("last_batch"),
        # pre-batch state: on replay keep the frozen prev_*; first
        # apply shifts the current fp down into prev_fp
        F.when(replay, F.col("__pf")).otherwise(F.col("__cur")).alias(
            "prev_fp"
        ),
        # row presence keys on the WATERMARK column, never on the
        # fingerprint: md5(NULL text) is NULL, so a present row with a
        # NULL fp would read as absent and a replay would reclassify
        # its doc 'added' (the snapshot_diff marker-column rule)
        F.when(F.col("__lb").isNull(), F.lit(0))
        .when(replay, F.col("__pp"))
        .otherwise(F.lit(1))
        .alias("prev_pres"),
        _BUCKET_COL,
    )
    untouched_keys = current.join(
        rows.select("doc_id"), "doc_id", "left_anti"
    )
    merged = untouched_keys.unionByName(merged_batch)
    n = rows.count()
    staging = f"{fp_path.rstrip('/')}.staging-{batch_id}"
    try:
        merged.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(
            staging
        )
        # per-bucket rename swap, NOT dynamic partition overwrite: the
        # overwrite's delete-then-rewrite window could lose a bucket's
        # untouched keys on a hard crash (replay would reclassify those
        # docs 'added'); the swap leaves each bucket old or new, never
        # absent (recover_fp_buckets resolves the tombs)
        _swap_buckets(fp_path, staging, touched)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n


_FP_TOMB = ".tomb-"


def recover_fp_buckets(index_dir: str) -> int:
    """Heal a crashed per-bucket swap (:func:`_swap_buckets`): a tomb
    holds a bucket's ORIGINAL rows (the safe state). Restore it when
    the live bucket dir is missing (the crash hit between the two
    renames), sweep it when the live dir exists (the crash hit after
    the new data landed). Dot-prefixed tombs are invisible to parquet
    readers, so a crashed state never double-counts. Returns the
    number of tombs restored.

    Also sweeps orphaned STAGING siblings (``fingerprints.staging-*``
    from a crashed ingest write, ``fingerprints.reconcile-staging``
    from a crashed reconcile): their writers' ``finally`` never ran,
    and nothing else would ever remove them — the recover_meta
    precedent (it always sweeps ``.meta-new-`` staging). Stopped-writer
    window, like every recovery here."""
    if not os.path.isdir(index_dir):
        return 0
    fp_path = os.path.join(index_dir, "fingerprints")
    fp_name = os.path.basename(fp_path.rstrip("/"))
    for sib in sorted(os.listdir(index_dir)):
        if sib.startswith(f"{fp_name}.staging-") or sib == (
            f"{fp_name}.reconcile-staging"
        ):
            shutil.rmtree(
                os.path.join(index_dir, sib), ignore_errors=True
            )
    if not os.path.isdir(fp_path):
        return 0
    from ..indexutil import resolve_tombed_unit

    restored = 0
    for name in sorted(os.listdir(fp_path)):
        if not name.startswith(_FP_TOMB):
            continue
        # tomb name: .tomb-<hex>-<bucket dirname>
        bucket_dirname = name.split("-", 2)[2]
        restored += resolve_tombed_unit(
            os.path.join(fp_path, name),
            os.path.join(fp_path, bucket_dirname),
        )
    return restored


def _swap_buckets(fp_path: str, staging: str, touched: list) -> None:
    """Commit a touched-bucket rewrite with per-bucket rename swaps
    (the compact_layout protocol) instead of Spark's dynamic partition
    overwrite, whose delete-then-rewrite window can LOSE a bucket's
    untouched keys on a hard crash — a replay would then reclassify
    those docs 'added', contradicting the module's idempotent-replay
    guarantee. Each touched bucket commits via the shared tomb
    protocol (indexutil.commit_unit_swap — reader-invisible in-layout
    placement; an absent staged dir = the bucket emptied, a reconcile
    delete). A crash leaves every bucket either wholly old or wholly
    new, plus at most one tomb :func:`recover_fp_buckets` resolves."""
    import uuid

    from ..indexutil import commit_unit_swap

    for b in touched:
        dirname = f"{_BUCKET_COL}={b}"
        commit_unit_swap(
            os.path.join(fp_path, dirname),
            os.path.join(staging, dirname),
            os.path.join(
                fp_path, f"{_FP_TOMB}{uuid.uuid4().hex[:8]}-{dirname}"
            ),
        )


def reconcile_removed(
    spark: SparkSession,
    index_dir: str,
    snapshot: DataFrame,
    apply: bool = True,
) -> DataFrame:
    """The deletion leg an arrival stream cannot observe (absence is
    not an event): compare the index's key set against a CURRENT full
    snapshot and return (doc_id, lang, category='removed') for every
    indexed key the snapshot no longer holds; with ``apply`` (the
    default) those rows are also DELETED from the index, so later
    re-adds classify 'added' again. classify_new_docs output plus this
    reconcile together reproduce plans.textops.snapshot_diff exactly.

    Scale: the detection is ONE left-anti join of skinny key
    projections (the snapshot side is doc_id only — bodies never
    load); the delete rewrites ONLY buckets that lost keys. The
    removed frame is MATERIALIZED before the rewrite, so the returned
    DataFrame stays correct after apply mutates the layout it was
    derived from. Idempotent: a second reconcile over the same
    snapshot removes nothing. Stopped-writer window, like every index
    maintenance op (don't race the streaming sink)."""
    recover_fp_buckets(index_dir)
    _fp_meta(index_dir)  # refuse non-indexes by name
    fp_path = os.path.join(index_dir, "fingerprints")
    idx = _read_layout(spark, fp_path)
    removed = (
        idx.join(snapshot.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "lang", _BUCKET_COL)
        .localCheckpoint(eager=True)
    )
    out = removed.select(
        "doc_id", "lang", F.lit("removed").alias("category")
    )
    if not apply:
        return out
    touched = [
        r[0] for r in removed.select(_BUCKET_COL).distinct().collect()
    ]
    if not touched:
        return out
    # refuse a FULL clear by name: a snapshot sharing no keys with the
    # index is almost certainly the wrong dataset (or an empty read),
    # and applying it would delete every bucket — leaving a
    # fingerprints dir with no parquet parts that breaks every later
    # read. Full corpus replacement is a rebuild, not a reconcile.
    n_removed = removed.count()
    n_index = idx.count()
    if n_removed >= n_index:
        raise ValueError(
            "reconcile_removed: the snapshot shares no keys with the"
            f" index ({n_removed} of {n_index} indexed docs would be"
            " removed) — refusing to clear the whole index; if the"
            " corpus really was fully replaced, rebuild it over the"
            " new snapshot (fp_index_rebuild) instead"
        )
    kept = (
        idx.filter(F.col(_BUCKET_COL).isin(touched))
        .join(removed.select("doc_id"), "doc_id", "left_anti")
    )
    staging = f"{fp_path.rstrip('/')}.reconcile-staging"
    try:
        kept.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(
            staging
        )
        _swap_buckets(fp_path, staging, touched)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return out


def run_snapshot_ingest(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    out_dir: str,
    ckpt: str,
):
    """availableNow ingest over a parquet topic dir of (doc_id, lang,
    text) rows: classify each micro-batch against the fingerprint
    index (changes/batch=N side output, per-batch overwrite), then
    fold its fingerprints in. Classify-before-apply plus the per-key
    batch watermark makes the pair replay-safe end to end.

    The watermark is the CHECKPOINT's batch id, so it is meaningful
    within one checkpoint lineage only: re-pointing the ingest at a
    FRESH checkpoint over an already-used index would restart ids at 0
    and misread first-time batches as replays. The index therefore
    records its LINEAGE (a hash of the checkpoint path) on first
    contact, and every subsequent batch refuses a mismatch by name —
    this catches the fresh-checkpoint case even at watermark 0, where
    a max-watermark guard is blind (a legit same-lineage replay of
    batch 0 is indistinguishable by watermark alone). Residual risk,
    documented: deleting and recreating the SAME checkpoint path
    defeats the marker — operator error of the stopped-world class.
    The remedy on refusal is fp_index_rebuild over the current corpus
    (rebuilds AND clears the binding — plain fp_index_build is a no-op
    on a complete index) or a fresh index_dir."""
    from .sources import parquet_topic_ingest

    def sink(batch: DataFrame, batch_id: int) -> None:
        _check_lineage(index_dir, ckpt)
        batch = batch.select("doc_id", "lang", "text")
        # the skinny fingerprint frame is the ONLY thing checkpointed:
        # document bodies are read once (inside the md5 projection) and
        # never materialized per batch
        rows = _prepared_rows(index_dir, batch, None)
        touched = _touched_buckets(rows)
        classified = classify_new_docs(
            spark, index_dir, batch, batch_id, rows=rows, touched=touched
        )
        classified.select("doc_id", "lang", "category").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "changes", f"batch={batch_id}"))
        # one md5 pass, ONE duplicate pick, ONE bucket collect feed
        # both stages
        fp_index_apply(
            spark, index_dir, batch, batch_id, rows=rows, touched=touched
        )

    return parquet_topic_ingest(spark, src_dir, ckpt, sink)


def _check_lineage(index_dir: str, ckpt: str) -> None:
    """Bind the index to ONE checkpoint lineage: first contact writes
    a marker (md5 of the checkpoint's NORMALIZED path — idempotent
    under replay: same lineage rewrites the same bytes), later contact
    from a DIFFERENT checkpoint is refused by name before any batch id
    can be misread as a replay. The refusal's remedy is
    fp_index_rebuild (rebinds) or a fresh index_dir — fp_index_build
    on a complete index is a no-op and would NOT clear the binding."""
    import hashlib

    marker = os.path.join(index_dir, "lineage.txt")
    mine = hashlib.md5(
        _normalized_ckpt(ckpt).encode("utf-8")
    ).hexdigest()
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            have = f.read().strip()
        if have != mine:
            raise ValueError(
                "run_snapshot_ingest: this fingerprint index is bound"
                f" to a different checkpoint lineage ({have[:12]}…,"
                f" yours {mine[:12]}…) — batch ids from a fresh"
                " checkpoint would collide with the recorded"
                " lineage's watermarks; rebuild AND rebind with"
                " fp_index_rebuild(docs, index_dir) over the current"
                " corpus (plain fp_index_build is a no-op on a"
                " complete index), or use a fresh index_dir with the"
                " new checkpoint"
            )
        return
    tmp = f"{marker}.tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(mine)
    os.replace(tmp, marker)


def _normalized_ckpt(ckpt: str) -> str:
    """One canonical spelling per checkpoint location: URI-style paths
    (file:/x, hdfs://…) are taken verbatim (abspath would mangle them
    into cwd-relative strings); filesystem paths resolve through
    realpath so a different cwd or a symlinked spelling of the SAME
    checkpoint is not refused as a foreign lineage."""
    import re

    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ckpt):
        return ckpt
    return os.path.realpath(ckpt)


def fp_index_rebuild(
    docs: DataFrame, index_dir: str, num_buckets: int = FP_BUCKETS
) -> str:
    """Rebuild the fingerprint index IN PLACE over ``docs`` (the
    crash-safe two-rename swap) and CLEAR its checkpoint-lineage
    binding — the remedy the lineage refusal names: the rebuilt index
    reflects the current corpus, and the next ingest lineage to touch
    it binds fresh. Stopped-world window like every rebuild."""
    from ..indexutil import rebuild_index

    out = rebuild_index(index_dir, FP_SUBDIRS, _fp_write(docs, num_buckets))
    # the binding belongs to the OLD lineage; the swap replaced the
    # index dir, but a marker could survive a legacy layout — remove
    # explicitly so the next lineage binds fresh either way
    marker = os.path.join(index_dir, "lineage.txt")
    if os.path.exists(marker):
        os.remove(marker)
    return out


def read_changes(spark: SparkSession, out_dir: str) -> DataFrame | None:
    from ..indexutil import read_batched

    return read_batched(spark, out_dir, "changes")
