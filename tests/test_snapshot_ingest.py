"""Streaming corpus-version tracking (streaming/snapshot_ingest.py):
batch parity with plans.textops.snapshot_diff, sequential-wave
classification through a restart, and crash-replay reproducibility via
the per-key batch watermark."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import realtime_gmall_flink_spark.streaming.snapshot_ingest as SI
from realtime_gmall_flink_spark.plans.textops import (
    _docs,
    simulated_next_snapshot,
    snapshot_diff,
)

from .conftest import SF_DIR


def _cats(df):
    return {r["doc_id"]: r["category"] for r in df.collect()}


def test_snapshot_ingest_matches_batch_diff(spark, tmp_path):
    """One arrival wave carrying the whole 'next' snapshot classifies
    exactly like the batch diff (minus 'removed', unobservable from
    arrivals), and the classify plan prunes the index read to the
    batch's buckets."""
    base = _docs(spark, SF_DIR)
    nxt = simulated_next_snapshot(base).localCheckpoint(eager=True)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    nxt.select("doc_id", "lang", "text").write.parquet(src)
    SI.run_snapshot_ingest(
        spark, src, idx, out, str(tmp_path / "ckpt")
    ).awaitTermination()
    got = _cats(SI.read_changes(spark, out))
    want = {
        k: v
        for k, v in _cats(snapshot_diff(base, nxt)).items()
        if v != "removed"
    }
    assert got == want
    # the classify plan prunes the index scan by bucket
    plan_df = SI.classify_new_docs(spark, idx, nxt, batch_id=99)
    plan = plan_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan and "fp_bucket" in plan


def test_snapshot_ingest_sequential_waves_with_restart(spark, tmp_path):
    """Wave 2 (a restarted query on the same checkpoint) classifies
    against the index AS UPDATED by wave 1: a doc added in wave 1 and
    re-sent identical in wave 2 is 'unchanged'; re-sent modified is
    'changed'."""
    base = _docs(spark, SF_DIR)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    wave1 = spark.createDataFrame(
        [(900_001, "en", "alpha"), (900_002, "en", "beta")],
        "doc_id long, lang string, text string",
    )
    wave1.write.mode("append").parquet(src)
    SI.run_snapshot_ingest(spark, src, idx, out, ckpt).awaitTermination()
    wave2 = spark.createDataFrame(
        [(900_001, "en", "alpha"), (900_002, "en", "beta v2")],
        "doc_id long, lang string, text string",
    )
    wave2.write.mode("append").parquet(src)
    SI.run_snapshot_ingest(spark, src, idx, out, ckpt).awaitTermination()
    got = _cats(SI.read_changes(spark, out))
    # read_changes unions batches; wave2's categories win per doc in
    # the later batch dir — assert on the per-batch outputs directly
    b0 = _cats(spark.read.parquet(os.path.join(out, "changes/batch=0")))
    b1 = _cats(spark.read.parquet(os.path.join(out, "changes/batch=1")))
    assert b0 == {900_001: "added", 900_002: "added"}
    assert b1 == {900_001: "unchanged", 900_002: "changed"}
    assert set(got) == {900_001, 900_002}


def test_snapshot_ingest_replay_reproduces_categories(spark, tmp_path):
    """The crash-replay window: after a batch applied, re-running the
    SAME batch_id must reproduce the original categories (not reclassify
    its own writes as 'unchanged') and must leave the index
    byte-identical (idempotent re-apply)."""
    base = _docs(spark, SF_DIR)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    batch = spark.createDataFrame(
        [
            (900_001, "en", "brand new"),  # added
            (0, "en", "edited text"),  # changed (doc 0 exists in base)
        ],
        "doc_id long, lang string, text string",
    )
    first = _cats(SI.classify_new_docs(spark, idx, batch, batch_id=7))
    assert first == {900_001: "added", 0: "changed"}
    SI.fp_index_apply(spark, idx, batch, batch_id=7)

    def index_rows():
        return sorted(
            map(
                tuple,
                spark.read.parquet(f"{idx}/fingerprints")
                .select(
                    "doc_id",
                    "fp",
                    "last_batch",
                    "prev_fp",
                    "prev_pres",
                )
                .collect(),
            )
        )

    state1 = index_rows()
    # replay: same batch_id against the already-updated index
    replayed = _cats(SI.classify_new_docs(spark, idx, batch, batch_id=7))
    assert replayed == first
    SI.fp_index_apply(spark, idx, batch, batch_id=7)
    assert index_rows() == state1
    # a LATER batch then sees the applied state: identical content is
    # 'unchanged', and the watermark comparison no longer short-circuits
    later = _cats(SI.classify_new_docs(spark, idx, batch, batch_id=8))
    assert later == {900_001: "unchanged", 0: "unchanged"}


def test_replay_of_null_text_update_is_reproducible(spark, tmp_path):
    """Row presence in the index must key on the watermark column, not
    the fingerprint: an existing NULL-text doc (fp=NULL) updated by a
    batch must replay as 'changed', never 'added' — the md5(NULL)
    trap snapshot_diff documents, applied to the apply path."""
    base = spark.createDataFrame(
        [(1, "en", None), (2, "en", "kept")],
        "doc_id long, lang string, text string",
    )
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    batch = spark.createDataFrame(
        [(1, "en", "now has text")],
        "doc_id long, lang string, text string",
    )
    first = _cats(SI.classify_new_docs(spark, idx, batch, batch_id=4))
    assert first == {1: "changed"}
    SI.fp_index_apply(spark, idx, batch, batch_id=4)
    replayed = _cats(SI.classify_new_docs(spark, idx, batch, batch_id=4))
    assert replayed == first  # presence survived the NULL fingerprint
    # and the inverse edit (text -> NULL) stays 'changed' under replay
    batch2 = spark.createDataFrame(
        [(2, "en", None)], "doc_id long, lang string, text string"
    )
    assert _cats(SI.classify_new_docs(spark, idx, batch2, 5)) == {
        2: "changed"
    }
    SI.fp_index_apply(spark, idx, batch2, 5)
    assert _cats(SI.classify_new_docs(spark, idx, batch2, 5)) == {
        2: "changed"
    }


def test_fresh_checkpoint_over_used_index_refused(spark, tmp_path):
    """Batch ids are only meaningful within one checkpoint lineage.
    The index binds to its first checkpoint via a lineage marker, so a
    DIFFERENT checkpoint is refused by name even when the watermark is
    still 0 — the case a max-watermark guard is blind to (one prior
    batch is indistinguishable from a legit batch-0 replay). The
    original lineage keeps working after the refusal."""
    import pytest as _pytest

    base = _docs(spark, SF_DIR)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    w = spark.createDataFrame(
        [(900_001, "en", "a")], "doc_id long, lang string, text string"
    )
    w.write.mode("append").parquet(src)
    SI.run_snapshot_ingest(
        spark, src, idx, out, str(tmp_path / "ckpt1")
    ).awaitTermination()  # watermark 0 — exactly the blind spot
    q = SI.run_snapshot_ingest(
        spark, src, idx, str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    )
    with _pytest.raises(Exception, match="different checkpoint lineage"):
        q.awaitTermination()
    # the bound lineage continues unharmed
    spark.createDataFrame(
        [(900_002, "en", "b")], "doc_id long, lang string, text string"
    ).write.mode("append").parquet(src)
    SI.run_snapshot_ingest(
        spark, src, idx, out, str(tmp_path / "ckpt1")
    ).awaitTermination()
    b1 = _cats(spark.read.parquet(os.path.join(out, "changes/batch=1")))
    assert b1 == {900_002: "added"}


def test_fp_index_rebuild_rebinds_lineage(spark, tmp_path):
    """The refusal's named remedy must actually work: fp_index_rebuild
    rebuilds over the current corpus AND clears the lineage binding,
    so the next (new) checkpoint binds fresh and ingests cleanly —
    where plain fp_index_build on a complete index is a no-op reuse
    that would leave the operator wedged."""
    base = _docs(spark, SF_DIR)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    spark.createDataFrame(
        [(900_001, "en", "a")], "doc_id long, lang string, text string"
    ).write.mode("append").parquet(src)
    SI.run_snapshot_ingest(
        spark, src, idx, str(tmp_path / "out1"), str(tmp_path / "ckpt1")
    ).awaitTermination()
    # plain rebuild-via-build is a no-op: binding survives, refusal
    # repeats (the wedge the remedy exists to break)
    SI.fp_index_build(base, idx)
    q = SI.run_snapshot_ingest(
        spark, src, idx, str(tmp_path / "outx"), str(tmp_path / "ckpt2")
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="different checkpoint lineage"):
        q.awaitTermination()
    # the real remedy: rebuild + rebind, then the new lineage works
    SI.fp_index_rebuild(base, idx)
    SI.run_snapshot_ingest(
        spark, src, idx, str(tmp_path / "out2"), str(tmp_path / "ckpt3")
    ).awaitTermination()
    got = _cats(SI.read_changes(spark, str(tmp_path / "out2")))
    assert got == {900_001: "added"}  # rebuilt index = base version only


def test_duplicate_doc_pick_is_content_deterministic(spark, tmp_path):
    """A micro-batch carrying the same doc_id twice with DIFFERENT
    texts must resolve to the same copy on every run — dropDuplicates'
    arbitrary pick could disagree between a crashed attempt and its
    replay. The pick is max-fingerprint (content-keyed, order-free)."""
    base = spark.createDataFrame(
        [(9, "en", "base")], "doc_id long, lang string, text string"
    )
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    from pyspark.sql import functions as F

    dup = spark.createDataFrame(
        [(9, "en", "v1"), (9, "en", "v2")],
        "doc_id long, lang string, text string",
    )
    picks = set()
    for _ in range(3):
        rows = SI._prepared_rows(idx, dup.repartition(4), None)
        picks.add(rows.head()["fp"])
    assert len(picks) == 1  # same content chosen every time
    want = max(
        r["fp"]
        for r in dup.select(F.md5("text").alias("fp")).collect()
    )
    assert picks == {want}


def test_reconcile_removed_closes_the_deletion_loop(spark, tmp_path):
    """Ingest + reconcile together reproduce the batch snapshot_diff
    EXACTLY on a remove-heavy next snapshot (the stream observes
    added/changed/unchanged; reconcile_removed supplies the deletions
    absence can't signal), and the index afterwards holds exactly the
    snapshot's keys, so a later re-add classifies 'added' again."""
    base = _docs(spark, SF_DIR)
    # remove-heavy: the simulated next snapshot, then ~2/3 of its docs
    # dropped on top — deletions dominate every other category
    nxt = (
        simulated_next_snapshot(base)
        .filter(F.col("doc_id") % 3 == 0)
        .localCheckpoint(eager=True)
    )
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    nxt.select("doc_id", "lang", "text").write.parquet(src)
    SI.run_snapshot_ingest(
        spark, src, idx, out, str(tmp_path / "ckpt")
    ).awaitTermination()
    rec = SI.reconcile_removed(spark, idx, nxt)
    got = _cats(SI.read_changes(spark, out))
    got.update(_cats(rec))
    want = _cats(snapshot_diff(base, nxt))
    assert got == want
    assert sum(v == "removed" for v in want.values()) > len(want) / 2
    # idempotent: a second reconcile over the same snapshot is empty
    assert SI.reconcile_removed(spark, idx, nxt).count() == 0
    # the index's key set now IS the snapshot's
    left = {
        r[0]
        for r in spark.read.parquet(
            os.path.join(str(tmp_path / "idx"), "fingerprints")
        )
        .select("doc_id")
        .collect()
    }
    assert left == {r[0] for r in nxt.select("doc_id").collect()}


def test_bucket_swap_crash_is_recoverable(spark, tmp_path):
    """The per-bucket rename-swap commit: a crash between the two
    renames leaves the bucket's ORIGINAL rows in a dot-prefixed tomb
    (invisible to readers, so nothing double-counts) and
    recover_fp_buckets — invoked by every classify/apply/reconcile —
    restores it; a tomb next to a live bucket (crash after the new
    data landed) is swept instead."""
    base = _docs(spark, SF_DIR)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    fp = os.path.join(str(tmp_path / "idx"), "fingerprints")
    n_before = spark.read.parquet(fp).count()
    victim = sorted(
        d for d in os.listdir(fp) if d.startswith("fp_bucket=")
    )[0]
    # crash shape 1: live dir gone, tomb holds the originals
    os.rename(
        os.path.join(fp, victim),
        os.path.join(fp, f".tomb-deadbeef-{victim}"),
    )
    assert spark.read.parquet(fp).count() < n_before
    assert SI.recover_fp_buckets(str(tmp_path / "idx")) == 1
    assert spark.read.parquet(fp).count() == n_before
    # crash shape 2: new data landed, stale tomb remains -> swept
    tomb2 = os.path.join(fp, f".tomb-cafe0000-{victim}")
    os.makedirs(tomb2)
    assert SI.recover_fp_buckets(str(tmp_path / "idx")) == 0
    assert not os.path.isdir(tomb2)
    assert spark.read.parquet(fp).count() == n_before
    # crash shape 3 (ADVICE r12): a crash DURING the staged write
    # strands the staging sibling forever — its writer's finally never
    # ran, and the fixed-name reconcile staging would otherwise persist
    # orphaned parquet until another reconcile happened to overwrite
    # it. recover_fp_buckets sweeps both staging shapes.
    idx_dir = str(tmp_path / "idx")
    for orphan in ("fingerprints.reconcile-staging", "fingerprints.staging-7"):
        os.makedirs(os.path.join(idx_dir, orphan, "fp_bucket=0"))
    assert SI.recover_fp_buckets(idx_dir) == 0
    assert not os.path.isdir(
        os.path.join(idx_dir, "fingerprints.reconcile-staging")
    )
    assert not os.path.isdir(
        os.path.join(idx_dir, "fingerprints.staging-7")
    )
    assert spark.read.parquet(fp).count() == n_before


def test_reconcile_refuses_full_clear(spark, tmp_path):
    """A snapshot sharing no keys with the index (wrong dataset, empty
    read) must not silently delete every bucket — a fingerprints dir
    with no parquet parts breaks all later reads. Full replacement is
    a rebuild, not a reconcile."""
    import pytest

    base = _docs(spark, SF_DIR)
    idx = SI.fp_index_build(base, str(tmp_path / "idx"))
    disjoint = base.select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"), "lang", "text"
    )
    n = spark.read.parquet(
        os.path.join(str(tmp_path / "idx"), "fingerprints")
    ).count()
    with pytest.raises(ValueError, match="refusing to clear"):
        SI.reconcile_removed(spark, idx, disjoint)
    with pytest.raises(ValueError, match="refusing to clear"):
        SI.reconcile_removed(spark, idx, base.limit(0))
    # the refusal really protected the layout
    assert (
        spark.read.parquet(
            os.path.join(str(tmp_path / "idx"), "fingerprints")
        ).count()
        == n
    )
