"""Streaming media ingest parity: foreachBatch decode/feature scoring
of arriving binary blobs must equal the batch computation row-for-row,
survive a checkpointed restart without loss or replay, and replace its
own rows on a replayed batch (per-batch overwrite dirs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.plans.media import synth_media_from_docs
from realtime_gmall_flink_spark.plans.textops import _docs
from realtime_gmall_flink_spark.streaming import media_ingest as MI

SF_DIR = "/root/testdata/sf0.001"


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()
    )


def _media_slice(spark, lo, hi):
    return synth_media_from_docs(_docs(spark, SF_DIR)).filter(
        (F.col("media_id") >= lo) & (F.col("media_id") < hi)
    )


def test_media_ingest_matches_batch_with_restart(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    _media_slice(spark, 0, 40).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()

    # restart with more arrivals on the same checkpoint
    _media_slice(spark, 40, 60).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()

    all_media = _media_slice(spark, 0, 60)

    # stats parity: streaming result == batch scoring of all arrivals
    got_stats = MI.read_media_stats(spark, out)
    assert got_stats is not None
    expected_stats = MI.media_decode_stats(all_media)
    assert _rowset(got_stats) == _rowset(expected_stats)
    # exactly the image-kind rows, once each (no replays, no loss)
    n_images = all_media.filter(F.col("kind") == "image").count()
    assert n_images > 0
    assert got_stats.count() == n_images

    # feature parity: every arriving row (any kind) scored exactly once
    from realtime_gmall_flink_spark.functions.multimodal import (
        extract_features,
    )

    got_feats = MI.read_media_features(spark, out)
    assert got_feats is not None
    assert _rowset(got_feats) == _rowset(extract_features(all_media))
    assert got_feats.count() == all_media.count()

    # resize-stage parity: image rows scored through the chained
    # resize->decode stages exactly once, equal to the batch form and
    # to the media_resize_stats bench headliner for the ingested range
    from realtime_gmall_flink_spark.plans.media import media_resize_stats

    got_resized = MI.read_media_resized(spark, out)
    assert got_resized is not None
    assert _rowset(got_resized) == _rowset(
        MI.media_resize_decode_stats(all_media)
    )
    assert got_resized.count() == n_images
    assert _rowset(got_resized) == _rowset(
        media_resize_stats(spark, SF_DIR).filter(F.col("media_id") < 60)
    )

    # the ingest matches the catalog's driver-green decode stage:
    # stats joined to docs lang == media_image_decode_stats rows for
    # the ingested id range
    from realtime_gmall_flink_spark.plans.media import (
        media_image_decode_stats,
    )

    langs = _docs(spark, SF_DIR).select(
        F.col("doc_id").alias("media_id"), "lang"
    )
    got_entry_form = got_stats.join(langs, "media_id").select(
        "media_id", "lang", "width", "height", "mean_intensity", "byte_len"
    )
    expected_entry = media_image_decode_stats(spark, SF_DIR).filter(
        F.col("media_id") < 60
    )
    assert _rowset(got_entry_form) == _rowset(expected_entry)


def test_media_ingest_replayed_batch_overwrites_itself(spark, tmp_path):
    """A re-fired batch id must REPLACE its rows, not duplicate them:
    simulate the replay by deleting the checkpoint (forces batch 0 to
    re-run over the same files) and re-running the ingest."""
    import shutil

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    _media_slice(spark, 0, 30).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()
    first = _rowset(MI.read_media_stats(spark, out))
    first_rs = _rowset(MI.read_media_resized(spark, out))

    shutil.rmtree(ckpt)  # lost checkpoint => batch 0 re-fires
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()
    again = _rowset(MI.read_media_stats(spark, out))
    assert again == first
    assert _rowset(MI.read_media_resized(spark, out)) == first_rs

    # batch dirs exist and carry the bookkeeping layout
    assert os.path.isdir(os.path.join(out, "media_stats", "batch=0"))
    assert os.path.isdir(os.path.join(out, "media_resized", "batch=0"))


def test_media_ingest_checkpoint_loss_after_multiple_batches(
    spark, tmp_path
):
    """Checkpoint loss after a MULTI-batch run: the re-run lists every
    source file into batch 0, overwriting batch=0 but leaving the
    prior run's batch=1 dir in place — the readers' media_id dedup
    must keep the result equal to the batch computation (each row
    exactly once), not doubled."""
    import shutil

    from realtime_gmall_flink_spark.functions.multimodal import (
        extract_features,
    )

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    _media_slice(spark, 0, 40).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()
    _media_slice(spark, 40, 60).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()
    assert os.path.isdir(os.path.join(out, "media_stats", "batch=1"))

    shutil.rmtree(ckpt)  # lost checkpoint: everything re-fires as batch 0
    MI.run_media_ingest(spark, src, out, ckpt).awaitTermination()

    all_media = _media_slice(spark, 0, 60)
    got_stats = MI.read_media_stats(spark, out)
    assert _rowset(got_stats) == _rowset(MI.media_decode_stats(all_media))
    assert got_stats.count() == all_media.filter(
        F.col("kind") == "image"
    ).count()
    got_feats = MI.read_media_features(spark, out)
    assert _rowset(got_feats) == _rowset(extract_features(all_media))
    assert got_feats.count() == all_media.count()

    got_resized = MI.read_media_resized(spark, out)
    assert _rowset(got_resized) == _rowset(
        MI.media_resize_decode_stats(all_media)
    )


def test_media_feature_dim_change_after_checkpoint_loss(spark, tmp_path):
    """The ADVICE r8 scenario: features are only deterministic per
    (media_id, dim). After a checkpoint loss, a re-ingest at a
    DIFFERENT feature_dim overwrites batch=0 but leaves the prior
    run's stale batch=1 rows (old dim) on disk — the reader's dim
    filter must keep the two populations apart instead of letting the
    media_id dedup keep an arbitrary-dim survivor."""
    import shutil

    from realtime_gmall_flink_spark.functions.multimodal import (
        extract_features,
    )

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    _media_slice(spark, 0, 40).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt, feature_dim=16).awaitTermination()
    _media_slice(spark, 40, 60).write.mode("append").parquet(src)
    MI.run_media_ingest(spark, src, out, ckpt, feature_dim=16).awaitTermination()

    shutil.rmtree(ckpt)  # loss; re-ingest everything at a new dim
    MI.run_media_ingest(spark, src, out, ckpt, feature_dim=8).awaitTermination()

    all_media = _media_slice(spark, 0, 60)
    # the new dim sees every row exactly once, scored at dim 8
    got8 = MI.read_media_features(spark, out, feature_dim=8)
    assert _rowset(got8) == _rowset(extract_features(all_media, dim=8))
    # the old dim sees only the stale batch=1 leftovers — and every one
    # of those is a genuine dim-16 vector, not a mixed-dim survivor
    got16 = MI.read_media_features(spark, out, feature_dim=16)
    assert _rowset(got16) == _rowset(
        extract_features(_media_slice(spark, 40, 60), dim=16)
    )


def test_media_feature_reads_survive_legacy_and_new_batches_mixed(
    spark, tmp_path
):
    """A tree mixing PRE-dim-column batches with new ones must not let
    schema inference drop the dim column (plain parquet inference
    samples one file — if it samples a legacy batch the filter guard
    silently disengages): the read merges schemas. A legacy row's dim
    is unrecorded and ASSUMED to be the ingest default (16): it
    satisfies only a default-dim request — letting it match anything
    would hand a consumer mixed-width vectors — and loses the
    per-media dedup to a known-dim row."""
    import os

    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.multimodal import (
        extract_features,
    )

    out = str(tmp_path / "mixed_out")
    feat = os.path.join(out, "media_features")

    # legacy batch=0: no feature_dim column, really dim 16, media 0-40
    extract_features(_media_slice(spark, 0, 40), dim=16).write.parquet(
        os.path.join(feat, "batch=0")
    )
    # new batch=1: recorded dim 8, media 20-60 (overlaps 20-40)
    extract_features(_media_slice(spark, 20, 60), dim=8).withColumn(
        "feature_dim", F.lit(8)
    ).write.parquet(os.path.join(feat, "batch=1"))

    # request dim 8: ONLY recorded dim-8 rows — legacy unknowns are
    # assumed dim 16 and must NOT fill the 0-20 gap with 16-wide
    # vectors (uniform width for the consumer)
    got8 = MI.read_media_features(spark, out, feature_dim=8)
    assert _rowset(got8) == _rowset(
        extract_features(_media_slice(spark, 20, 60), dim=8)
    )
    widths = {r[0] for r in got8.select(F.size("feature")).collect()}
    assert widths == {8}

    # request dim 16 (the legacy default): known dim-8 rows filtered
    # OUT, legacy rows survive under the default-dim assumption — no
    # silent loss, and every returned vector is 16-wide
    got16 = MI.read_media_features(spark, out, feature_dim=16)
    assert _rowset(got16) == _rowset(
        extract_features(_media_slice(spark, 0, 40), dim=16)
    )
    widths16 = {r[0] for r in got16.select(F.size("feature")).collect()}
    assert widths16 == {16}


def test_media_feature_read_refuses_nondefault_dim_on_pure_legacy(
    spark, tmp_path
):
    """A NON-default dim requested against a tree whose only rows are
    legacy must raise BY NAME (ADVICE r9) — the filter would empty a
    non-empty tree and the caller could not tell 'wrong dim against
    legacy data' from 'nothing ingested'. A default-dim request keeps
    reading the legacy rows; a tree holding only OTHER recorded dims
    returns the honest empty frame (diagnosable — dims are recorded)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.multimodal import (
        extract_features,
    )

    out = str(tmp_path / "legacy_out")
    feat = os.path.join(out, "media_features")
    extract_features(_media_slice(spark, 0, 20), dim=16).write.parquet(
        os.path.join(feat, "batch=0")
    )
    with _pytest.raises(ValueError, match="LEGACY_FEATURE_DIM"):
        MI.read_media_features(spark, out, feature_dim=8)
    assert MI.read_media_features(spark, out, feature_dim=16).count() == 20

    # recorded-but-different dims: empty result, no raise
    out2 = str(tmp_path / "recorded_out")
    extract_features(_media_slice(spark, 0, 10), dim=4).withColumn(
        "feature_dim", F.lit(4)
    ).write.parquet(os.path.join(out2, "media_features", "batch=0"))
    assert MI.read_media_features(spark, out2, feature_dim=8).count() == 0

    # MIXED tree (legacy + recorded-other-dim): the recorded rows make
    # the miss diagnosable — honest empty frame, no raise
    extract_features(_media_slice(spark, 10, 15), dim=16).write.parquet(
        os.path.join(out2, "media_features", "batch=1")
    )
    assert MI.read_media_features(spark, out2, feature_dim=8).count() == 0
