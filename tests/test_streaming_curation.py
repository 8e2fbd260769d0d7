"""Streaming curation pipeline: score-on-arrival per-doc stages must
match the batch scoring exactly, survive a checkpointed restart, and
the finalize step over the ingested corpus must produce the SAME
funnel-count row as the batch catalog entry over the same documents.
Plus the CLI `pipeline` verb smoke (batch and streaming modes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.plans.textops import (
    _docs,
    curation_pipeline_frame,
)
from realtime_gmall_flink_spark.streaming import curation as CU

SF_DIR = "/root/testdata/sf0.001"


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(cols).collect()
    )


def _doc_slice(spark, lo, hi):
    return (
        _docs(spark, SF_DIR)
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def test_curation_ingest_and_finalize_match_batch(spark, tmp_path):
    src = str(tmp_path / "drops")
    out = str(tmp_path / "cur_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_slice(spark, 0, 300).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()

    # restart with more arrivals on the same checkpoint
    _doc_slice(spark, 300, 500).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()

    all_docs = _doc_slice(spark, 0, 500)

    # score-on-arrival parity: streaming flags == batch scoring, each
    # doc exactly once (restart added the second slice, no replays)
    scored = CU.read_scored_docs(spark, out)
    assert scored is not None
    assert _rowset(scored) == _rowset(CU.score_doc_stream(all_docs))
    assert scored.count() == all_docs.count()

    # finalize == the batch pipeline over the same documents (the
    # catalog entry runs curation_pipeline_frame over the full table;
    # here both sides see the ingested subset)
    final = CU.finalize_curation(spark, out)
    expected = curation_pipeline_frame(all_docs)
    assert _rowset(final) == _rowset(expected)
    row = final.collect()[0]
    # funnel monotonicity: each stage can only shrink the survivor set
    assert (
        row["raw_ct"]
        >= row["lang_known_ct"]
        >= row["quality_ct"]
        >= row["exact_dedup_ct"]
        >= row["near_dup_ct"]
        >= row["train_ct"]
        >= row["decontam_ct"]
        > 0
    )
    assert row["packed_seq_ct"] > 0
    assert row["packed_token_sum"] > 0


def test_pipeline_cli_batch_and_streaming(spark, tmp_path, capsys):
    from realtime_gmall_flink_spark.__main__ import main

    rc = main(["pipeline", "--sf-dir", SF_DIR])
    assert rc == 0
    batch_out = capsys.readouterr().out
    assert "raw_ct" in batch_out

    src = str(tmp_path / "drops")
    _doc_slice(spark, 0, 500).write.parquet(src)
    rc = main(
        [
            "pipeline",
            "--streaming",
            "--src", src,
            "--out", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    stream_out = capsys.readouterr().out
    assert "raw_ct" in stream_out
    # the full sf0.001 table arrived in one drop, so the streaming CLI
    # run and the batch CLI run print the SAME funnel row
    assert stream_out == batch_out

    # missing --src/--out is a usage error, not a crash
    assert main(["pipeline", "--streaming"]) == 2
    # so is a --src that is not a parquet drop dir
    assert (
        main(
            [
                "pipeline", "--streaming",
                "--src", str(tmp_path / "nope"),
                "--out", str(tmp_path / "out2"),
            ]
        )
        == 2
    )


def test_curation_checkpoint_loss_keeps_funnel_counts_exact(
    spark, tmp_path
):
    """Checkpoint loss after a multi-batch ingest: the re-run re-lists
    every drop into batch 0 while the prior run's batch=1 dir
    survives, so scored rows exist twice on disk — finalize's doc_id
    dedup must keep every funnel count equal to the batch pipeline's
    (the QUIRKS.md stale-batch invariant, pinned here for curation
    like tests/test_streaming_media.py pins it for media)."""
    import shutil

    src = str(tmp_path / "drops")
    out = str(tmp_path / "cur_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_slice(spark, 0, 300).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()
    _doc_slice(spark, 300, 500).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()
    import os

    assert os.path.isdir(os.path.join(out, "scored_docs", "batch=1"))

    shutil.rmtree(ckpt)  # lost checkpoint: everything re-fires as batch 0
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()
    # rows genuinely doubled on disk (raw reader, no dedup) ...
    raw = CU.read_scored_docs(spark, out)
    assert raw.count() > 500
    # ... but the finalize row is still exactly the batch pipeline's
    final = CU.finalize_curation(spark, out)
    expected = curation_pipeline_frame(_doc_slice(spark, 0, 500))
    assert _rowset(final) == _rowset(expected)


def test_repeated_finalize_sees_new_batches_not_stale_cache(
    spark, tmp_path
):
    """The funnel persist()s its scored subtree, and Spark's cache
    manager matches plans to caches by ROOT PATH — so after new
    batch=N dirs land under scored_docs, a second finalize in the same
    session would silently serve the first run's counts without the
    refreshByPath barrier (reproduced before the fix: raw_ct stayed
    at the first run's value). Three finalizes over a growing tree
    must each see the current corpus, and the final funnel must equal
    the batch pipeline over the same docs."""
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "ingest_out")
    ckpt = str(tmp_path / "ckpt")

    _doc_slice(spark, 0, 200).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()
    assert CU.finalize_curation(spark, out).collect()[0]["raw_ct"] == 200

    _doc_slice(spark, 200, 300).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()
    assert CU.finalize_curation(spark, out).collect()[0]["raw_ct"] == 300

    _doc_slice(spark, 300, 400).write.mode("append").parquet(src)
    CU.run_curation_ingest(spark, src, out, ckpt).awaitTermination()
    final = CU.finalize_curation(spark, out)
    expected = curation_pipeline_frame(
        _doc_slice(spark, 0, 400).select("doc_id", "text")
    )
    assert _rowset(final) == _rowset(expected)
