"""Streaming form of the end-to-end curation pipeline: score documents
ON ARRIVAL (the stateless per-doc stages), then run the corpus-level
stages as a batch FINALIZE over everything ingested — exactly how a
real curation deployment runs (per-doc scoring rides the ingest path;
dedup/decontamination/packing are periodic whole-corpus jobs, since
their semantics are corpus-relative and cannot be decided per batch).

Per micro-batch (foreachBatch, availableNow + checkpoint = exactly
once): arriving (doc_id, text) rows get language, quality score,
normalized fingerprint, and split assignment — all pure codegen
expressions — and land in ``scored_docs/batch=<id>`` (per-batch
overwrite dirs, the replay-idempotent pattern shared with the text/
vector/media ingests).

``finalize_curation`` then applies plans/textops.curation_pipeline_frame
to the accumulated rows — the SAME function the batch catalog entry
(curation_pipeline_counts) runs, so streaming-ingested and batch
pipelines cannot diverge; the parity test pins scored flags AND the
final funnel row against the batch forms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.textops import (
    curation_pipeline_from_scored,
    score_docs,
)

# the stateless per-doc stages, batch or micro-batch alike — ONE
# definition, owned by plans/textops (the batch pipeline runs the
# exact same scorer, so persisted flags cannot drift from it)
score_doc_stream = score_docs


def run_curation_ingest(
    spark: SparkSession, src_dir: str, out_dir: str, ckpt: str
):
    """Start the availableNow ingest over ``src_dir`` (a parquet drop
    dir of (doc_id, text) rows). Returns the started query."""
    from .sources import parquet_topic_ingest

    scored_dir = os.path.join(out_dir, "scored_docs")

    def sink(batch: DataFrame, batch_id: int) -> None:
        score_doc_stream(
            batch.select("doc_id", "text")
        ).write.mode("overwrite").parquet(
            os.path.join(scored_dir, f"batch={batch_id}")
        )

    return parquet_topic_ingest(spark, src_dir, ckpt, sink)


def read_scored_docs(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    from ..indexutil import read_batched

    return read_batched(spark, out_dir, "scored_docs")


def finalize_curation(spark: SparkSession, out_dir: str) -> DataFrame:
    """The corpus-level stages (exact + near-dup dedup, train-split
    decontamination, sequence packing) over everything ingested so far
    — one funnel-count row, identical to the batch catalog entry run
    over the same documents. CONSUMES the persisted ingest-time flags
    (no rescoring pass over the corpus: the scorer is shared with the
    batch pipeline, so the flags are the ones it would compute).
    At-least-once arrivals are safe: dropDuplicates on doc_id keeps
    raw_ct honest and collapses replayed rows.

    The refresh is the staleness barrier for REPEATED finalizes in one
    session: the funnel persist()s its scored subtree, and Spark's
    cache manager matches a later build of the same root path to that
    cache by path equality — so after new batch=N dirs land, a second
    finalize would silently serve the FIRST run's counts (test-pinned).
    refreshByPath drops the stale cache + file listings for this tree
    (and with them the prior run's otherwise-unreleasable cached
    blocks) before the rebuild."""
    scored_dir = os.path.join(out_dir, "scored_docs")
    if os.path.isdir(scored_dir):
        spark.catalog.refreshByPath(scored_dir)
    scored = read_scored_docs(spark, out_dir)
    if scored is None:
        raise FileNotFoundError(f"no scored_docs under {out_dir}")
    return curation_pipeline_from_scored(
        scored.dropDuplicates(["doc_id"])
    )
