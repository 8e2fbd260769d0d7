"""Streaming media ingest: score-on-arrival for binary blobs — the
multimodal twin of text_ingest/vector_ingest (closes the last ingest
gap: text and embeddings had streaming parity, media did not).

Arriving media rows (media_id, kind, content binary, width, height,
sample_rate, duration_ms) on a file stream get, per micro-batch
(foreachBatch; both scorers are Arrow-batched mapInPandas — no state,
no shuffle of the arriving blobs):

- image-kind rows: fake-codec decode stats (width/height/mean
  intensity/byte length) -> ``media_stats/batch=<id>``;
- image-kind rows: the chained resize(8x8)->decode stats (the
  score-on-arrival twin of the media_resize_stats bench headliner)
  -> ``media_resized/batch=<id>``;
- ALL rows: the byte-histogram feature vector (the stand-in embedding
  extractor) -> ``media_features/batch=<id>``.

Per-batch OVERWRITE dirs make replays idempotent (a re-fired batch id
replaces its own rows — the same log-fanout replay pattern as the text
and vector ingests), and availableNow + checkpoint gives exactly-once
across restarts.

The batch twin is plans/media.media_image_decode_stats (driver-green):
``media_decode_stats`` here IS its decode stage, so the streaming==
batch parity test compares against the very frame the catalog entry
serves. Codec is pinned to the deterministic fake — the synthesized
blobs are not real images (functions/multimodal.decode_images:51).

Scale: per micro-batch work is two map-only mapInPandas passes over
the arriving rows; nothing reads the corpus, nothing shuffles, and
the per-batch output dirs are compaction-eligible like every other
ingest side output (streaming/compaction.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import decode_images, extract_features

# the chained resize->decode scoring — ONE definition, owned by
# plans/media (the catalog's bench headliner runs the exact same
# chain, so ingest-time resize stats cannot drift from it; same
# ownership pattern as streaming/curation.score_doc_stream)
from ..plans.media import resize_decode_stats as media_resize_decode_stats


def media_decode_stats(media: DataFrame) -> DataFrame:
    """The per-batch image scoring, usable on batch or micro-batch
    frames alike — the parity tests run both forms. Matches the
    decode stage of the media_image_decode_stats catalog entry."""
    return decode_images(media, codec="fake").select(
        "media_id",
        "width",
        "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.col("byte_len").cast("long").alias("byte_len"),
    )


# the feature_dim a PRE-dim-column batch is assumed to carry: the
# parameter's default since the ingest gained it, and the only value
# this repo's own runs ever used — the same provenance argument the
# index-meta migration makes for unrecorded build parameters
LEGACY_FEATURE_DIM = 16


def run_media_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    ckpt: str,
    feature_dim: int = 16,
    resize_w: int = 8,
    resize_h: int = 8,
):
    """Start the availableNow ingest over ``src_dir`` (a parquet topic
    dir of media rows). Returns the started query."""
    from .sources import parquet_topic_ingest

    stats_dir = os.path.join(out_dir, "media_stats")
    feat_dir = os.path.join(out_dir, "media_features")
    resized_dir = os.path.join(out_dir, "media_resized")

    def sink(batch: DataFrame, batch_id: int) -> None:
        # one materialization of the arriving blobs feeds all scorers
        # (without it each write would re-read the batch's source files)
        batch = batch.localCheckpoint(eager=True)
        media_decode_stats(batch).write.mode("overwrite").parquet(
            os.path.join(stats_dir, f"batch={batch_id}")
        )
        media_resize_decode_stats(
            batch, out_w=resize_w, out_h=resize_h
        ).write.mode("overwrite").parquet(
            os.path.join(resized_dir, f"batch={batch_id}")
        )
        # feature rows carry their extraction dim: after a checkpoint
        # loss a re-ingest at a different dim must not be silently
        # mixed with the prior run's stale batch=N rows — the reader
        # filters on it (ADVICE r8)
        extract_features(batch, dim=feature_dim).withColumn(
            "feature_dim", F.lit(int(feature_dim))
        ).write.mode("overwrite").parquet(
            os.path.join(feat_dir, f"batch={batch_id}")
        )

    return parquet_topic_ingest(spark, src_dir, ckpt, sink)


def read_media_stats(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Both readers dedup by media_id: per-batch overwrite dirs make a
    REPLAYED batch id replace itself, but a LOST checkpoint re-lists
    every source file into batch 0 while later batch=N dirs from the
    prior run still hold their rows — without the dedup those rows
    would read double (the scoring is deterministic per media_id, so
    any surviving copy is the right one; the text/vector ingests make
    the same at-least-once argument at their fold-in joins)."""
    from ..indexutil import read_batched

    df = read_batched(spark, out_dir, "media_stats")
    return None if df is None else df.dropDuplicates(["media_id"])


def read_media_resized(
    spark: SparkSession, out_dir: str, out_w: int = 8, out_h: int = 8
) -> DataFrame | None:
    """Resize-stage reader: rows are self-describing (width/height ==
    the resize parameters), so a checkpoint-loss re-ingest at a
    different size leaves filterable — not silently mixed — rows; the
    filter runs BEFORE the dedup so a surviving copy is always from
    the requested geometry."""
    from ..indexutil import read_batched

    df = read_batched(spark, out_dir, "media_resized")
    if df is None:
        return None
    return df.filter(
        (F.col("width") == out_w) & (F.col("height") == out_h)
    ).dropDuplicates(["media_id"])


def read_media_features(
    spark: SparkSession, out_dir: str, feature_dim: int = 16
) -> DataFrame | None:
    """Feature rows persist their extraction dim (the scoring is only
    deterministic per (media_id, dim) — ADVICE r8): filter to the
    requested dim BEFORE the at-least-once dedup so mixed-dim leftovers
    from a pre-checkpoint-loss run can never be the surviving copy.

    Legacy (pre-dim-column) batches can coexist in one tree with new
    ones, so the read MERGES schemas (plain inference samples one file
    and would silently drop the column — making the guard vacuous —
    whenever a legacy batch is sampled first). A legacy row's dim is
    unrecorded and ASSUMED to be the ingest default
    (``LEGACY_FEATURE_DIM`` — the migrate_premeta_default contract
    applied per row): it satisfies only a default-dim request, never
    an arbitrary one (letting it match anything would hand a consumer
    mixed-width vectors), and it LOSES the per-media dedup to a row
    whose recorded dim matches, so a replay at a known dim supersedes
    stale unknown rows. The bookkeeping column is dropped after the
    filter; consumers see the bare extract_features shape.

    A NON-default dim requested against a tree whose ONLY rows are
    legacy is refused BY NAME (a limit-1 probe short-circuits the
    common has-matches case; the disambiguation aggregate runs only
    when the result is about to be empty): the filter would empty a
    non-empty tree
    and the caller could not distinguish 'wrong dim requested against
    legacy data' from 'nothing ingested' (ADVICE r9). A tree holding
    any RECORDED rows keeps the honest-empty contract on a miss — the
    recorded dims make the situation diagnosable."""
    from pyspark.sql import Window

    from ..indexutil import read_batched

    df = read_batched(spark, out_dir, "media_features", merge_schema=True)
    if df is None:
        return None
    if "feature_dim" not in df.columns:  # pure-legacy tree
        df = df.withColumn("feature_dim", F.lit(None).cast("int"))
    if int(feature_dim) != LEGACY_FEATURE_DIM:
        # short-circuit probe first: when ANY matching row exists the
        # guard is moot, and limit(1) stops the scan at the first hit —
        # the full disambiguation aggregate runs only for the
        # about-to-be-empty case
        has_match = (
            df.filter(F.col("feature_dim") == int(feature_dim))
            .limit(1)
            .count()
            == 1
        )
        counts = (
            None
            if has_match
            else df.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(
                    F.when(F.col("feature_dim").isNull(), 1)
                ).alias("n_legacy"),
            ).head()
        )
        if (
            counts is not None
            and counts["n_legacy"] > 0
            and counts["n"] == counts["n_legacy"]  # pure-legacy only
        ):
            raise ValueError(
                f"read_media_features: dim={int(feature_dim)} matches"
                f" no recorded rows, and the tree's {counts['n_legacy']}"
                f" legacy (pre-dim-column) rows can only satisfy the"
                f" default dim LEGACY_FEATURE_DIM={LEGACY_FEATURE_DIM}"
                " — re-ingest at the requested dim (run_media_ingest"
                " with feature_dim set) to record it per row"
            )
    w = Window.partitionBy("media_id").orderBy(
        F.col("feature_dim").isNull().cast("int")  # known dim first
    )
    legacy_ok = F.lit(int(feature_dim) == LEGACY_FEATURE_DIM)
    return (
        df.filter(
            (F.col("feature_dim") == int(feature_dim))
            | (F.col("feature_dim").isNull() & legacy_ok)
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "feature_dim")
    )
