"""Multimodal catalog surface: the mapInPandas media pipeline under the
driver's oracle gate.

The driver's test tables carry no binary media, so the query SYNTHESIZES
a media table from ``documents`` — content = UTF-8 bytes of the text
(opaque blob as far as the pipeline is concerned), kind round-robined
by doc_id, width/height from doc_id arithmetic — and pushes it through
the real operator plumbing (functions/multimodal.decode_images:
Arrow-batched mapInPandas over a binary column, image-kind filter,
metadata pass-through), then joins the decoded rows back to the docs
table. The codec is pinned to the deterministic fake (the blobs are not
real images; a real decoder would rightly refuse them), which makes the
whole thing DuckDB-expressible: the fake's mean intensity is the mean
byte value, and the text is ASCII at every shipped SF (asserted in
tests/test_multimodal_skew.py), so ``ascii(substring(text, i, 1))``
enumerates exactly the same bytes numpy sees.

Scale: one documents scan, the mapInPandas stage is shuffle-free, and
the lang join is by the table's own key — at 100 TB this is a map-only
pipeline plus one co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import decode_images
from .catalog import register
from .textops import _docs

_MEAN_BYTE_SQL = (
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE"
    " list_sum(list_transform(generate_series(1, length(text)),"
    " i -> CAST(ascii(substring(text, i, 1)) AS DOUBLE)))"
    " / length(text) END"
)


def synth_media_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: the blob is
    the UTF-8 text, kind cycles image/audio/video by doc_id, dimensions
    are doc_id arithmetic (pass-through metadata the fake codec
    surfaces)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        ((F.col("doc_id") * 7) % 512 + 32).cast("int").alias("width"),
        ((F.col("doc_id") * 13) % 512 + 32).cast("int").alias("height"),
        F.lit(0).cast("int").alias("sample_rate"),
        F.lit(0).cast("long").alias("duration_ms"),
    )


@register(
    "media_image_decode_stats",
    survey="LLM(multimodal)",
    oracle=f"""
WITH m AS (
    SELECT doc_id AS media_id, lang, text,
           CAST((doc_id * 7) % 512 + 32 AS INTEGER) AS width,
           CAST((doc_id * 13) % 512 + 32 AS INTEGER) AS height
    FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id, lang, width, height,
       round({_MEAN_BYTE_SQL}, 6) AS mean_intensity,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
FROM m
""",
)
def media_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-kind rows decoded (fake codec) and joined back to docs for
    the language attribute — the driver-checked multimodal
    representative: mapInPandas over a binary column end-to-end."""
    docs = _docs(spark, sf_dir)
    media = synth_media_from_docs(docs)
    decoded = decode_images(media, codec="fake")
    langs = docs.select(F.col("doc_id").alias("media_id"), "lang")
    return decoded.join(langs, "media_id").select(
        "media_id",
        "lang",
        "width",
        "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.col("byte_len").cast("long").alias("byte_len"),
    )


def _media_with_duration(docs: DataFrame) -> DataFrame:
    """Media table variant giving video rows a doc_id-derived duration
    so the frame-sampling fan-out has deterministic, oracle-computable
    row counts."""
    return synth_media_from_docs(docs).withColumn(
        "duration_ms",
        F.when(
            F.col("kind") == "video",
            (F.col("media_id") % 7) * 1000 + 500,
        ).otherwise(F.lit(0)),
    )


@register(
    "media_frame_sample_stats",
    survey="LLM(multimodal),U2(ext)",
    oracle="""
SELECT doc_id AS media_id,
       CAST((doc_id % 7) AS INTEGER) AS frame_ct,
       CAST(CASE WHEN doc_id % 7 > 0
                 THEN (doc_id % 7 - 1) * 1000 ELSE NULL
            END AS BIGINT) AS max_frame_ts_ms
FROM documents
WHERE doc_id % 3 = 2 AND doc_id % 7 > 0
""",
)
def media_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1->N frame-sampling fan-out (mapInPandas flat map) under the
    oracle gate: per video, the sampled frame count and last frame
    timestamp must equal the duration arithmetic (duration_ms //
    every_ms frames at every_ms spacing; zero-frame videos produce no
    rows). The frame payloads themselves are the stubbed codec's
    content slices and stay out of the compared columns."""
    from ..functions.multimodal import sample_frames

    docs = _docs(spark, sf_dir)
    frames = sample_frames(_media_with_duration(docs), every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("int").alias("frame_ct"),
        F.max("frame_ts_ms").cast("long").alias("max_frame_ts_ms"),
    )


@register(
    "media_resize_stats",
    survey="LLM(multimodal)",
    headline=True,  # the bench's chained-binary-mapInPandas representative
    oracle="""
WITH m AS (
    SELECT doc_id AS media_id, text,
           CAST((doc_id * 7) % 512 + 32 AS INTEGER) AS w,
           CAST((doc_id * 13) % 512 + 32 AS INTEGER) AS h
    FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
           list_sum(list_transform(generate_series(0, 63),
               p -> CAST(ascii(substring(text,
                    CAST((((p // 8) * h // 8) * w + ((p % 8) * w // 8))
                         % length(text) AS INTEGER) + 1, 1)) AS DOUBLE)))
           / 64.0 END, 6) AS mean_intensity,
       CAST(64 AS BIGINT) AS byte_len
FROM m
""",
)
def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize image rows to 8x8 with the fake-codec nearest-neighbor
    path, then decode the RESIZED payloads — two chained mapInPandas
    stages over binary columns, still shuffle-free. Oracle-exact
    because (a) the NN index arithmetic (src = dst*src_dim DIV
    dst_dim, modulo blob length) is replicated in SQL over the same
    ASCII bytes, and (b) byte sums are integers, exactly representable
    in double, so summation order cannot matter."""
    docs = _docs(spark, sf_dir)
    return resize_decode_stats(synth_media_from_docs(docs))


def resize_decode_stats(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """The chained resize->decode scoring over any media frame — ONE
    definition shared by the catalog entry above and the streaming
    score-on-arrival sink (streaming/media_ingest), so ingest-time and
    batch-computed resize stats cannot diverge. The output's
    width/height columns ARE the resize parameters: self-describing
    rows, so a re-ingest at a different size is detectable (and
    filterable) at read time rather than silently mixed.

    FUSED into one Arrow stage: the old form chained
    ``resize_images`` -> ``decode_images`` — two mapInPandas stages,
    so every blob crossed the JVM<->Python boundary twice and the
    resized payloads were Arrow-shipped back to the JVM only to enter
    Python again. The fused stage samples the same NN indices and
    takes the mean over exactly the same ``out_w x out_h`` bytes
    (``blob[idx].mean()`` — the identical uint8 array the decode
    stage saw, so the float64 result is bit-identical), and never
    materializes the resized payload at all. Only image rows are
    scored, as before (the resize stage's kind filter)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        rows = np.arange(out_h, dtype=np.int64)
        cols = np.arange(out_w, dtype=np.int64)
        n_out = out_w * out_h
        for pdf in batches:
            means = []
            for blob_b, w, h in zip(
                pdf["content"], pdf["width"], pdf["height"]
            ):
                blob = np.frombuffer(bytes(blob_b), dtype=np.uint8)
                if not len(blob):
                    means.append(0.0)
                    continue
                w = max(int(w), 1)
                h = max(int(h), 1)
                src_r = (rows * h) // out_h
                src_c = (cols * w) // out_w
                idx = (src_r[:, None] * w + src_c[None, :]) % len(blob)
                means.append(float(blob[idx].mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.int32(out_w),
                    "height": np.int32(out_h),
                    "mean_intensity": pd.Series(
                        means, dtype="float64", index=pdf.index
                    ),
                    "byte_len": np.int64(n_out),
                }
            )

    scored = media.filter(media["kind"] == "image").select(
        "media_id", "content", "width", "height"
    ).mapInPandas(
        fn,
        schema=(
            "media_id bigint, width int, height int,"
            " mean_intensity double, byte_len bigint"
        ),
    )
    return scored.select(
        "media_id",
        "width",
        "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.col("byte_len").cast("long").alias("byte_len"),
    )
