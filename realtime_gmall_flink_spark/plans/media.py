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
