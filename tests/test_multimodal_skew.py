"""Multimodal plumbing + skew operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.functions import multimodal as MM
from realtime_gmall_flink_spark.operators.skew import salted_agg


def test_decode_images(spark):
    media = MM.synth_media(spark, 21)
    out = MM.decode_images(media)
    rows = out.collect()
    # 7 of 21 synthetic rows are images
    assert len(rows) == 7
    assert out.columns == [
        "media_id", "width", "height", "mean_intensity", "byte_len"
    ]
    r0 = {r["media_id"]: r for r in rows}[0]
    assert r0["width"] == 64 and r0["height"] == 48
    assert r0["byte_len"] == 128  # sha256 (32B) * 4
    assert 0.0 < r0["mean_intensity"] < 255.0
    # determinism
    again = {r["media_id"]: r for r in MM.decode_images(media).collect()}
    assert again[0]["mean_intensity"] == r0["mean_intensity"]


def test_extract_features(spark):
    media = MM.synth_media(spark, 9)
    out = MM.extract_features(media, dim=16).collect()
    assert len(out) == 9
    for r in out:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-9


def test_sample_frames_fanout(spark):
    media = MM.synth_media(spark, 9)
    frames = MM.sample_frames(media, every_ms=1000)
    rows = frames.collect()
    # 3 videos x 3 frames (3500 ms // 1000)
    assert len(rows) == 9
    per_vid = {r["media_id"] for r in rows}
    assert all(
        sorted(
            x["frame_idx"] for x in rows if x["media_id"] == v
        ) == [0, 1, 2]
        for v in per_vid
    )
    assert all(r["frame_ts_ms"] == r["frame_idx"] * 1000 for r in rows)


def test_decode_images_codec_pin(spark):
    """codec='fake' must run the byte-statistics path regardless of PIL
    availability (the catalog's synthesized blobs are not real images),
    and reject unknown modes."""
    import pytest

    media = MM.synth_media(spark, 6)
    rows = {
        r["media_id"]: r
        for r in MM.decode_images(media, codec="fake").collect()
    }
    # fake path surfaces the METADATA dimensions, not a decode
    assert rows[0]["width"] == 64 and rows[0]["height"] == 48
    with pytest.raises(ValueError, match="codec"):
        MM.decode_images(media, codec="png")


def test_documents_text_is_ascii_at_all_sfs():
    """The media_image_decode_stats oracle enumerates bytes via
    ascii(substring(text, i, 1)), which equals the UTF-8 byte only for
    ASCII text — pin that property of the shipped testdata at every SF
    (octet_length == char length <=> pure ASCII)."""
    import os

    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        (diff,) = con.execute(
            "SELECT coalesce(max(octet_length(encode(text))"
            f" - length(text)), 0) FROM read_parquet('{path}')"
        ).fetchone()
        assert diff == 0, f"non-ASCII text in {path}"


def test_media_catalog_entry_uses_map_in_pandas(spark):
    """The driver-window multimodal entry must actually exercise the
    Arrow mapInPandas stage (not a rewrite into pure expressions)."""
    from realtime_gmall_flink_spark.plans.catalog import catalog

    from .conftest import SF_DIR

    df = catalog()["media_image_decode_stats"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_salted_agg_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3 % 101).cast("double").alias("v"),
    )
    salted = salted_agg(
        df,
        ["k"],
        {"total": ("sum", "v"), "rows": ("count", "*"),
         "vmin": ("min", "v"), "vmax": ("max", "v")},
        buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count(F.lit(1)).alias("rows"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    def norm(d):
        return {
            (r["k"], r["rows"], r["vmin"], r["vmax"], round(r["total"], 6))
            for r in d.collect()
        }
    assert norm(salted) == norm(plain)


def test_resize_images_fake_codec_arithmetic(spark):
    """The fake NN resize must use the real index arithmetic: output is
    exactly out_w*out_h bytes per image row, and each output pixel is
    the source grid byte at floor(dst*src_dim/dst_dim) modulo the blob
    length — recomputed here in pure Python for one row."""
    import numpy as np

    from realtime_gmall_flink_spark.functions.multimodal import (
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 9)
    out = resize_images(media, out_w=8, out_h=4, codec="fake").collect()
    imgs = {r["media_id"]: r for r in media.collect()
            if r["kind"] == "image"}
    assert {r["media_id"] for r in out} == set(imgs)
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["content"]) == 8 * 4
    # pure-Python recomputation for the first image row
    mid = min(imgs)
    src = imgs[mid]
    blob = bytes(src["content"])
    w, h = src["width"], src["height"]
    got = bytes(next(r["content"] for r in out if r["media_id"] == mid))
    want = bytes(
        blob[((r * h // 4) * w + (c * w // 8)) % len(blob)]
        for r in range(4)
        for c in range(8)
    )
    assert got == want
    # deterministic: a second run is byte-identical
    again = {
        r["media_id"]: bytes(r["content"])
        for r in resize_images(media, out_w=8, out_h=4,
                               codec="fake").collect()
    }
    assert again[mid] == got


def test_resample_audio_counts_and_roundtrip(spark):
    """n_out = floor(n_in*target/src); equal rate round-trips payload
    unchanged; only audio rows pass."""
    from realtime_gmall_flink_spark.functions.multimodal import (
        resample_audio,
        synth_media,
    )

    media = synth_media(spark, 9)
    audio = {r["media_id"]: r for r in media.collect()
             if r["kind"] == "audio"}
    down = {r["media_id"]: r
            for r in resample_audio(media, target_hz=8000).collect()}
    assert set(down) == set(audio)
    for mid, r in down.items():
        n_in = len(bytes(audio[mid]["content"]))
        assert r["n_samples"] == (n_in * 8000) // 16000
        assert len(bytes(r["content"])) == r["n_samples"]
        assert r["sample_rate"] == 8000
    same = {r["media_id"]: bytes(r["content"])
            for r in resample_audio(media, target_hz=16000).collect()}
    for mid in audio:
        assert same[mid] == bytes(audio[mid]["content"])
