"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
mapInPandas signatures, flat-map fan-out for frame sampling — while the
actual codec work is stubbed: this container ships no image/audio
libraries, so decode uses PIL when importable and otherwise a clearly
marked DETERMINISTIC FAKE that derives pixel statistics from the raw bytes
(stable across runs, good enough to exercise the pipeline end-to-end).

Scale notes:
- media bytes travel in Arrow record batches; cap
  spark.sql.execution.arrow.maxRecordsPerBatch so a batch of large blobs
  fits in executor memory (e.g. 64 for multi-MB images);
- operators are mapInPandas (no shuffle); co-locate downstream groupBys by
  pre-partitioning on the eventual key when fan-out precedes aggregation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "width int, height int, sample_rate int, duration_ms bigint"
)

DECODED_SCHEMA = (
    "media_id bigint, width int, height int, "
    "mean_intensity double, byte_len int"
)

FEATURE_SCHEMA = "media_id bigint, feature array<double>"

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"


def _try_pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_images(df: DataFrame, codec: str = "auto") -> DataFrame:
    """Decode image blobs to (width, height, mean intensity).

    Real path: PIL decode. Fake path (no PIL in this container): dimensions
    from metadata, intensity = mean byte value — DETERMINISTIC FAKE, not a
    real decode; swap in the PIL branch on a cluster image that ships it.

    ``codec``: "auto" picks PIL when importable; "fake" pins the
    deterministic byte-statistics path — required when the blobs are not
    actual images (the catalog's synthesized media table), where a real
    decoder would rightly refuse them.
    """
    if codec not in ("auto", "fake"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    has_pil = codec == "auto" and _try_pil()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if has_pil:  # pragma: no cover - library absent in container
                import io

                import PIL.Image

                def _decode(row):
                    img = PIL.Image.open(io.BytesIO(row["content"]))
                    g = img.convert("L")
                    hist = g.histogram()
                    total = sum(hist)
                    mean = (
                        sum(i * c for i, c in enumerate(hist)) / total
                        if total
                        else 0.0
                    )
                    return img.width, img.height, mean

                decoded = pdf.apply(_decode, axis=1, result_type="expand")
                out = pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": decoded[0],
                        "height": decoded[1],
                        "mean_intensity": decoded[2],
                        "byte_len": pdf["content"].map(len),
                    }
                )
            else:
                out = pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": pdf["width"],
                        "height": pdf["height"],
                        "mean_intensity": pdf["content"].map(
                            lambda b: float(
                                np.frombuffer(b, dtype=np.uint8).mean()
                            )
                            if len(b)
                            else 0.0
                        ),
                        "byte_len": pdf["content"].map(len),
                    }
                )
            yield out

    return df.filter(df["kind"] == "image").mapInPandas(
        fn, schema=DECODED_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-histogram feature vector (normalized), any media kind.

    Deterministic and codec-free: a stand-in with the exact plumbing a real
    embedding extractor needs (binary in, fixed-dim array<double> out,
    Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                counts = np.bincount(arr % dim, minlength=dim)
                feats.append((counts / (len(arr) or 1)).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: 1 -> N fan-out (one row per sampled
    timestamp). Frame payload: content slice keyed by the frame index —
    DETERMINISTIC FAKE for the absent video codec; the row fan-out,
    schema, and timestamp arithmetic are the real operator shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns = np.maximum(
                pdf["duration_ms"].to_numpy() // every_ms, 0
            ).astype(np.int64)
            if ns.sum() == 0:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype="int64"),
                        "frame_idx": pd.Series([], dtype="int64"),
                        "frame_ts_ms": pd.Series([], dtype="int64"),
                        "frame": pd.Series([], dtype="object"),
                    }
                )
                continue
            # vectorized fan-out: row r repeats ns[r] times with a local
            # frame counter; only the payload slice is per-frame Python
            frame_idx = np.concatenate([np.arange(n) for n in ns])
            src_row = np.repeat(np.arange(len(ns)), ns)
            blobs = [bytes(b) for b in pdf["content"]]
            frames = []
            for j, i in zip(src_row, frame_idx):
                lo = int(i * 17) % max(len(blobs[j]), 1)
                frames.append(blobs[j][lo : lo + 8])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[src_row],
                    "frame_idx": frame_idx,
                    "frame_ts_ms": frame_idx * every_ms,
                    "frame": frames,
                }
            )

    return df.filter(df["kind"] == "video").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )


def synth_media(spark, n: int = 20) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded by media_id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = hashlib.sha256(str(i).encode()).digest() * (4 + i % 3)
        rows.append(
            (
                i,
                kind,
                bytearray(blob),
                64 + i,
                48 + i,
                16000 if kind == "audio" else 0,
                3500 if kind == "video" else 0,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = "media_id bigint, width int, height int, content binary"

RESAMPLED_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, content binary"
)


def resize_images(
    df: DataFrame, out_w: int = 32, out_h: int = 32, codec: str = "auto"
) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h) for image rows.

    Real path: PIL ``Image.resize``. Fake path (no PIL in this
    container): the blob is interpreted under the fake codec's pixel
    model — a row-major (height x width) byte grid read modulo the blob
    length — and nearest-neighbor sampled with the SAME index
    arithmetic a real NN resize uses (src = floor(dst * src_dim /
    dst_dim)); output is exactly out_w*out_h bytes. The Spark shape is
    the real operator's either way: Arrow-batched mapInPandas, binary
    in / binary out, no shuffle."""
    if codec not in ("auto", "fake"):
        raise ValueError(f"unknown codec mode: {codec!r}")
    has_pil = codec == "auto" and _try_pil()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # branch hoisted to batch level, like decode_images
            if has_pil:  # pragma: no cover - absent in container
                import io

                import PIL.Image

                outs = [
                    PIL.Image.open(io.BytesIO(c))
                    .resize((out_w, out_h))
                    .convert("L")
                    .tobytes()
                    for c in pdf["content"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": out_w,
                        "height": out_h,
                        "content": outs,
                    }
                )
                continue
            outs = []
            # zip over the three columns, not iterrows(): building a
            # pandas Series per row dominates at batch sizes this small
            for content, w, h in zip(
                pdf["content"], pdf["width"], pdf["height"]
            ):
                blob = np.frombuffer(bytes(content), dtype=np.uint8)
                w = max(int(w), 1)
                h = max(int(h), 1)
                if not len(blob):
                    outs.append(b"\x00" * (out_w * out_h))
                    continue
                src_r = (np.arange(out_h, dtype=np.int64) * h) // out_h
                src_c = (np.arange(out_w, dtype=np.int64) * w) // out_w
                idx = (src_r[:, None] * w + src_c[None, :]) % len(blob)
                outs.append(blob[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "content": outs,
                }
            )

    return df.filter(df["kind"] == "image").mapInPandas(
        fn, schema=RESIZED_SCHEMA
    )


def resample_audio(df: DataFrame, target_hz: int = 8000) -> DataFrame:
    """Resample audio rows to ``target_hz`` — nearest-neighbor index
    map with REAL sample-count arithmetic (n_out = floor(n_in * target
    / src)), 1 byte per sample under the fake codec model. An equal
    rate round-trips the payload unchanged; rows with a zero/missing
    sample_rate are dropped (not guessed). A real DSP resampler
    (polyphase filter) drops into the same per-row 1-D map; the Spark
    shape — Arrow batches, no shuffle — is the operator's real cost
    model."""
    if target_hz <= 0:
        raise ValueError("target_hz must be positive")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[pdf["sample_rate"] > 0]
            outs, counts = [], []
            # zip, not iterrows() (see resize_images)
            for content, sample_rate in zip(
                keep["content"], keep["sample_rate"]
            ):
                blob = np.frombuffer(bytes(content), dtype=np.uint8)
                src_hz = int(sample_rate)
                n_out = (len(blob) * target_hz) // src_hz
                if n_out == 0 or not len(blob):
                    outs.append(b"")
                    counts.append(0)
                    continue
                if src_hz == target_hz:
                    outs.append(blob.tobytes())
                    counts.append(len(blob))
                    continue
                idx = (
                    np.arange(n_out, dtype=np.int64) * src_hz
                ) // target_hz
                outs.append(blob[np.minimum(idx, len(blob) - 1)].tobytes())
                counts.append(n_out)
            yield pd.DataFrame(
                {
                    "media_id": keep["media_id"],
                    "sample_rate": target_hz,
                    "n_samples": pd.Series(counts, dtype="int64",
                                           index=keep.index),
                    "content": pd.Series(outs, dtype="object",
                                         index=keep.index),
                }
            )

    return df.filter(df["kind"] == "audio").mapInPandas(
        fn, schema=RESAMPLED_SCHEMA
    )
