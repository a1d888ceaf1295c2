"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract is real and tested — schemas, partitioning,
Arrow batch shapes, and the mapInPandas UDF signatures — while the
actual media decoding is stubbed behind deterministic fakes (the
image/audio libraries are not available in this environment; swap
`_fake_decode_*` for PIL/ffmpeg calls in production — the dataflow does
not change).  Blobs ride the same `deflate`/`binary_fsst` chunk codecs
as html.

Schema conventions:
  media struct: (media_id long, kind string, payload binary,
                 meta struct<width int, height int, sample_rate int,
                            duration_ms int, codec string>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int, codec string"
)

FEATURE_DIM = 64


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes whose
    header encodes the metadata, so decode is checkable)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.array(["image", "audio", "video"])[ids % 3]
            w = (ids % 64 + 16).astype(np.int32) * 8
            h = (ids % 48 + 9).astype(np.int32) * 8
            sr = np.where(kinds == "audio", 16000, 0).astype(np.int32)
            dur = np.where(kinds != "image", (ids % 30 + 1) * 1000, 0).astype(np.int32)
            payloads = [
                b"FAKE" + bytes(k, "ascii")[:1]
                + int(wi).to_bytes(4, "little") + int(hi).to_bytes(4, "little")
                + hashlib.sha256(int(i).to_bytes(8, "little")).digest() * 4
                for i, k, wi, hi in zip(ids, kinds, w, h)
            ]
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds, "payload": payloads,
                "width": w, "height": h, "sample_rate": sr,
                "duration_ms": dur,
                "codec": np.where(kinds == "image", "png",
                                  np.where(kinds == "audio", "opus", "h264")),
            })

    return spark.range(0, n, 1, max(spark.sparkContext.defaultParallelism, 2)) \
        .mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB for a real image decoder (PIL.Image.open). Deterministic
    fake: seeded pixels from the payload hash.  Replace in production;
    the UDF batch shape (H, W, 3 uint8) is the real contract."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def image_features(df: DataFrame, max_side: int = 32) -> DataFrame:
    """decode -> resize (stride subsample) -> channel-mean feature
    vector, Arrow-batched; only image rows are decoded (filter pushed
    before the UDF)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _fake_decode_image(bytes(payload), int(w), int(h))
                sy = max(img.shape[0] // max_side, 1)
                sx = max(img.shape[1] // max_side, 1)
                small = img[::sy, ::sx].astype(np.float32)
                cells = small.reshape(-1, 3).mean(axis=0)
                hist = np.histogram(small[..., 0], bins=FEATURE_DIM - 3,
                                    range=(0, 256))[0].astype(np.float32)
                feats.append(np.concatenate([cells, hist / max(hist.sum(), 1)]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "feature": [f.tolist() for f in feats],
            })

    return (df.where(F.col("kind") == "image")
              .select("media_id", "payload", "width", "height")
              .mapInPandas(fn, "media_id long, feature array<float>"))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (posexplode of a JVM-side sequence — the expensive ffmpeg seek/decode
    would consume this plan; no Python in the planning path)."""
    return (df.where(F.col("kind") == "video")
            .select("media_id", "duration_ms",
                    F.posexplode(F.sequence(
                        F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)))
                    .alias("frame_idx", "ts_ms")))


def audio_window_stats(df: DataFrame, window_ms: int = 250) -> DataFrame:
    """STUBBED audio feature extraction: windows-per-clip plumbing is
    real; the PCM decode is a deterministic fake."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, sr, dur in zip(pdf["media_id"], pdf["payload"],
                                             pdf["sample_rate"], pdf["duration_ms"]):
                n_windows = max(int(dur) // window_ms, 1)
                seed = int.from_bytes(hashlib.sha256(bytes(payload)).digest()[:8], "little")
                rng = np.random.default_rng(seed)
                rms = rng.random(n_windows).astype(np.float64)
                rows.append((int(mid), n_windows, float(rms.mean()), float(rms.max())))
            yield pd.DataFrame(rows, columns=["media_id", "n_windows",
                                              "rms_mean", "rms_max"])

    return (df.where(F.col("kind") == "audio")
            .select("media_id", "payload", "sample_rate", "duration_ms")
            .mapInPandas(fn, "media_id long, n_windows int, rms_mean double, rms_max double"))
