"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Image and audio are REAL end to end in this environment: payloads are
real container formats (P6 PPM images, RIFF/WAVE PCM16 audio) written
and parsed with numpy — decode, resize (stride subsample), feature
extraction and windowed RMS all operate on actual pixel/sample data.
Compressed formats (png/jpeg/opus) route through an import-gated PIL
hook; VIDEO decode is the one declared stub (no pure-python codec
exists — `frame_sample_plan` plans the seek points JVM-side and a real
ffmpeg call would consume that plan).  Blobs ride the same
`deflate`/`binary_fsst` chunk codecs as html.

Schema conventions:
  media struct: (media_id long, kind string, payload binary,
                 meta struct<width int, height int, sample_rate int,
                            duration_ms int, codec string>)
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int, codec string"
)

FEATURE_DIM = 64
AUDIO_SR = 8000


# --- real container codecs (numpy, no external libs) --------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 PPM."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(pixels).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (H, W, 3) uint8 (real parser, not a stub)."""
    assert payload[:2] == b"P6", "not a P6 PPM"
    # header = magic, width, height, maxval separated by whitespace
    parts, pos = [], 2
    while len(parts) < 3:
        while payload[pos] in b" \t\r\n":
            pos += 1
        if payload[pos] == 0x23:  # '#' comment
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while payload[end] not in b" \t\r\n":
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    assert maxval == 255
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM -> RIFF/WAVE."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate) — a real
    chunk-walking parser."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE", "not WAVE"
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sr = struct.unpack_from("<HHI", payload, body)
            assert audio_fmt == 1 and channels == 1, "PCM mono only"
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                    offset=body)
        pos = body + size + (size & 1)
    assert sr is not None and samples is not None, "missing fmt/data chunk"
    return samples, sr


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payload bytes: P6 PPM images
    (gradient-pattern pixels) and RIFF/WAVE PCM16 audio (sine tones);
    video payloads are tagged opaque bytes (decode is the declared
    stub)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.array(["image", "audio", "video"])[ids % 3]
            w = (ids % 48 + 16).astype(np.int32)
            h = (ids % 32 + 12).astype(np.int32)
            sr = np.where(kinds == "audio", AUDIO_SR, 0).astype(np.int32)
            dur = np.where(kinds == "video", (ids % 30 + 1) * 1000,
                           np.where(kinds == "audio", (ids % 20 + 1) * 100,
                                    0)).astype(np.int32)
            payloads = []
            for i, k, wi, hi, di in zip(ids, kinds, w, h, dur):
                if k == "image":
                    yy, xx = np.mgrid[0:int(hi), 0:int(wi)]
                    px = np.stack([(xx * 3 + int(i)) % 256,
                                   (yy * 7 + int(i) * 5) % 256,
                                   (xx + yy + int(i) * 11) % 256],
                                  axis=-1).astype(np.uint8)
                    payloads.append(encode_ppm(px))
                elif k == "audio":
                    t = np.arange(AUDIO_SR * int(di) // 1000)
                    freq = float(int(i) % 880 + 110)
                    wave = (np.sin(2 * np.pi * freq * t / AUDIO_SR)
                            * (10000 + int(i) % 20000)).astype(np.int16)
                    payloads.append(encode_wav(wave, AUDIO_SR))
                else:
                    payloads.append(
                        b"FAKEv" + int(di).to_bytes(4, "little")
                        + hashlib.sha256(int(i).to_bytes(8, "little")).digest() * 4)
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds, "payload": payloads,
                "width": np.where(kinds == "image", w, 0).astype(np.int32),
                "height": np.where(kinds == "image", h, 0).astype(np.int32),
                "sample_rate": sr, "duration_ms": dur,
                "codec": np.where(kinds == "image", "ppm",
                                  np.where(kinds == "audio", "wav", "h264")),
            })

    return spark.range(0, n, 1, max(spark.sparkContext.defaultParallelism, 2)) \
        .mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes, codec: str = "ppm") -> np.ndarray:
    """Image decode dispatch: PPM is decoded natively; compressed
    formats need PIL (import-gated — absent in this sandbox)."""
    if codec == "ppm":
        return decode_ppm(payload)
    try:
        import io
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            f"decoding {codec} requires PIL; only ppm decodes natively") from e
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def image_features(df: DataFrame, max_side: int = 32) -> DataFrame:
    """decode -> resize (stride subsample) -> channel-mean + red-channel
    histogram feature vector, Arrow-batched; only image rows are decoded
    (filter pushed before the UDF).  Real pixels end to end for PPM."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, codec in zip(pdf["payload"], pdf["codec"]):
                img = decode_image(bytes(payload), str(codec))
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
              .select("media_id", "payload", "codec")
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
    """Windowed RMS over REAL PCM samples (decode_wav), normalized to
    [0, 1] by int16 full scale; zero-padded final window."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, sr = decode_wav(bytes(payload))
                win = max(sr * window_ms // 1000, 1)
                n_windows = max((len(samples) + win - 1) // win, 1)
                padded = np.zeros(n_windows * win, dtype=np.float64)
                padded[:len(samples)] = samples.astype(np.float64) / 32768.0
                rms = np.sqrt((padded.reshape(n_windows, win) ** 2).mean(axis=1))
                rows.append((int(mid), int(n_windows),
                             float(rms.mean()), float(rms.max())))
            yield pd.DataFrame(rows, columns=["media_id", "n_windows",
                                              "rms_mean", "rms_max"])

    return (df.where(F.col("kind") == "audio")
            .select("media_id", "payload")
            .mapInPandas(fn, "media_id long, n_windows int, rms_mean double, rms_max double"))
