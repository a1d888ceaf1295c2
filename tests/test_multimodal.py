"""Multimodal column plumbing tests: schemas, batch shapes, per-kind
routing, and that media blobs round-trip through the chunk codecs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from compressed_vec_spark.codecs import chunk
from compressed_vec_spark.operators import multimodal as mm
from compressed_vec_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("cvx-mm-tests", cores=4, chunk_rows=512)
    yield s
    s.stop()


def test_synthetic_media_deterministic(spark):
    a = mm.synthetic_media(spark, 300).orderBy("media_id").collect()
    b = mm.synthetic_media(spark, 300).orderBy("media_id").collect()
    assert a == b
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_image_features_shape(spark):
    df = mm.synthetic_media(spark, 120)
    feats = mm.image_features(df).collect()
    n_images = df.where(F.col("kind") == "image").count()
    assert len(feats) == n_images
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in feats)
    # deterministic across runs
    again = mm.image_features(mm.synthetic_media(spark, 120)).collect()
    assert sorted(r["media_id"] for r in feats) == sorted(r["media_id"] for r in again)


def test_frame_sample_plan_row_counts(spark):
    df = mm.synthetic_media(spark, 90)
    plan = mm.frame_sample_plan(df, every_ms=1000)
    got = {r["media_id"]: r["n"] for r in
           plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    for r in df.where(F.col("kind") == "video").collect():
        expected = (r["duration_ms"] + 999) // 1000
        assert got[r["media_id"]] == expected


def test_audio_window_stats(spark):
    df = mm.synthetic_media(spark, 90)
    stats = mm.audio_window_stats(df, window_ms=250).collect()
    assert len(stats) == df.where(F.col("kind") == "audio").count()
    assert all(r["n_windows"] >= 1 and 0 <= r["rms_mean"] <= 1 for r in stats)


def test_ppm_codec_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(23, 37, 3), dtype=np.uint8)
    blob = mm.encode_ppm(px)
    assert blob[:2] == b"P6"
    assert (mm.decode_ppm(blob) == px).all()


def test_wav_codec_roundtrip():
    t = np.arange(8000)
    wave = (np.sin(2 * np.pi * 440 * t / 8000) * 12000).astype(np.int16)
    blob = mm.encode_wav(wave, 8000)
    samples, sr = mm.decode_wav(blob)
    assert sr == 8000
    assert (samples == wave).all()


def test_audio_rms_matches_sine_theory(spark):
    """RMS of a sine = amplitude / sqrt(2): the windowed stats must
    reflect the REAL decoded samples, not a fake."""
    df = mm.synthetic_media(spark, 30)
    rows = {r["media_id"]: r for r in mm.audio_window_stats(df, 250).collect()}
    src = {r["media_id"]: r for r in
           df.where(F.col("kind") == "audio").collect()}
    assert rows
    for mid, r in rows.items():
        samples, sr = mm.decode_wav(bytes(src[mid]["payload"]))
        # recompute the windowed RMS independently from the decoded
        # samples: the query values must derive from the REAL payload
        win = sr * 250 // 1000
        n_win = max((len(samples) + win - 1) // win, 1)
        padded = np.zeros(n_win * win)
        padded[:len(samples)] = samples / 32768.0
        rms = np.sqrt((padded.reshape(n_win, win) ** 2).mean(axis=1))
        assert r["n_windows"] == n_win
        assert r["rms_max"] == pytest.approx(float(rms.max()), rel=1e-9)
        assert r["rms_mean"] == pytest.approx(float(rms.mean()), rel=1e-9)
        # loose sine-theory sanity: RMS of a tone never exceeds amp/sqrt(2)
        amp = np.abs(samples).max() / 32768.0
        assert 0 < r["rms_max"] <= amp / np.sqrt(2) * 1.02


def test_image_features_derive_from_real_pixels(spark):
    df = mm.synthetic_media(spark, 12)
    feats = {r["media_id"]: np.array(r["feature"])
             for r in mm.image_features(df, max_side=32).collect()}
    img_rows = df.where(F.col("kind") == "image").collect()
    assert feats and len(feats) == len(img_rows)
    for r in img_rows:
        img = mm.decode_ppm(bytes(r["payload"]))
        assert img.shape == (r["height"], r["width"], 3)
        sy, sx = max(img.shape[0] // 32, 1), max(img.shape[1] // 32, 1)
        small = img[::sy, ::sx].astype(np.float32)
        want_means = small.reshape(-1, 3).mean(axis=0)
        assert np.allclose(feats[r["media_id"]][:3], want_means, atol=1e-3)


def test_media_payload_chunk_roundtrip(spark):
    rows = mm.synthetic_media(spark, 64).orderBy("media_id").collect()
    payloads = pd.Series([bytes(r["payload"]) for r in rows], dtype=object)
    codec, blob, _ = chunk.encode_column(payloads)
    assert codec == "deflate"
    out = chunk.decode_column(blob)
    assert list(out) == payloads.tolist()


# --- real RGB24 AVI video (round 4) ------------------------------------------

def test_avi_codec_roundtrip():
    rng = np.random.default_rng(9)
    for (n, h, w) in [(3, 5, 7), (1, 1, 1), (4, 16, 24), (2, 8, 6)]:
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        dec, fps = mm.decode_avi(mm.encode_avi(frames, 4))
        assert fps == 4
        assert np.array_equal(dec, frames)


def test_avi_dib_wire_conventions():
    # asymmetric 2x2 frame pins bottom-up row order, BGR channel order
    # and 4-byte row padding in the actual wire bytes
    f = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    f[0, 0, 0] = [255, 0, 0]     # top-left RED
    f[0, 1, 1] = [0, 0, 255]     # bottom-right BLUE
    blob = mm.encode_avi(f, 4)
    frame = blob[blob.index(b"00db") + 8:][:16]
    # stride = (2*3+3)&~3 = 8; first DIB row = BOTTOM image row,
    # blue pixel stored B,G,R = (255,0,0)
    assert frame[:8] == bytes([0, 0, 0, 255, 0, 0, 0, 0])
    assert frame[8:16] == bytes([0, 0, 255, 0, 0, 0, 0, 0])


def test_avi_compressed_rejected():
    blob = bytearray(mm.encode_avi(np.zeros((1, 2, 2, 3), np.uint8), 4))
    strf = blob.index(b"strf") + 8
    blob[strf + 16:strf + 20] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(NotImplementedError):
        mm.decode_avi(bytes(blob))


def test_synthetic_video_payloads_parse(spark):
    df = mm.synthetic_media(spark, 30).where(F.col("kind") == "video")
    rows = df.select("media_id", "payload", "width", "height",
                     "duration_ms").collect()
    assert rows
    for r in rows:
        frames, fps = mm.decode_avi(bytes(r["payload"]))
        assert fps == mm.VIDEO_FPS
        assert frames.shape[0] == r["duration_ms"] * mm.VIDEO_FPS // 1000
        assert frames.shape[1] == r["height"]
        assert frames.shape[2] == r["width"]
        # the generator's moving gradient: frame t, channel 0 is
        # (x + 2t + id) % 256 — check one probe pixel of frame 1
        assert frames[1, 0, 0, 0] == (0 + 2 * 1 + r["media_id"]) % 256


def test_video_frame_features_match_direct_decode(spark):
    df = mm.synthetic_media(spark, 30)
    feats = {(r["media_id"], r["frame_idx"]): r
             for r in mm.video_frame_features(df, every_ms=1000).collect()}
    assert feats
    vids = df.where(F.col("kind") == "video") \
             .select("media_id", "payload").collect()
    checked = 0
    for v in vids:
        frames, fps = mm.decode_avi(bytes(v["payload"]))
        dur_ms = len(frames) * 1000 // fps
        for k, ts in enumerate(range(0, dur_ms, 1000)):
            fi = min(ts * fps // 1000, len(frames) - 1)
            exp = frames[fi].reshape(-1, 3).mean(axis=0)
            row = feats[(v["media_id"], k)]
            assert abs(row["r_mean"] - exp[0]) < 1e-9
            assert abs(row["b_mean"] - exp[2]) < 1e-9
            checked += 1
    assert checked >= 10
