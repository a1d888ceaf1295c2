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


def test_media_payload_chunk_roundtrip(spark):
    rows = mm.synthetic_media(spark, 64).orderBy("media_id").collect()
    payloads = pd.Series([bytes(r["payload"]) for r in rows], dtype=object)
    codec, blob, _ = chunk.encode_column(payloads)
    assert codec == "deflate"
    out = chunk.decode_column(blob)
    assert list(out) == payloads.tolist()
