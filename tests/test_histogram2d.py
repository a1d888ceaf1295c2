"""2D-delta histogram codec tests (reference src/histogram.rs:196-238)."""

import numpy as np

from compressed_vec_spark.codecs import histogram2d as h2d


def test_roundtrip_increasing_counters():
    # reference delta_diffpack_sink_test input shape: increasing counters
    rows = np.array([
        [0, 1000, 1001, 1002, 1003, 2005, 2010, 3034, 4045, 5056, 6067, 7078],
        [3, 1004, 1006, 1008, 1009, 2012, 2020, 3056, 4070, 5090, 6101, 7150],
        [7, 1010, 1016, 1018, 1019, 2112, 2120, 3156, 4170, 5190, 6201, 7250],
    ], dtype=np.uint64)
    blob = h2d.encode(rows)
    assert (h2d.decode(blob) == rows).all()


def test_counter_reset_stores_raw():
    rows = np.array([
        [10, 20, 30, 40],
        [15, 25, 35, 45],
        [2, 3, 4, 5],      # counter reset (dropped) -> raw row
        [4, 6, 8, 10],
    ], dtype=np.uint64)
    blob = h2d.encode(rows)
    assert (h2d.decode(blob) == rows).all()


def test_compresses_similar_histograms():
    base = np.cumsum(np.arange(64, dtype=np.uint64) * 100)
    rows = np.stack([base + np.uint64(i * 3) for i in range(1000)])
    blob = h2d.encode(rows)
    # 2D delta should crush near-identical consecutive histograms
    assert len(blob) < rows.nbytes / 8
    assert (h2d.decode(blob) == rows).all()


def test_bucket_bounds():
    rows = np.ones((2, 8), dtype=np.uint64)
    blob = h2d.encode(rows, initial_bucket=2.0, multiplier=2.0)
    assert h2d.bucket_bounds(blob).tolist() == [2, 4, 8, 16, 32, 64, 128, 256]


def test_random_roundtrip():
    rng = np.random.default_rng(7)
    rows = rng.integers(0, 1 << 40, size=(500, 19), dtype=np.uint64)
    blob = h2d.encode(rows)
    assert (h2d.decode(blob) == rows).all()
