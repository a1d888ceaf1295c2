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


def test_bin_histogram_header_golden_bytes():
    """Reference golden header bytes (src/histogram.rs:175-190
    dump_header_structure): {GeometricDelta, bucket_def_len=2,
    num_buckets=16} serializes to [0x01, 0x02, 0, 16, 0]."""
    import struct
    hdr = struct.pack("<BHH", h2d.FMT_GEOMETRIC_DELTA, 2, 16)
    assert list(hdr) == [0x01, 0x02, 0, 16, 0]
    # and our writer emits exactly that 5-byte packed layout
    blob = h2d.compress_geom_nonincreasing(
        16, 2.0, 2.0, h2d.FMT_GEOMETRIC_DELTA,
        np.arange(16, dtype=np.uint64))
    assert blob[0] == 0x01
    assert struct.unpack_from("<H", blob, 1)[0] == 18  # 16B geom def + 2
    assert struct.unpack_from("<H", blob, 3)[0] == 16


def test_bin_histogram_wire_roundtrip():
    vals = np.array([0, 1000, 1001, 1002, 1003, 2005, 2010, 3034,
                     4045, 5056, 6067, 7078], dtype=np.uint64)
    blob = h2d.compress_geom_nonincreasing(
        len(vals), 2.0, 3.0, h2d.FMT_GEOMETRIC_DELTA, vals)
    got = h2d.parse_bin_histogram(blob)
    assert got["format_code"] == h2d.FMT_GEOMETRIC_DELTA
    assert got["num_buckets"] == len(vals)
    assert got["initial_bucket"] == 2.0 and got["multiplier"] == 3.0
    assert (got["values"] == vals).all()
    assert got["bucket_bounds"][:3].tolist() == [2.0, 6.0, 18.0]
    # values start exactly at offset bucket_def_len + 3 = 21, packed with
    # the same pack_u64 kernel the reference calls
    from compressed_vec_spark import nibblepack as npk
    assert blob[21:] == npk.pack_u64(vals).tobytes()


def test_random_roundtrip():
    rng = np.random.default_rng(7)
    rows = rng.integers(0, 1 << 40, size=(500, 19), dtype=np.uint64)
    blob = h2d.encode(rows)
    assert (h2d.decode(blob) == rows).all()
