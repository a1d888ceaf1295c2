"""2D-delta histogram codec: per-row arrays of increasing bucket counters.

Re-expresses the reference's histogram module (reference
src/histogram.rs:18-76 `BinHistogramHeader`/`compress_geom_nonincreasing`,
:92-171 `DeltaDiffPackSink`): each row is an array of u64 bucket counts;
within a row buckets are delta-encoded vs the previous bucket (1D), and
across rows each histogram is diffed against the previous row's decoded
values (2D delta) — counter resets (any bucket dropping) store the raw
row instead of the diff, exactly the reference's value_dropped rule.

Blob layout (little-endian):
  +0  b'H' magic, u8 version=1
  +2  u16 num_buckets, u32 num_rows
  +8  f64 initial_bucket, f64 multiplier   (geometric bucket definition)
  +24 reset-row bitmap: ceil(num_rows/8) bytes (bit set = raw row)
  ..  NibblePacked stream: num_rows x num_buckets values in row order,
      each row padded to a multiple of 8 (the reference packs each row
      separately through finish(), src/histogram.rs:115-125)
"""

from __future__ import annotations

import struct

import numpy as np

from .. import nibblepack as npk

MAGIC = b"H\x01"


def encode(hists: np.ndarray, initial_bucket: float = 2.0, multiplier: float = 2.0) -> bytes:
    """hists: (num_rows, num_buckets) uint64 of cumulative bucket counts."""
    hists = np.ascontiguousarray(hists, dtype=np.uint64)
    R, B = hists.shape if hists.ndim == 2 else (0, 0)
    pad = (-B) % 8
    padded = np.zeros((R, B + pad), dtype=np.uint64) if pad else hists.copy()
    if pad:
        padded[:, :B] = hists

    # 2D delta: diff vs previous row unless any bucket dropped (reset)
    prev = np.zeros_like(padded)
    prev[1:] = padded[:-1]
    dropped = (padded < prev).any(axis=1)
    diffs = np.where(dropped[:, None], padded, padded - np.where(dropped[:, None], 0, prev))

    bitmap = np.packbits(dropped, bitorder="little")
    payload, _ = npk.pack_groups(diffs.reshape(-1, 8))
    return (MAGIC + struct.pack("<HIdd", B, R, initial_bucket, multiplier)
            + bitmap.tobytes() + payload.tobytes())


def decode(blob: bytes) -> np.ndarray:
    assert blob[:2] == MAGIC, "not a histogram blob"
    B, R, _init, _mult = struct.unpack_from("<HIdd", blob, 2)
    bm_len = (R + 7) // 8
    bitmap = np.frombuffer(blob, dtype=np.uint8, count=bm_len, offset=24)
    dropped = np.unpackbits(bitmap, bitorder="little")[:R].astype(bool)
    data = np.frombuffer(blob, dtype=np.uint8, offset=24 + bm_len)

    padded_b = B + (-B) % 8
    total = R * padded_b
    vals = npk.unpack_u64(data, total).reshape(R, padded_b)

    # undo the 2D delta: rows accumulate within each reset segment.
    # out[r] = cumsum(vals)[r] - cumsum(vals)[seg_start - 1]
    cs = np.cumsum(vals, axis=0, dtype=np.uint64)
    seg_starts = np.flatnonzero(dropped)
    base = np.zeros_like(vals)
    if len(seg_starts):
        prior = np.zeros((len(seg_starts), vals.shape[1]), dtype=np.uint64)
        nz = seg_starts > 0
        prior[nz] = cs[seg_starts[nz] - 1]
        idx = np.searchsorted(seg_starts, np.arange(R), side="right") - 1
        base = np.where((idx >= 0)[:, None], prior[np.maximum(idx, 0)], np.uint64(0))
    out = cs - base
    return out[:, :B]


def bucket_bounds(blob: bytes) -> np.ndarray:
    B, _R, init, mult = struct.unpack_from("<HIdd", blob, 2)
    return init * mult ** np.arange(B)


# --- reference BinHistogramHeader wire format --------------------------------
# (reference src/histogram.rs:18-76: repr(C, packed) header + geometric
# bucket definition + pack_u64 values; byte-compatible port)

FMT_EMPTY = 0x00
FMT_GEOMETRIC_DELTA = 0x01
FMT_GEOMETRIC1_DELTA = 0x02

_GEOM_BUCKET_DEF_LEN = 16 + 2  # sizeof(PackedGeometricBuckets) + 2


def compress_geom_nonincreasing(num_buckets: int, initial_bucket: float,
                                multiplier: float, format_code: int,
                                bucket_values: np.ndarray) -> bytes:
    """Byte-identical port of the reference's compress_geom_nonincreasing
    (reference src/histogram.rs:50-76): 5-byte packed BinHistogramHeader
    {format_code u8, bucket_def_len u16 LE, num_buckets u16 LE}, then
    PackedGeometricBuckets {initial_bucket f64 LE, multiplier f64 LE},
    then pack_u64(bucket_values) starting at offset bucket_def_len + 3."""
    header = struct.pack("<BHH", format_code, _GEOM_BUCKET_DEF_LEN, num_buckets)
    geom = struct.pack("<dd", initial_bucket, multiplier)
    vals = np.ascontiguousarray(bucket_values, dtype=np.uint64)
    payload = npk.pack_u64(vals)
    return header + geom + payload.tobytes()


def parse_bin_histogram(buf: bytes) -> dict:
    """Reader for the reference wire format: header fields, geometric
    bucket bounds, and the unpacked bucket values."""
    format_code, bucket_def_len, num_buckets = struct.unpack_from("<BHH", buf, 0)
    out = {"format_code": format_code, "bucket_def_len": bucket_def_len,
           "num_buckets": num_buckets}
    if format_code == FMT_EMPTY:
        out["values"] = np.zeros(0, dtype=np.uint64)
        return out
    initial_bucket, multiplier = struct.unpack_from("<dd", buf, 5)
    values_off = 3 + bucket_def_len  # offset_of(num_buckets) + def_len
    data = np.frombuffer(buf, dtype=np.uint8, offset=values_off)
    out.update({
        "initial_bucket": initial_bucket, "multiplier": multiplier,
        "bucket_bounds": initial_bucket * multiplier ** np.arange(num_buckets),
        "values": npk.unpack_u64(data, num_buckets),
    })
    return out
