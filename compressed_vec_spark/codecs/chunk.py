"""Chunk column codec: one pandas Series in, one self-describing blob out.

This is the unit of work the Spark encode job runs inside mapInPandas:
a column chunk (one Arrow batch) is encoded with the codec family the
selector picks, and decoded back bit-identically.  Corresponds to the
reference's whole-vector encode_all/decode lifecycle
(reference src/vector.rs:238-246, 452-464) generalized with the
north-rule codecs.

Blob = 4-byte codec tag + codec payload.  Int64 columns with negatives
are zigzag-mapped to u64 first (tag records it); timestamps are
epoch-microsecond u64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import vector as vec
from .. import nibblepack as npk
from . import dictionary, fsst, rle, selector

_TAGS = {
    "vec_u64": b"VU64", "vec_u32": b"VU32", "vec_f32": b"VF32",
    "zz_u64": b"ZZ64", "rle": b"RLE0", "zz_rle": b"ZZRL",
    "dict": b"DICT", "fsst": b"FSST", "binary_fsst": b"BFST",
    "xor_f64": b"XF64", "deflate": b"DFLT",
}
_BY_TAG = {v: k for k, v in _TAGS.items()}


def _zigzag(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)


def _int_values(series: pd.Series) -> tuple[np.ndarray, bool]:
    if series.dtype.kind == "M":
        vals = series.astype("datetime64[us]").to_numpy().view(np.int64)
    else:
        vals = series.fillna(0).to_numpy()
    neg = bool(len(vals)) and bool(vals.min() < 0)
    return (vals, neg)


def encode_column(series: pd.Series, codec: str | None = None) -> tuple[str, bytes, dict]:
    """Encode one column chunk. Returns (codec, blob, meta)."""
    if codec is None:
        codec, st = selector.choose_codec(series)
    else:
        st = {}
    kind = series.dtype.kind

    if codec in ("vec_u64", "vec_u32", "rle") and (kind in "iuM"):
        vals, neg = _int_values(series)
        if neg:
            u = _zigzag(vals)
            if codec == "rle":
                codec = "zz_rle"
                payload = rle.encode(u)
            else:
                codec = "zz_u64"
                payload = vec.encode_vector(u, "u64")
        else:
            u = vals.astype(np.uint64)
            if codec == "rle":
                payload = rle.encode(u)
            elif codec == "vec_u32":
                payload = vec.encode_vector(u, "u32")
            else:
                payload = vec.encode_vector(u, "u64")
    elif codec == "vec_f32":
        payload = vec.encode_vector(series.fillna(0.0).to_numpy(dtype=np.float32), "f32")
    elif codec == "xor_f64":
        arr = series.fillna(0.0).to_numpy(dtype=np.float64)
        payload = len(arr).to_bytes(4, "little") + npk.pack_f64_xor(arr).tobytes()
    elif codec == "dict":
        payload = dictionary.encode(series.astype(object))
    elif codec in ("fsst", "binary_fsst"):
        import pyarrow as pa
        if codec == "binary_fsst":
            arr = pa.array(series.where(series.notna(), b""), type=pa.large_binary())
        else:
            arr = pa.array(series.fillna(""), type=pa.large_utf8())
        payload = fsst.encode(arr)
    elif codec == "deflate":
        # entropy coding for opaque binary payloads (html blobs) where
        # bigram symbol tables underperform; lengths still ride a
        # BinaryVector so per-row access stays cheap
        import zlib
        import pyarrow as pa
        arr = pa.array(series.where(series.notna(), b""), type=pa.large_binary())
        data, offsets = fsst._string_buffers(arr)
        lens_vec = vec.encode_vector(np.diff(offsets).astype(np.uint64), "u64")
        comp = zlib.compress(data.tobytes(), 1)  # speed-biased level
        payload = (len(arr).to_bytes(4, "little") + len(lens_vec).to_bytes(4, "little")
                   + lens_vec + comp)
    else:
        raise ValueError(f"unsupported codec {codec} for dtype {series.dtype}")

    meta = {
        "codec": codec,
        "num_elements": len(series),
        "encoded_bytes": 4 + len(payload),
        "stats": st,
    }
    return codec, _TAGS[codec] + payload, meta


def decode_column(blob: bytes, target_dtype: str | None = None):
    """Decode a chunk blob. Returns a numpy array / pandas Series whose
    values are bit-identical to what was encoded."""
    codec = _BY_TAG[bytes(blob[:4])]
    payload = blob[4:]
    if codec == "vec_u64":
        out = vec.decode_vector(payload, "u64")
    elif codec == "vec_u32":
        out = vec.decode_vector(payload, "u32")
    elif codec == "zz_u64":
        out = _unzigzag(vec.decode_vector(payload, "u64"))
    elif codec == "rle":
        out = rle.decode(payload)
    elif codec == "zz_rle":
        out = _unzigzag(rle.decode(payload))
    elif codec == "vec_f32":
        out = vec.decode_vector(payload, "f32")
    elif codec == "xor_f64":
        n = int.from_bytes(payload[:4], "little")
        out = npk.unpack_f64_xor(np.frombuffer(payload, dtype=np.uint8, offset=4), n) \
            if n else np.empty(0, dtype=np.float64)
    elif codec == "dict":
        return dictionary.decode(payload)
    elif codec == "fsst":
        return pd.Series(fsst.decode_strings(payload).to_pandas())
    elif codec == "binary_fsst":
        return pd.Series(fsst.decode(payload).to_pandas())
    elif codec == "deflate":
        import zlib
        import pyarrow as pa
        n = int.from_bytes(payload[:4], "little")
        lv_len = int.from_bytes(payload[4:8], "little")
        lens = vec.decode_vector(payload[8:8 + lv_len], "u64").astype(np.int64)[:n]
        data = zlib.decompress(payload[8 + lv_len:])
        offs = np.concatenate(([0], np.cumsum(lens)))
        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs.astype(np.int64).tobytes()), pa.py_buffer(data)])
        return pd.Series(arr.to_pandas())
    else:
        raise ValueError(codec)

    if target_dtype == "timestamp":
        return out.astype(np.int64).view("datetime64[us]")
    if target_dtype and target_dtype.startswith("int"):
        return out.astype(np.int64)
    return out
