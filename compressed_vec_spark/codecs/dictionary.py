"""Dictionary codec for low-cardinality strings (lang, url hosts, flags).

The reference format reserves BinDict vector types and the README states
the design goal of filtering over dictionary codes without decompression
(reference src/vector.rs:62-69 `VectorType::BinDict`, README.md:77-78);
the codec itself is new work mandated by the north rule.

Blob layout (little-endian):
  +0   b'D' magic, u8 version=1
  +2   u32 number of dictionary entries K (code 0 is reserved for NULL)
  +6   u32 total dictionary utf8 bytes D
  +10  (K+1) * u32 entry byte offsets into the utf8 heap
  ..   D bytes utf8 heap (entries sorted lexicographically => codes are
       order-preserving, so range predicates map to code ranges)
  ..   BinaryVector<u32> of codes (AutoEncoder sections) — equality /
       IN filters run on this vector compressed, never touching strings.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .. import vector as vec

MAGIC = b"D\x01"


def encode(series: pd.Series) -> bytes:
    isnull = series.isna().to_numpy()
    filled = series.fillna("")
    # hash-based factorize (C-speed) + a sort of the small dictionary
    raw_codes, uniques = pd.factorize(filled, sort=True)
    codes = (raw_codes + 1).astype(np.uint64)
    codes[isnull] = 0
    uniques = list(uniques)
    # fillna("") injects a phantom "" entry when the series has NULLs
    # but no genuine empty string; it would be zero-referenced (nulls
    # are code 0) yet still inflate DISTINCT counts derived from the
    # dictionary heap.  "" sorts first, so it can only be code 1.
    if uniques and uniques[0] == "" and not (codes == 1).any():
        uniques = uniques[1:]
        codes[codes > 0] -= 1
    enc = [str(s).encode("utf-8") for s in uniques]
    offsets = np.zeros(len(enc) + 1, dtype=np.uint32)
    np.cumsum([len(b) for b in enc], out=offsets[1:])
    heap = b"".join(enc)
    codes_vec = vec.encode_vector(codes, "u32")
    return (MAGIC + struct.pack("<II", len(enc), len(heap))
            + offsets.tobytes() + heap + codes_vec)


def _parse(blob: bytes):
    assert blob[:2] == MAGIC, "not a dictionary blob"
    k, d = struct.unpack_from("<II", blob, 2)
    off0 = 10
    offsets = np.frombuffer(blob, dtype=np.uint32, count=k + 1, offset=off0)
    heap_start = off0 + 4 * (k + 1)
    heap = blob[heap_start:heap_start + d]
    codes_vec = blob[heap_start + d:]
    return offsets, heap, codes_vec


def dictionary(blob: bytes) -> list[str]:
    offsets, heap, _ = _parse(blob)
    return [heap[offsets[i]:offsets[i + 1]].decode("utf-8") for i in range(len(offsets) - 1)]


def codes(blob: bytes) -> np.ndarray:
    _, _, codes_vec = _parse(blob)
    return vec.decode_vector(codes_vec, "u32")


def decode(blob: bytes) -> pd.Series:
    """Decode to a pandas string Series (NULL for code 0)."""
    d = dictionary(blob)
    c = codes(blob).astype(np.int64) - 1
    cat = pd.Categorical.from_codes(c, categories=pd.Index(d, dtype=object) if d else pd.Index([], dtype=object))
    return pd.Series(cat.astype(object))


def code_of(blob: bytes, value: str) -> int:
    """Binary-search the sorted dictionary; 0 (=NULL, matches nothing
    non-null) if absent.  Used to push string equality down to the
    compressed u32 code vector."""
    offsets, heap, _ = _parse(blob)
    lo, hi = 0, len(offsets) - 1
    target = value.encode("utf-8")
    while lo < hi:
        mid = (lo + hi) // 2
        s = heap[offsets[mid]:offsets[mid + 1]]
        if s < target:
            lo = mid + 1
        else:
            hi = mid
    if lo < len(offsets) - 1 and heap[offsets[lo]:offsets[lo + 1]] == target:
        return lo + 1
    return 0


def code_range(blob: bytes, lo: str, hi: str) -> tuple[int, int]:
    """Map a string range [lo, hi] to a code range — valid because the
    dictionary is lexicographically sorted (order-preserving codes).
    Returns an inclusive (lo_code, hi_code); empty if lo_code > hi_code."""
    offsets, heap, _ = _parse(blob)
    k = len(offsets) - 1
    entries = [heap[offsets[i]:offsets[i + 1]] for i in range(k)]
    import bisect
    lo_code = bisect.bisect_left(entries, lo.encode("utf-8")) + 1
    hi_code = bisect.bisect_right(entries, hi.encode("utf-8"))
    return lo_code, hi_code


def prefix_range(blob: bytes, prefix: str) -> tuple[int, int]:
    """Map `value LIKE 'prefix%'` to an inclusive code range — the
    sorted dictionary makes prefix predicates pure code-range scans on
    the compressed vector."""
    offsets, heap, _ = _parse(blob)
    k = len(offsets) - 1
    entries = [heap[offsets[i]:offsets[i + 1]] for i in range(k)]
    import bisect
    p = prefix.encode("utf-8")
    lo_code = bisect.bisect_left(entries, p) + 1
    hi_code = bisect.bisect_left(entries, p + b"\xff\xff\xff\xff")
    return lo_code, hi_code


def codes_vector(blob: bytes) -> bytes:
    """The embedded BinaryVector<u32> — feed to operators.filters to
    filter compressed."""
    return _parse(blob)[2]
