"""BinaryVector: 16-byte header + FixedSection-256 body.

Wire format (reference src/vector.rs:53-186, vector_format.md:13-24),
all little-endian:

  +0  u32 num_bytes          bytes in vector after these 4 length bytes
  +4  u8  major type         0x10 = FixedSection256
  +5  u8  subtype            0x10 u64 | 0x11 u32 | 0x12 f32
  +6  u16 padding (0)
  +8  u32 num elements       actual (pre-padding) element count
  +12 u16 num null sections  null-run sections appended via the bulk API
  +14 u16 reserved (0)

Array-in/bytes-out API replacing the reference's mutable appender
(`encode_all`, reference src/vector.rs:238-246): in Spark there is no
incremental builder — a whole Arrow batch is encoded in one vectorized
pass inside mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np

from . import sections as sect
from .sections import FIXED_LEN

MAJOR_FIXED_SECT_256 = 0x10
SUBTYPE_U64 = 0x10
SUBTYPE_U32 = 0x11
SUBTYPE_F32 = 0x12

HEADER_BYTES = 16

_SUBTYPE_BY_KIND = {"u64": SUBTYPE_U64, "u32": SUBTYPE_U32, "f32": SUBTYPE_F32}
_WIDTH_BY_KIND = {"u64": 8, "u32": 4, "f32": 4}


class WrongVectorType(ValueError):
    pass


def _header(num_body_bytes: int, subtype: int, num_elements: int, num_null_sections: int) -> bytes:
    # num_bytes counts everything after the 4 length bytes: 12 header + body
    return struct.pack(
        "<IBBHIHH",
        HEADER_BYTES - 4 + num_body_bytes,
        MAJOR_FIXED_SECT_256,
        subtype,
        0,
        num_elements,
        num_null_sections,
        0,
    )


def encode_vector(values: np.ndarray, kind: str,
                  null_mask: np.ndarray | None = None) -> bytes:
    """Encode a numeric array into a finished BinaryVector.

    kind: 'u32' | 'u64' | 'f32'.  Matches the reference's
    appender.encode_all(values) + finish(len(values)) byte-for-byte.

    null_mask marks elements appended through the bulk-null API
    (reference append_nulls, src/vector.rs:311-335): masked elements
    must already be zero in `values`, and any 256-aligned section fully
    covered by the mask counts toward the header's num_null_sections —
    exactly the sections the reference emits via its "write_buf empty
    and >= 256 nulls left" path.  Without a mask the counter is 0, as
    encode_all over a plain value stream never increments it.
    """
    if kind == "f32":
        body, offs = sect.encode_sections_f32(np.asarray(values, dtype=np.float32))
    else:
        vals = np.asarray(values)
        if vals.dtype != np.uint64:
            vals = vals.astype(np.uint64)
        if kind == "u32" and len(vals) and int(vals.max()) > 0xFFFFFFFF:
            raise ValueError("u32 vector with value > u32 max")
        body, offs = sect.encode_sections_int(vals, _WIDTH_BY_KIND[kind])

    n_null_sections = 0
    if null_mask is not None and len(null_mask):
        m = np.asarray(null_mask, dtype=bool)
        full = (len(m) // FIXED_LEN) * FIXED_LEN
        if full:
            n_null_sections = int(m[:full].reshape(-1, FIXED_LEN).all(axis=1).sum())
    hdr = _header(len(body), _SUBTYPE_BY_KIND[kind], len(values), n_null_sections)
    return hdr + body.tobytes()


def read_header(buf: bytes) -> dict:
    num_bytes, major, subtype, _pad, num_elements, num_null_sections, _r = struct.unpack_from(
        "<IBBHIHH", buf, 0)
    return {
        "num_bytes": num_bytes,
        "major_type": major,
        "subtype": subtype,
        "num_elements": num_elements,
        "num_null_sections": num_null_sections,
        "total_bytes": num_bytes + 4,
    }


def _check(buf: bytes, kind: str) -> dict:
    h = read_header(buf)
    if len(buf) < h["total_bytes"]:
        raise ValueError("input too short")
    if h["subtype"] != _SUBTYPE_BY_KIND[kind]:
        raise WrongVectorType(f"subtype 0x{h['subtype']:02x} != expected for {kind}")
    return h


def num_sections(buf: bytes) -> int:
    h = read_header(buf)
    return (h["num_elements"] + FIXED_LEN - 1) // FIXED_LEN


def decode_vector(buf: bytes, kind: str) -> np.ndarray:
    """Decode a BinaryVector back to its values (truncated to the actual
    element count — tail padding stripped)."""
    h = _check(buf, kind)
    n = h["num_elements"]
    body = np.frombuffer(buf, dtype=np.uint8, offset=HEADER_BYTES,
                         count=h["total_bytes"] - HEADER_BYTES)
    nsect = (n + FIXED_LEN - 1) // FIXED_LEN
    width = _WIDTH_BY_KIND[kind]
    offs = sect.walk_sections(body, nsect, width)
    if kind == "f32":
        return sect.decode_sections_f32(body, offs)[:n]
    vals = sect.decode_sections_int(body, offs, width)[:n]
    if kind == "u32":
        return vals.astype(np.uint32)
    return vals


def vector_stats(buf: bytes, kind: str) -> dict:
    """Size + codec histogram summary (reference VectorStats,
    src/vector.rs:470-506)."""
    h = _check(buf, kind)
    n = h["num_elements"]
    body = np.frombuffer(buf, dtype=np.uint8, offset=HEADER_BYTES,
                         count=h["total_bytes"] - HEADER_BYTES)
    nsect = (n + FIXED_LEN - 1) // FIXED_LEN
    offs = sect.walk_sections(body, nsect, _WIDTH_BY_KIND[kind])
    return {
        "num_bytes": h["total_bytes"],
        "num_elements": n,
        "bytes_per_elem": h["total_bytes"] / n if n else float("nan"),
        "sect_types_histogram": sect.section_stats(body, offs),
    }
