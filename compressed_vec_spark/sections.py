"""FixedSection-256 codec layer: section writers/readers + AutoEncoder.

A compressed vector body is a sequence of self-contained 256-element
sections, each starting with a 1-byte section-type code (reference
src/section.rs:32-38, vector_format.md:29-90):

  0 Null                256 zeros; 1 byte total
  1 NibblePackedMedium  [1][u16 LE payload bytes][NibblePacked 32 groups]
  3 DeltaNPMedium       [3][u16 LE payload bytes][u8 delta bits]
                        [base, element width LE, header padded to 12 B]
                        [NibblePacked deltas]
  5 Constant            [5][value, element width LE]
  6 XorNPMedium         [6][u16 LE TOTAL bytes incl. 3-byte header]
                        [NibblePacked XOR-chained octets]

Codec choice per section is stats-driven (AutoEncoder, reference
src/section.rs:821-846).  Everything here is numpy-vectorized across ALL
sections of a column chunk at once — the per-section loop of the
reference becomes cumsum/scatter index arithmetic, which is how this
engine stays fast inside Arrow-batched Spark UDFs.
"""

from __future__ import annotations

import numpy as np

from . import nibblepack as npk

FIXED_LEN = 256
GROUPS_PER_SECT = FIXED_LEN // 8

SECT_NULL = 0
SECT_NP_MED = 1
SECT_DELTA_NP_MED = 3
SECT_CONST = 5
SECT_XOR_NP_MED = 6

SECT_NAMES = {
    SECT_NULL: "Null",
    SECT_NP_MED: "NibblePackedMedium",
    SECT_DELTA_NP_MED: "DeltaNPMedium",
    SECT_CONST: "Constant",
    SECT_XOR_NP_MED: "XorNPMedium",
}

DELTA_HEADER_SIZE = 12

_U64 = np.uint64


def _pad_to_sections(values: np.ndarray) -> np.ndarray:
    """Zero-pad to a multiple of FIXED_LEN (nulls-as-zeros tail padding,
    reference src/vector.rs:344-359)."""
    n = len(values)
    pad = (-n) % FIXED_LEN
    if pad:
        values = np.concatenate([values, np.zeros(pad, dtype=values.dtype)])
    return values


def _bit_length(x: np.ndarray) -> np.ndarray:
    return npk._bit_length_u64(np.asarray(x, dtype=np.uint64))


def choose_sections_int(sect_vals: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AutoEncoder decision per section for unsigned ints
    (reference src/section.rs:821-846).

    sect_vals: (S, 256) uint64. Returns (sect_type (S,), mins (S,), maxs (S,)).
    """
    mins = sect_vals.min(axis=1)
    maxs = sect_vals.max(axis=1)
    rng = maxs - mins
    regular_nibbles = (_bit_length(maxs) + 3) // 4
    range_nibbles = (_bit_length(rng) + 3) // 4
    types = np.where(
        mins == maxs,
        np.where(mins == 0, SECT_NULL, SECT_CONST),
        np.where(range_nibbles < regular_nibbles, SECT_DELTA_NP_MED, SECT_NP_MED),
    ).astype(np.int64)
    return types, mins, maxs


def encode_sections_int(values: np.ndarray, elem_width: int) -> tuple[np.ndarray, np.ndarray]:
    """Encode a flat unsigned-int array into concatenated sections.

    values: uint64 array (any length; zero-padded to 256-multiple here).
    elem_width: 4 (u32) or 8 (u64) — affects Const/Delta base field width.
    Returns (body bytes uint8, per-section byte offsets int64 incl. end).
    """
    values = _pad_to_sections(np.ascontiguousarray(values, dtype=np.uint64))
    S = len(values) // FIXED_LEN
    sect_vals = values.reshape(S, FIXED_LEN)
    types, mins, maxs = choose_sections_int(sect_vals)

    is_np = types == SECT_NP_MED
    is_delta = types == SECT_DELTA_NP_MED
    packable = is_np | is_delta

    # NibblePack all packable sections' groups in ONE kernel call
    pk_idx = np.nonzero(packable)[0]
    if len(pk_idx):
        pk_vals = sect_vals[pk_idx].astype(np.uint64)
        pk_vals = pk_vals - np.where(is_delta[pk_idx], mins[pk_idx], 0)[:, None]
        payload, gsizes = npk.pack_groups(pk_vals.reshape(-1, 8))
        sect_payload_len = gsizes.reshape(-1, GROUPS_PER_SECT).sum(axis=1)
        payload_off = np.concatenate(([0], np.cumsum(sect_payload_len)[:-1]))
    else:
        payload = np.empty(0, dtype=np.uint8)
        sect_payload_len = np.empty(0, dtype=np.int64)
        payload_off = sect_payload_len

    # per-section output sizes
    sizes = np.ones(S, dtype=np.int64)                      # Null
    sizes[types == SECT_CONST] = 1 + elem_width
    pk_sizes = np.where(is_delta[pk_idx], DELTA_HEADER_SIZE, 3) + sect_payload_len
    sizes[pk_idx] = pk_sizes

    out = np.zeros(int(sizes.sum()), dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum(sizes)))
    starts = offs[:-1]
    out[starts] = types

    # Constant sections: value little-endian at +1
    c_idx = np.nonzero(types == SECT_CONST)[0]
    if len(c_idx):
        cvals = mins[c_idx]
        for b in range(elem_width):
            out[starts[c_idx] + 1 + b] = ((cvals >> _U64(8 * b)) & _U64(0xFF)).astype(np.uint8)

    if len(pk_idx):
        pk_starts = starts[pk_idx]
        hdr = np.where(is_delta[pk_idx], DELTA_HEADER_SIZE, 3)
        # u16 LE payload length at +1
        out[pk_starts + 1] = (sect_payload_len & 0xFF).astype(np.uint8)
        out[pk_starts + 2] = ((sect_payload_len >> 8) & 0xFF).astype(np.uint8)
        # Delta extras: numbits at +3, base at +4 (elem_width bytes)
        d_sel = is_delta[pk_idx]
        d_starts = pk_starts[d_sel]
        if len(d_starts):
            d_mins = mins[pk_idx][d_sel]
            d_rng = (maxs[pk_idx] - mins[pk_idx])[d_sel]
            out[d_starts + 3] = _bit_length(d_rng).astype(np.uint8)
            for b in range(elem_width):
                out[d_starts + 4 + b] = ((d_mins >> _U64(8 * b)) & _U64(0xFF)).astype(np.uint8)
        # scatter payloads
        total_payload = len(payload)
        dst = np.repeat(pk_starts + hdr, sect_payload_len) + npk._within(sect_payload_len, total_payload)
        out[dst] = payload
    return out, offs


def encode_sections_f32(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode f32 values as XorNPMedium sections (degrading to Null/Const
    when min == max, reference src/section.rs:719-754)."""
    values = _pad_to_sections(np.ascontiguousarray(values, dtype=np.float32))
    S = len(values) // FIXED_LEN
    sect_vals = values.reshape(S, FIXED_LEN)
    mins = sect_vals.min(axis=1)
    maxs = sect_vals.max(axis=1)
    const = mins == maxs
    types = np.where(const, np.where(mins == 0.0, SECT_NULL, SECT_CONST),
                     SECT_XOR_NP_MED).astype(np.int64)

    xor_idx = np.nonzero(~const)[0]
    if len(xor_idx):
        bits = sect_vals[xor_idx].view(np.uint32).astype(np.uint64).reshape(-1, GROUPS_PER_SECT, 8)
        xored = bits.copy()
        xored[:, 1:, :] ^= bits[:, :-1, :]
        payload, gsizes = npk.pack_groups(xored.reshape(-1, 8))
        sect_payload_len = gsizes.reshape(-1, GROUPS_PER_SECT).sum(axis=1)
    else:
        payload = np.empty(0, dtype=np.uint8)
        sect_payload_len = np.empty(0, dtype=np.int64)

    sizes = np.ones(S, dtype=np.int64)
    sizes[types == SECT_CONST] = 1 + 4
    sizes[xor_idx] = 3 + sect_payload_len

    out = np.zeros(int(sizes.sum()), dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum(sizes)))
    starts = offs[:-1]
    out[starts] = types

    c_idx = np.nonzero(types == SECT_CONST)[0]
    if len(c_idx):
        cbits = mins[c_idx].view(np.uint32)
        for b in range(4):
            out[starts[c_idx] + 1 + b] = ((cbits >> np.uint32(8 * b)) & np.uint32(0xFF)).astype(np.uint8)

    if len(xor_idx):
        x_starts = starts[xor_idx]
        total = (3 + sect_payload_len)  # XOR u16 length INCLUDES the 3 header bytes
        out[x_starts + 1] = (total & 0xFF).astype(np.uint8)
        out[x_starts + 2] = ((total >> 8) & 0xFF).astype(np.uint8)
        dst = np.repeat(x_starts + 3, sect_payload_len) + npk._within(sect_payload_len, len(payload))
        out[dst] = payload
    return out, offs


def walk_sections(body: np.ndarray, num_sections: int, elem_width: int) -> np.ndarray:
    """Return byte offsets (incl. end) of each section in a vector body.

    Sequential by nature (sizes are data-dependent) but the per-section
    work is a scalar header peek — ~n/256 iterations per chunk.  The
    walk runs over a `bytes` copy of the body: python bytes indexing is
    ~20x cheaper per peek than numpy scalar indexing, and the one-time
    copy is linear.  (reference FixedSectIterator, src/section.rs:850-877)
    """
    offs = np.empty(num_sections + 1, dtype=np.int64)
    bv = body.tobytes()
    off = 0
    for s in range(num_sections):
        offs[s] = off
        t = bv[off]
        if t == SECT_NP_MED:
            off += 3 + bv[off + 1] + (bv[off + 2] << 8)
        elif t == SECT_DELTA_NP_MED:
            off += DELTA_HEADER_SIZE + bv[off + 1] + (bv[off + 2] << 8)
        elif t == SECT_NULL:
            off += 1
        elif t == SECT_CONST:
            off += 1 + elem_width
        elif t == SECT_XOR_NP_MED:
            off += bv[off + 1] + (bv[off + 2] << 8)
        else:
            raise ValueError(f"invalid section type {t} at offset {off}")
    offs[num_sections] = off
    return offs


def _group_offsets(body: np.ndarray, payload_starts: np.ndarray) -> np.ndarray:
    """Offsets of all 32 groups for each section payload start.

    Wavefront: loops over the 32 group ordinals, vectorized across all
    sections — O(32) python iterations regardless of chunk size.
    Returns (n_sect, 32) int64.
    """
    n = len(payload_starts)
    offs = np.empty((n, GROUPS_PER_SECT), dtype=np.int64)
    cur = payload_starts.astype(np.int64).copy()
    for g in range(GROUPS_PER_SECT):
        offs[:, g] = cur
        if g < GROUPS_PER_SECT - 1:
            cur = cur + npk.group_sizes(body, cur)
    return offs


def decode_sections_int(body: np.ndarray, sect_offs: np.ndarray, elem_width: int) -> np.ndarray:
    """Decode all int sections of a vector body into a flat uint64 array.

    One vectorized unpack over every NibblePacked group of every section.
    """
    body = np.ascontiguousarray(body, dtype=np.uint8)
    starts = sect_offs[:-1]
    S = len(starts)
    types = body[starts]
    out = np.zeros((S, FIXED_LEN), dtype=np.uint64)

    c_idx = np.nonzero(types == SECT_CONST)[0]
    if len(c_idx):
        v = np.zeros(len(c_idx), dtype=np.uint64)
        for b in range(elem_width):
            v |= body[starts[c_idx] + 1 + b].astype(np.uint64) << _U64(8 * b)
        out[c_idx] = v[:, None]

    is_np = types == SECT_NP_MED
    is_delta = types == SECT_DELTA_NP_MED
    pk_idx = np.nonzero(is_np | is_delta)[0]
    if len(pk_idx):
        hdr = np.where(is_delta[pk_idx], DELTA_HEADER_SIZE, 3)
        goffs = _group_offsets(body, starts[pk_idx] + hdr)
        vals, _ = npk.unpack_groups(body, goffs.ravel())
        vals = vals.reshape(len(pk_idx), FIXED_LEN)
        d_sel = is_delta[pk_idx]
        if d_sel.any():
            base = np.zeros(int(d_sel.sum()), dtype=np.uint64)
            d_starts = starts[pk_idx][d_sel]
            for b in range(elem_width):
                base |= body[d_starts + 4 + b].astype(np.uint64) << _U64(8 * b)
            vals[d_sel] += base[:, None]
        out[pk_idx] = vals
    return out.ravel()


def decode_sections_f32(body: np.ndarray, sect_offs: np.ndarray) -> np.ndarray:
    """Decode f32 XOR sections into a flat float32 array."""
    body = np.ascontiguousarray(body, dtype=np.uint8)
    starts = sect_offs[:-1]
    S = len(starts)
    types = body[starts]
    out_bits = np.zeros((S, FIXED_LEN), dtype=np.uint32)

    c_idx = np.nonzero(types == SECT_CONST)[0]
    if len(c_idx):
        v = np.zeros(len(c_idx), dtype=np.uint32)
        for b in range(4):
            v |= body[starts[c_idx] + 1 + b].astype(np.uint32) << np.uint32(8 * b)
        out_bits[c_idx] = v[:, None]

    x_idx = np.nonzero(types == SECT_XOR_NP_MED)[0]
    if len(x_idx):
        goffs = _group_offsets(body, starts[x_idx] + 3)
        vals, _ = npk.unpack_groups(body, goffs.ravel())
        xored = vals.reshape(len(x_idx), GROUPS_PER_SECT, 8)
        bits = np.bitwise_xor.accumulate(xored, axis=1)
        out_bits[x_idx] = bits.reshape(len(x_idx), FIXED_LEN).astype(np.uint32)
    return out_bits.ravel().view(np.float32)


def section_stats(body: np.ndarray, sect_offs: np.ndarray) -> dict[str, int]:
    """Histogram of section types (VectorStats.sect_types_histogram,
    reference src/vector.rs:489-496)."""
    types = body[sect_offs[:-1]]
    uniq, counts = np.unique(types, return_counts=True)
    return {SECT_NAMES[int(t)]: int(c) for t, c in zip(uniq, counts)}
