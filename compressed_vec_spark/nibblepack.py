"""Vectorized NibblePack codec — the innermost kernel of the engine.

NibblePack packs groups of 8 u64 values into: a 1-byte nonzero bitmask,
a 1-byte nibble-width descriptor, and the minimum number of nibbles per
nonzero value, concatenated little-endian-bitwise and padded to a byte
boundary.  This is a bit-identical, numpy-vectorized re-implementation of
the algorithm in the reference Rust crate (semantics per
reference src/nibblepacking.rs:108-232 `nibble_pack8` /
`pack_to_even_nibbles` / `pack_universal`, and decode per
src/nibblepacking.rs:414-476 `nibble_unpack8`).  Unlike the reference,
which packs one 8-group at a time, this implementation packs/unpacks an
arbitrary number of 8-groups in one shot with no per-row (or even
per-group) Python — `np.repeat`/`np.cumsum` index machinery replaces the
reference's SIMD lanes.

Wire format per 8-group (little-endian):
  +0  u8 nonzero bitmask (bit i set => inputs[i] != 0); if 0 the group
      is 1 byte total
  +1  u8 nibble word: hi nibble = (num_nibbles - 1), lo nibble =
      trailing_zero_nibbles
  +2  packed payload: for each nonzero value in lane order,
      (value >> 4*trailing_zero_nibbles) emitted as num_nibbles 4-bit
      nibbles, least-significant nibble first, the whole group padded to
      a byte boundary with zero bits.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.int64)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Per-element bit length of a uint64 array (0 for 0). Exact for all 64 bits."""
    hi = (x >> _U64(32)).astype(np.uint64)
    lo = (x & _U64(0xFFFFFFFF)).astype(np.uint64)
    # float64 is exact for 32-bit ints; frexp exponent == bit length
    bl_hi = np.frexp(hi.astype(np.float64))[1]
    bl_lo = np.frexp(lo.astype(np.float64))[1]
    return np.where(hi > 0, bl_hi + 32, bl_lo).astype(np.int64)


def _within(counts: np.ndarray, total: int | None = None) -> np.ndarray:
    """For run lengths `counts`, return [0..c0-1, 0..c1-1, ...] vectorized."""
    if total is None:
        total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def pack_groups(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack a (G, 8) uint64 array into NibblePack bytes.

    Returns (out_bytes: uint8 1-D array of all groups concatenated,
             group_sizes: int64 (G,) bytes consumed per group).
    """
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    assert vals.ndim == 2 and vals.shape[1] == 8
    G = vals.shape[0]
    if G == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)

    nz = vals != 0
    mask = np.packbits(nz, axis=1, bitorder="little").ravel()  # (G,) uint8
    nzg = mask != 0

    ored = np.bitwise_or.reduce(vals, axis=1)
    bl = _bit_length_u64(ored)                      # 64 - leading_zeros
    lowbit = ored & (~ored + _U64(1))
    tz_bits = _bit_length_u64(lowbit) - 1           # trailing zeros (=-1 for ored==0)
    tz_nib = np.where(nzg, tz_bits // 4, 0).astype(np.int64)
    num_nib = np.where(nzg, 16 - (64 - bl) // 4 - tz_nib, 0).astype(np.int64)

    shifted = vals >> (tz_nib * 4).astype(np.uint64)[:, None]

    # nibble counts per (group, lane)
    cnt = np.where(nz, num_nib[:, None], 0).astype(np.int64)
    gn = cnt.sum(axis=1)                            # nibbles per group
    pnb = (gn + 1) // 2                             # payload bytes per group

    # output layout
    gsize = 1 + np.where(nzg, 1 + pnb, 0)
    out_off = np.concatenate(([0], np.cumsum(gsize)[:-1]))
    out = np.zeros(int(gsize.sum()), dtype=np.uint8)
    out[out_off] = mask
    nibword = (((num_nib - 1) << 4) | tz_nib).astype(np.uint8)
    out[out_off[nzg] + 1] = nibword[nzg]

    full = mask == 0xFF
    # FAST PATH: all-8-nonzero groups, one fixed-shape pass per distinct
    # width — no per-nibble index machinery (the dominant case on dense
    # integer data)
    for w in np.unique(num_nib[full]):
        idx = np.nonzero(full & (num_nib == w))[0]
        w = int(w)
        sh = shifted[idx]                           # (Gw, 8)
        # one nibble column per step into the lane-major stream — avoids
        # the (Gw, 8, w) uint64 broadcast temp
        stream = np.empty((len(idx), 8 * w), dtype=np.uint8)
        for j in range(w):
            stream[:, j::w] = ((sh >> _U64(4 * j)) & _U64(0xF)).astype(np.uint8)
        block = stream[:, 0::2] | (stream[:, 1::2] << 4)   # (Gw, 4w)
        dst = out_off[idx][:, None] + 2 + np.arange(4 * w)
        out[dst] = block

    # GENERIC PATH: partially-zero groups via repeat/cumsum scatter
    part = nzg & ~full
    if part.any():
        p_idx = np.nonzero(part)[0]
        p_cnt = cnt[p_idx].ravel()
        p_gn = gn[p_idx]
        p_pnb = pnb[p_idx]
        total_nibs = int(p_gn.sum())
        src = np.repeat(np.arange(len(p_idx) * 8, dtype=np.int64), p_cnt)
        k = _within(p_cnt, total_nibs)
        nib = ((shifted[p_idx].ravel()[src] >> (_U64(4) * k.astype(np.uint64)))
               & _U64(0xF)).astype(np.uint8)
        padded_len = p_pnb * 2
        pad_start = np.concatenate(([0], np.cumsum(padded_len)[:-1]))
        dst = np.repeat(pad_start, p_gn) + _within(p_gn, total_nibs)
        nibarr = np.zeros(int(padded_len.sum()), dtype=np.uint8)
        nibarr[dst] = nib
        payload = nibarr[0::2] | (nibarr[1::2] << 4)
        total_payload = int(p_pnb.sum())
        if total_payload:
            pay_dst = np.repeat(out_off[p_idx] + 2, p_pnb) + _within(p_pnb, total_payload)
            out[pay_dst] = payload
    return out, gsize


def group_sizes(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Byte size of each NibblePack group starting at offsets `offs` in `data`."""
    mask = data[offs]
    nzg = mask != 0
    safe = np.minimum(offs + 1, len(data) - 1)
    nibw = np.where(nzg, data[safe], 0)
    num_nib = ((nibw >> 4) + 1).astype(np.int64)
    popc = _POPCOUNT8[mask]
    pay_bytes = (num_nib * 4 * popc + 7) // 8
    return np.where(nzg, 2 + pay_bytes, 1)


def unpack_groups(data: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack NibblePack groups at byte offsets `offs` of `data`.

    Returns (vals: (G, 8) uint64, sizes: int64 (G,) bytes consumed).
    All groups are decoded in one vectorized pass.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offs = np.asarray(offs, dtype=np.int64)
    G = len(offs)
    out = np.zeros((G, 8), dtype=np.uint64)
    if G == 0:
        return out, np.empty(0, dtype=np.int64)

    mask = data[offs]
    nzg = mask != 0
    safe = np.minimum(offs + 1, len(data) - 1)
    nibw = np.where(nzg, data[safe], 0)
    num_nib = ((nibw >> 4) + 1).astype(np.int64)
    tz_nib = (nibw & 0xF).astype(np.int64)
    popc = _POPCOUNT8[mask]
    gn = np.where(nzg, num_nib * popc, 0)           # nibbles per group
    pb = (gn + 1) // 2                              # payload bytes per group
    sizes = np.where(nzg, 2 + pb, 1)

    total_pb = int(pb.sum())
    if total_pb == 0:
        return out, sizes

    full = mask == 0xFF
    # FAST PATH: all-8-nonzero groups per distinct width, fixed-shape
    widths = np.unique(num_nib[full])
    uniform = len(widths) == 1 and bool(full.all())
    for w in widths:
        # uniform chunk (every group full at one width — the dense
        # case): the groups ARE the output rows, so skip the nonzero
        # index build and the fancy-index scatter at the end
        idx = slice(None) if uniform else np.nonzero(full & (num_nib == w))[0]
        w = int(w)
        g_w = G if uniform else len(idx)
        # per-byte-column gathers: a 1D int64 index per payload byte is
        # ~2x faster than one 2D fancy-index whose index matrix alone
        # is 8x the gathered data
        base = offs[idx] + 2
        block = np.empty((g_w, 4 * w), dtype=np.uint8)
        for b in range(4 * w):
            block[:, b] = data[base + b]
        nibs = np.empty((g_w, 8 * w), dtype=np.uint8)
        nibs[:, 0::2] = block & 0xF
        nibs[:, 1::2] = block >> 4
        # accumulate one nibble column at a time: no (G, 8, w) uint64
        # temp, ~2x less memory traffic than a broadcast+sum reduction
        vals = np.zeros((g_w, 8), dtype=np.uint64)
        for j in range(w):
            vals |= nibs[:, j::w].astype(np.uint64) << _U64(4 * j)
        tz = tz_nib[idx]
        if tz.any():
            vals <<= (_U64(4) * tz.astype(np.uint64))[:, None]
        if uniform:
            out = vals
        else:
            out[idx] = vals

    part = nzg & ~full
    if part.any():
        p = np.nonzero(part)[0]
        # class-based decode: partial groups sharing (popcount, nibble
        # width) have a FIXED payload shape, so each class runs the same
        # fixed-stride kernel as the full-group fast path — 3-5x the
        # fully-ragged expansion as long as the class count stays small
        # (it is: real data concentrates around a few widths)
        keys = popc[p].astype(np.int64) * 32 + num_nib[p]
        classes = np.unique(keys)
        if len(classes) <= 48:
            for key in classes:
                sel = p[keys == key]
                pc_c = int(key) // 32               # values per group
                w_c = int(key) % 32                 # nibbles per value
                nb = pc_c * w_c                     # payload nibbles
                pb_c = (nb + 1) // 2
                base = offs[sel] + 2
                block = np.empty((len(sel), pb_c), dtype=np.uint8)
                for b in range(pb_c):
                    block[:, b] = data[base + b]
                nibs = np.empty((len(sel), 2 * pb_c), dtype=np.uint8)
                nibs[:, 0::2] = block & 0xF
                nibs[:, 1::2] = block >> 4
                vals_c = np.zeros((len(sel), pc_c), dtype=np.uint64)
                for j in range(w_c):
                    vals_c |= nibs[:, j:nb:w_c].astype(np.uint64) << _U64(4 * j)
                tz = tz_nib[sel]
                if tz.any():
                    vals_c <<= (_U64(4) * tz.astype(np.uint64))[:, None]
                lanes = np.unpackbits(mask[sel][:, None], axis=1,
                                      bitorder="little").astype(bool)
                sub = out[sel]
                sub[np.nonzero(lanes)] = vals_c.ravel()
                out[sel] = sub
        else:
            # ragged fallback for pathological width/popcount spreads
            p_pb = pb[p]
            total_ppb = int(p_pb.sum())
            src_byte = np.repeat(offs[p] + 2, p_pb) + _within(p_pb, total_ppb)
            pay = data[src_byte]
            nibs = np.empty(2 * total_ppb, dtype=np.uint8)
            nibs[0::2] = pay & 0xF
            nibs[1::2] = pay >> 4
            pad_start = np.concatenate(([0], np.cumsum(2 * p_pb)[:-1]))

            nv = int(popc[p].sum())
            gv = np.repeat(np.arange(len(p), dtype=np.int64), popc[p])
            j = _within(popc[p], nv)
            width = num_nib[p][gv]                   # nibbles per value
            total_w = int(width.sum())
            vstart = np.concatenate(([0], np.cumsum(width)[:-1]))
            srcnib = np.repeat(pad_start[gv] + j * width, width) + _within(width, total_w)
            k = _within(width, total_w)
            shift = (4 * (k + np.repeat(tz_nib[p][gv], width))).astype(np.uint64)
            contrib = nibs[srcnib].astype(np.uint64) << shift
            vals_flat = np.add.reduceat(contrib, vstart) if nv else np.empty(0, dtype=np.uint64)

            lanes = np.unpackbits(mask[p][:, None], axis=1, bitorder="little").astype(bool)
            sub = out[p]
            sub[np.nonzero(lanes)] = vals_flat
            out[p] = sub
    return out, sizes


def pack_u64(values: np.ndarray) -> np.ndarray:
    """Pack a flat uint64 array (padded with zeros to a multiple of 8),
    mirroring reference src/nibblepacking.rs:68-93 `pack_u64`."""
    values = np.asarray(values, dtype=np.uint64)
    n = len(values)
    padded = n + (-n) % 8
    buf = np.zeros(padded, dtype=np.uint64)
    buf[:n] = values
    out, _ = pack_groups(buf.reshape(-1, 8))
    return out


def unpack_u64(data: np.ndarray, num_values: int) -> np.ndarray:
    """Unpack `num_values` (rounded up to 8) values from a packed buffer.
    Sequential group walk is required since sizes are data-dependent; the
    walk is a cheap scalar offset chase, the decode itself is one
    vectorized pass (mirrors reference src/nibblepacking.rs:364-377)."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    ngroups = (num_values + 7) // 8
    offs = np.empty(ngroups, dtype=np.int64)
    bv = data.tobytes()   # python bytes peeks are ~20x cheaper than numpy
    off = 0
    for g in range(ngroups):
        offs[g] = off
        m = bv[off]
        if m == 0:
            off += 1
        else:
            nn = (bv[off + 1] >> 4) + 1
            off += 2 + (nn * 4 * m.bit_count() + 7) // 8
    vals, _ = unpack_groups(data, offs)
    return vals.ravel()[:num_values]


def pack_u64_delta(values: np.ndarray) -> np.ndarray:
    """Delta-vs-previous then pack; decreasing steps clamp to 0
    (reference src/nibblepacking.rs:15-23)."""
    values = np.asarray(values, dtype=np.uint64)
    prev = np.concatenate(([_U64(0)], values[:-1]))
    deltas = np.where(values >= prev, values - prev, _U64(0))
    return pack_u64(deltas)


def unpack_u64_delta(data: np.ndarray, num_values: int) -> np.ndarray:
    """Inverse of pack_u64_delta: cumulative sum restore (DeltaSink,
    reference src/nibblepacking.rs:239-279)."""
    return np.cumsum(unpack_u64(data, num_values))


def pack_f64_xor(values: np.ndarray) -> np.ndarray:
    """First f64 raw (8 bytes LE), then XOR-with-previous bit patterns
    NibblePacked (reference src/nibblepacking.rs:29-45)."""
    values = np.asarray(values, dtype=np.float64)
    if len(values) == 0:
        raise ValueError("input too short")
    bits = values.view(np.uint64)
    head = bits[:1].tobytes()
    xored = bits[1:] ^ bits[:-1]
    return np.concatenate([np.frombuffer(head, dtype=np.uint8), pack_u64(xored)])


def unpack_f64_xor(data: np.ndarray, num_values: int) -> np.ndarray:
    """Inverse of pack_f64_xor (reference src/nibblepacking.rs:392-400)."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    first = data[:8].view(np.uint64)[0]
    rest = unpack_u64(data[8:], num_values - 1)
    bits = np.empty(num_values, dtype=np.uint64)
    bits[0] = first
    bits[1:] = rest[: num_values - 1]
    return np.bitwise_xor.accumulate(bits).view(np.float64)
