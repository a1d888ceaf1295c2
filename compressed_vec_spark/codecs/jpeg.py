"""Baseline sequential JPEG (ITU-T T.81) in pure numpy — no PIL, no
libjpeg.  Retires the last import-gated image codec: the multimodal
image path (PPM, PNG, JPEG) is now fully real in this environment.

Scope: the baseline profile this pair emits and reads back —
8-bit samples, Huffman entropy coding, 4:4:4 (no chroma subsampling),
interleaved single scan, standard zigzag, JFIF YCbCr.  The decoder
refuses what it cannot decode correctly (progressive SOF2, arithmetic
coding, subsampled components, 12-bit) instead of mis-decoding.
Quantization/Huffman tables are the public example tables of
T.81 Annex K; quality scaling uses the familiar 5000/Q / 200-2Q
mapping, so quality=100 yields all-ones quantizers and the only loss
is DCT round-tripping (|err| <= 2 per channel, asserted in tests).

Throughput note: entropy coding is inherently sequential per symbol,
so encode/decode loop per block in Python — acceptable for the small
synthetic media payloads and feature-extraction batches this engine
processes per task; pixels-to-coefficients math (DCT/IDCT, quant,
color transform) is vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Figure A.6 zigzag: ZIGZAG[i] = raster index of the i-th coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# T.81 Annex K.1 example quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# T.81 Annex K.3 example Huffman tables: (BITS counts 1..16, HUFFVAL)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: coeff = C @ block @ C.T
_k = np.arange(8)
_C = np.sqrt(2.0 / 8) * np.cos((2 * _k[None, :] + 1) * _k[:, None]
                               * np.pi / 16)
_C[0] *= 1 / np.sqrt(2)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(code, length) per symbol value in HUFFVAL order (T.81 C.2)."""
    lengths = [l for l, n in enumerate(bits, 1) for _ in range(n)]
    codes, code, prev = [], 0, 0
    for ln in lengths:
        code <<= (ln - prev)
        prev = ln
        codes.append(code)
        code += 1
    return {v: (c, ln) for v, c, ln in zip(vals, codes, lengths)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-padding per spec


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(n_blocks, 8, 8) float blocks of an edge-replicated plane, in
    raster MCU order."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]           # replicate edges: cheap and
    p[:, w:] = p[:, w - 1:w]            # avoids ringing vs zero-pad
    return (p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF JPEG bytes, 4:4:4."""
    px = np.asarray(pixels)
    assert px.ndim == 3 and px.shape[2] == 3 and px.dtype == np.uint8
    h, w = px.shape[:2]
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b

    qts = [_scaled_qt(QT_LUMA, quality), _scaled_qt(QT_CHROMA, quality)]
    # all components' blocks: DCT + quantize + zigzag, fully vectorized
    comps = []
    for plane, qt in ((y, qts[0]), (cb, qts[1]), (cr, qts[1])):
        blk = _blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _C, blk, _C)
        qz = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
        comps.append(qz.reshape(-1, 64)[:, ZIGZAG])

    dc_tabs = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    ac_tabs = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    for n in range(len(comps[0])):       # MCU order; 4:4:4 = 1 blk/comp
        for ci in range(3):
            ti = 0 if ci == 0 else 1
            zz = comps[ci][n]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s = _size_cat(diff)
            c, ln = dc_tabs[ti][s]
            bw.put(c, ln)
            if s:
                bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            nz = np.flatnonzero(zz[1:])
            for i in nz:
                run = int(i) - run  # gap since previous nonzero
                while run >= 16:
                    c, ln = ac_tabs[ti][0xF0]   # ZRL
                    bw.put(c, ln)
                    run -= 16
                v = int(zz[1 + i])
                s = _size_cat(v)
                c, ln = ac_tabs[ti][(run << 4) | s]
                bw.put(c, ln)
                bw.put(v if v > 0 else v + (1 << s) - 1, s)
                run = int(i) + 1
            if not len(nz) or nz[-1] != 62:
                c, ln = ac_tabs[ti][0x00]       # EOB
                bw.put(c, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0))                          # APP0
    for i, qt in enumerate(qts):                       # DQT, zigzag order
        out += seg(0xFFDB, bytes([i])
                   + qt[ZIGZAG].astype(np.uint8).tobytes())
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)  # SOF0
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for tc_th, (bits, vals) in ((0x00, DC_LUMA), (0x10, AC_LUMA),
                                (0x01, DC_CHROMA), (0x11, AC_CHROMA)):
        out += seg(0xFFC4, bytes([tc_th] + bits + vals))  # DHT
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


def _decode_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """65536-entry peek table: 16-bit window -> (value << 5) | length.
    One gather decodes any symbol (max code length is 16)."""
    lut = np.full(1 << 16, -1, dtype=np.int32)
    lengths = [l for l, n in enumerate(bits, 1) for _ in range(n)]
    code, prev = 0, 0
    for v, ln in zip(vals, lengths):
        code <<= (ln - prev)
        prev = ln
        lo = code << (16 - ln)
        lut[lo:lo + (1 << (16 - ln))] = (v << 5) | ln
        code += 1
    return lut


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0       # bit position
        self.n = len(data) * 8

    def peek16(self) -> int:
        byte, off = self.pos >> 3, self.pos & 7
        chunk = self.data[byte:byte + 4].ljust(4, b"\xff")
        return (int.from_bytes(chunk, "big") >> (16 - off)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.pos += k

    def get(self, k: int) -> int:
        v = self.peek16() >> (16 - k) if k else 0
        self.pos += k
        return v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes -> RGB uint8 (h, w, 3).  Refuses
    progressive / arithmetic / subsampled / 12-bit streams."""
    b = payload
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = {}
    huff = {}
    sof = None
    scan = None
    app14_transform = None
    while pos + 1 < len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        while b[pos + 1] == 0xFF:      # T.81: any number of fill FFs
            pos += 1
            if pos + 1 >= len(b):
                raise ValueError("truncated JPEG header")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        if pos + 4 > len(b):
            raise ValueError("truncated JPEG header")
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        body = b[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quantizers")
                tbl = np.frombuffer(body[i + 1:i + 65], np.uint8) \
                    .astype(np.int32)
                dz = np.empty(64, np.int32)
                dz[ZIGZAG] = tbl            # de-zigzag to raster
                qt[tq] = dz
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0)")
        elif marker == 0xC0:
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit samples")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError("chroma subsampling")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[tc_th] = _decode_lut(bits, vals)
                i += 17 + nv
        elif marker == 0xDA:
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 15) for i in range(ns)]
            break
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            app14_transform = body[11]
        # other APPn / COM / DRI etc.: skipped (DRI unsupported below)
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    # refuse-don't-mis-decode (module contract): scan components are
    # paired with SOF components POSITIONALLY below, and the color
    # transform assumes YCbCr — a conforming foreign file with
    # reordered scan components or an Adobe RGB transform would decode
    # silently wrong without these guards
    if [c[0] for c in scan] != [c[0] for c in comps]:
        raise NotImplementedError("scan component order differs from SOF")
    if len(comps) == 3 and app14_transform == 0:
        raise NotImplementedError("Adobe APP14 RGB color transform")

    # entropy-coded segment: up to EOI, 0xFF00 unstuffed
    end = b.rfind(b"\xFF\xD9")
    raw = b[pos:end if end > pos else len(b)]
    # restart markers are FF D0-D7 in the RAW stream (before
    # unstuffing — after it, a data byte can follow a real FF)
    if any(m in raw for m in (b"\xFF\xD0", b"\xFF\xD1", b"\xFF\xD2",
                              b"\xFF\xD3", b"\xFF\xD4", b"\xFF\xD5",
                              b"\xFF\xD6", b"\xFF\xD7")):
        raise NotImplementedError("restart markers")
    br = _BitReader(raw.replace(b"\xFF\x00", b"\xFF"))

    n_mcu = ((h + 7) // 8) * ((w + 7) // 8)
    coefs = [np.zeros((n_mcu, 64), np.int32) for _ in comps]
    pred = [0] * len(comps)
    for n in range(n_mcu):
        for ci, (cid, td, ta) in enumerate(scan):
            dlut, alut = huff[td], huff[0x10 | ta]
            e = int(dlut[br.peek16()])
            if e < 0:
                raise ValueError("invalid DC code")
            br.skip(e & 31)
            s = e >> 5
            v = br.get(s)
            if s and v < (1 << (s - 1)):
                v -= (1 << s) - 1
            pred[ci] += v
            zz = coefs[ci][n]
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                e = int(alut[br.peek16()])
                if e < 0:
                    raise ValueError("invalid AC code")
                br.skip(e & 31)
                sym = e >> 5
                if sym == 0x00:          # EOB
                    break
                if sym == 0xF0:          # ZRL
                    k += 16
                    continue
                k += sym >> 4
                s = sym & 15
                if s == 0:  # run>0 with SSSS=0 is undefined in baseline
                    raise ValueError("invalid AC symbol (SSSS=0)")
                v = br.get(s)
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                if k > 63:
                    raise ValueError("AC index out of range")
                zz[k] = v
                k += 1

    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = []
    for (cid, tq), zzs in zip(comps, coefs):
        dz = np.zeros((n_mcu, 64), np.int32)
        dz[:, ZIGZAG] = zzs              # de-zigzag
        blk = dz.reshape(-1, 8, 8) * qt[tq].reshape(8, 8)
        sp = np.einsum("ji,njk,kl->nil", _C, blk.astype(np.float64), _C)
        p = (sp + 128.0).reshape(H // 8, W // 8, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(H, W)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        yy = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([yy, yy, yy], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    bl = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0,
                   255).astype(np.uint8)
