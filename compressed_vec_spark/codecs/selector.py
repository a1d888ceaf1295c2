"""Codec-family auto-selection from sampled per-chunk statistics.

This generalizes the reference's per-section AutoEncoder (reference
src/section.rs:821-846, README.md:75-78 "Multi-pass encoding ... collects
min/max and other stats ... to decide on the best encoding strategy") one
level up, as the north rule requires: per column chunk, sampled
cardinality / run-length / entropy statistics pick the codec FAMILY
(dict vs FSST vs RLE vs sectioned FoR/NibblePack vectors); the section
codec choice within a vector stays stats-driven per 256-block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SAMPLE = 4096
DICT_MAX_CARD_FRAC = 0.1   # dict wins when distinct/sample is small
DICT_MAX_CARD_ABS = 1 << 16
RLE_MIN_AVG_RUN = 4.0


def stats_of(series: pd.Series, seed: int = 42) -> dict:
    """Deterministic sampled stats for codec choice."""
    n = len(series)
    if n > SAMPLE:
        # deterministic evenly-spaced sample (stable across runs/resume)
        idx = np.linspace(0, n - 1, SAMPLE).astype(np.int64)
        sample = series.iloc[idx]
    else:
        sample = series
    vals = sample.dropna()
    card = int(vals.nunique())
    out = {"n": n, "sample_n": len(sample), "cardinality": card}
    arr = vals.to_numpy()
    if len(arr) > 1 and arr.dtype.kind in "iuf":
        run_breaks = int((arr[1:] != arr[:-1]).sum())
        out["avg_run_len"] = len(arr) / max(run_breaks + 1, 1)
        out["sorted"] = bool(np.all(arr[1:] >= arr[:-1]))
    elif len(arr) > 1:
        run_breaks = int((arr[1:] != arr[:-1]).sum())
        out["avg_run_len"] = len(arr) / max(run_breaks + 1, 1)
        out["sorted"] = False
    else:
        out["avg_run_len"] = float(len(arr))
        out["sorted"] = True
    # byte entropy of a small sample (strings only) — cheap FSST-vs-dict signal
    if arr.dtype.kind in "OU" and len(arr):
        joined = "".join(map(str, arr[:64])).encode("utf-8", "ignore")[:8192]
        if joined:
            counts = np.bincount(np.frombuffer(joined, dtype=np.uint8), minlength=256)
            p = counts[counts > 0] / len(joined)
            out["byte_entropy"] = float(-(p * np.log2(p)).sum())
        else:
            out["byte_entropy"] = 0.0
    return out


def choose_codec(series: pd.Series, spark_type: str | None = None) -> tuple[str, dict]:
    """Returns (codec_name, stats).  Codec names:
    'dict' | 'fsst' | 'rle' | 'vec_u64' | 'vec_u32' | 'vec_f32' |
    'xor_f64' | 'binary_fsst'.
    """
    st = stats_of(series)
    kind = series.dtype.kind
    if kind == "O" or spark_type == "binary":
        nonnull = series.dropna()
        if len(nonnull) and isinstance(nonnull.iloc[0], (bytes, bytearray)):
            # text-like binary (html: printable, spacey) profits from the
            # word-symbol FSST front end (~5.6x vs deflate's ~3.6x on
            # html); truly opaque payloads keep the cheap entropy coder
            probe = bytes(nonnull.iloc[0])[:4096]
            if len(nonnull) > 1:
                probe += bytes(nonnull.iloc[len(nonnull) // 2])[:4096]
            if probe:
                b = np.frombuffer(probe, dtype=np.uint8)
                printable = float(((b >= 32) & (b < 127)).mean())
                spacey = float((b == 32).mean())
                st["printable_frac"] = printable
                st["space_frac"] = spacey
                if printable >= 0.9 and spacey >= 0.05:
                    return "binary_fsst", st
            return "deflate", st
    if kind in "OU" or spark_type == "string":
        frac = st["cardinality"] / max(st["sample_n"], 1)
        if st["cardinality"] <= DICT_MAX_CARD_ABS and frac <= DICT_MAX_CARD_FRAC:
            return "dict", st
        return "fsst", st
    if kind == "S" or spark_type == "binary":
        return "binary_fsst", st
    if kind in "iu" or kind == "M":
        if st.get("avg_run_len", 1.0) >= RLE_MIN_AVG_RUN:
            return "rle", st
        # u32 when the value range fits — halves Const/Delta-base widths
        arr = series.dropna().to_numpy()
        if kind == "M":
            return "rle" if st.get("avg_run_len", 1.0) >= RLE_MIN_AVG_RUN else "vec_u64", st
        if len(arr) and arr.min() >= 0 and arr.max() <= 0xFFFFFFFF:
            return "vec_u32", st
        return "vec_u64", st
    if kind == "f":
        if series.dtype == np.float32:
            return "vec_f32", st
        return "xor_f64", st
    return "fsst", st
