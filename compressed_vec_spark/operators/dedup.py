"""Deduplication operators for large-scale training-data pipelines.

Exact dedup is a plain hash-groupBy (map-side combine, one narrow
shuffle of (hash, count)).  Near-dup is MinHash + LSH: shingle ->
minhash signature (vectorized numpy inside a pandas UDF) -> band-bucket
join -> exact-Jaccard verification of candidates only.  At 10^12 docs
the band join is the only shuffle and its key space (band_idx, band
hash) is uniform by construction — no skew handling needed beyond AQE.

SimHash gives a complementary near-dup signal: 64-bit signatures whose
Hamming distance bounds cosine similarity of token sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs.fsst import _string_buffers

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(texts: pa.Array, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """k-byte shingle hashes for every doc, vectorized over the whole
    batch.  Returns (hashes int64 flat, doc boundaries int64)."""
    data, offsets = _string_buffers(texts)
    n_sh = np.maximum(np.diff(offsets) - (k - 1), 1)
    # polynomial rolling hash over k bytes at every position
    h = np.zeros(max(len(data) - (k - 1), 0), dtype=np.uint64)
    for j in range(k):
        h = h * np.uint64(1099511628211) + data[j:len(data) - (k - 1) + j]
    # positions crossing doc boundaries are clipped per-doc below
    starts = offsets[:-1]
    idx = np.repeat(starts, n_sh) + _within_counts(n_sh)
    idx = np.minimum(idx, max(len(h) - 1, 0))
    return h[idx] if len(h) else np.zeros(int(n_sh.sum()), np.uint64), \
        np.concatenate(([0], np.cumsum(n_sh)))


def _within_counts(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def minhash_signatures(texts: pa.Array, n_hashes: int = 128, k: int = 5,
                       seed: int = 42) -> np.ndarray:
    """(n_docs, n_hashes) uint64 MinHash signatures, one reduceat per
    hash function — no per-row Python."""
    hashes, bounds = _shingle_hashes(texts, k)
    n_docs = len(bounds) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
    out = np.empty((n_docs, n_hashes), dtype=np.uint64)
    starts = bounds[:-1]
    hv = hashes % np.uint64(_MERSENNE)
    for i in range(n_hashes):
        perm = (a[i] * hv + b[i]) % np.uint64(_MERSENNE)
        out[:, i] = np.minimum.reduceat(perm, starts) if len(perm) else 0
    return out


def band_hashes(sigs: np.ndarray, rows_per_band: int = 2) -> np.ndarray:
    """(n_docs, n_bands) int64 LSH bucket keys."""
    n_docs, n_hashes = sigs.shape
    n_bands = n_hashes // rows_per_band
    bands = sigs[:, : n_bands * rows_per_band].reshape(n_docs, n_bands, rows_per_band)
    h = np.zeros((n_docs, n_bands), dtype=np.uint64)
    for j in range(rows_per_band):
        h = h * np.uint64(0x9E3779B97F4A7C15) + bands[:, :, j]
    return (h >> np.uint64(1)).astype(np.int64)  # non-negative


def exact_jaccard_pairs(texts_by_id: dict[int, str], pairs: list[tuple[int, int]],
                        k: int = 5) -> list[tuple[int, int, float]]:
    """Exact k-shingle Jaccard for candidate pairs (verification step —
    candidates only, never all-pairs)."""
    cache: dict[int, np.ndarray] = {}

    def shingles(doc_id: int) -> np.ndarray:
        if doc_id not in cache:
            t = texts_by_id[doc_id]
            arr = pa.array([t], type=pa.large_utf8())
            h, _ = _shingle_hashes(arr, k)
            cache[doc_id] = np.unique(h)
        return cache[doc_id]

    out = []
    for d1, d2 in pairs:
        s1, s2 = shingles(d1), shingles(d2)
        inter = len(np.intersect1d(s1, s2, assume_unique=True))
        union = len(s1) + len(s2) - inter
        out.append((d1, d2, inter / union if union else 1.0))
    return out


def minhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.7, n_hashes: int = 128,
                      rows_per_band: int = 2, k: int = 5) -> DataFrame:
    """Full near-dup pipeline: signatures -> band explode -> bucket join
    -> exact-Jaccard verify.  Returns (d1, d2) pairs with exact Jaccard
    >= threshold (d1 < d2)."""
    n_bands = n_hashes // rows_per_band

    def sig_fn(batches):
        for pdf in batches:
            texts = pa.array(pdf[text_col].fillna(""), type=pa.large_utf8())
            sigs = minhash_signatures(texts, n_hashes, k)
            bh = band_hashes(sigs, rows_per_band)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                "band": np.tile(np.arange(n_bands), len(pdf)),
                "bucket": bh.ravel(),
            })

    banded = df.select(id_col, text_col).mapInPandas(
        sig_fn, f"{id_col} long, band int, bucket long")

    # candidate pairs: docs sharing any (band, bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, on=["band", "bucket"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("d1"),
                    F.col(f"b.{id_col}").alias("d2"))
            .distinct())

    # verify candidates with exact Jaccard, distributed: attach both
    # texts via two broadcast-able joins (candidates are rare vs the
    # corpus), then per-pair numpy shingle-set intersection
    t1 = df.select(F.col(id_col).alias("d1"), F.col(text_col).alias("t1"))
    t2 = df.select(F.col(id_col).alias("d2"), F.col(text_col).alias("t2"))
    withtext = cand.join(t1, "d1").join(t2, "d2")

    def verify_fn(batches):
        for pdf in batches:
            keep1, keep2 = [], []
            for d1, d2, a_txt, b_txt in zip(pdf["d1"], pdf["d2"], pdf["t1"], pdf["t2"]):
                texts = {0: a_txt or "", 1: b_txt or ""}
                (_, _, j), = exact_jaccard_pairs(texts, [(0, 1)], k)
                if j >= threshold:
                    keep1.append(int(d1))
                    keep2.append(int(d2))
            yield pd.DataFrame({"d1": pd.Series(keep1, dtype="int64"),
                                "d2": pd.Series(keep2, dtype="int64")})

    return withtext.mapInPandas(verify_fn, "d1 long, d2 long")


def simhash64(texts: pa.Array, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, vectorized."""
    data, offsets = _string_buffers(texts)
    # token splitting on spaces, vectorized: hash words via cumulative
    # per-doc segmentation.  Simpler: 4-byte shingles stand in as the
    # token features (robust, language-free).
    h, bounds = _shingle_hashes(texts, k=4)
    n_docs = len(bounds) - 1
    sig = np.zeros((n_docs, 64), dtype=np.int64)
    starts = bounds[:-1]
    for bit in range(64):
        bits = ((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        sig[:, bit] = np.add.reduceat(bits, starts) if len(bits) else 0
    out = np.zeros(n_docs, dtype=np.uint64)
    for bit in range(64):
        out |= (sig[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
    return out
