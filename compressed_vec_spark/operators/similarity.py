"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: one matrix multiply per
Arrow batch (numpy BLAS), partial top-k per partition, global top-k at
the driver — O(n·d) flops, no shuffle of the embeddings themselves.
The scale path is LSH bucketing (random hyperplanes): vectors shuffle
once by bucket key; queries probe only their bucket — the same
band-join pattern as MinHash dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mat(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query_vec: np.ndarray, k: int = 10,
                exclude_ids: tuple = ()) -> DataFrame:
    """Exact brute-force cosine top-k: per-batch matmul + partial top-k,
    then a tiny global re-rank (k rows per partition reach the driver)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = _mat(pdf[vec_col])
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ qn) / np.where(norms == 0, 1.0, norms)
            ids = pdf[id_col].to_numpy()
            mask = ~np.isin(ids, exclude_ids)
            sims, ids = sims[mask], ids[mask]
            # tie-break by id INSIDE the partial cut too, so the
            # partition-local top-k agrees with the global
            # ORDER BY sim DESC, id when equal sims straddle the cut
            top = np.lexsort((ids, -sims))[:k]
            yield pd.DataFrame({id_col: ids[top], "sim": sims[top]})

    partial = df.select(id_col, vec_col).mapInPandas(fn, f"{id_col} long, sim double")
    return (partial.orderBy(F.desc("sim"), F.asc(id_col)).limit(k))


def train_ivf_centroids(df: DataFrame, vec_col: str, n_centroids: int = 16,
                        iters: int = 10, sample_rows: int = 4096,
                        seed: int = 42) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a driver-side
    sample (the IVF index of FAISS-style ANN).  At 10^12 rows the sample
    is a bounded limit() — training cost is constant."""
    sample = df.select(vec_col).limit(sample_rows).collect()
    m = np.stack([np.array(r[vec_col], dtype=np.float64) for r in sample])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def ivf_topk(df: DataFrame, id_col: str, vec_col: str,
             centroids: np.ndarray, query_vec: np.ndarray, k: int = 10,
             nprobe: int = 4, exclude_ids: tuple = ()) -> DataFrame:
    """IVF ANN: assign every vector to its nearest centroid (one
    vectorized matmul per batch), probe only the nprobe lists nearest to
    the query.  One bucketing pass, then brute-force within ~nprobe/C of
    the data — the classic inverted-file scale path."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = set(np.argsort(-(centroids @ qn))[:nprobe].tolist())

    def probe_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = _mat(pdf[vec_col])
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            assign = np.argmax((m / norms) @ centroids.T, axis=1)
            sel = np.isin(assign, list(probe))
            yield pdf[[id_col, vec_col]][sel]

    candidates = df.select(id_col, vec_col).mapInPandas(
        probe_fn, df.select(id_col, vec_col).schema)
    return cosine_topk(candidates, id_col, vec_col, query_vec, k, exclude_ids)


def lsh_bucket_topk(df: DataFrame, id_col: str, vec_col: str,
                    query_vec: np.ndarray, k: int = 10, n_planes: int = 12,
                    seed: int = 42, exclude_ids: tuple = ()) -> DataFrame:
    """ANN: random-hyperplane LSH — probe only the query's bucket.
    At 10^12 rows the bucketing is a one-time shuffle; a probe touches
    ~n/2^n_planes vectors.  Recall < 1 by construction (report as ANN)."""
    rng = np.random.default_rng(seed)
    dim = len(query_vec)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int((planes @ q > 0).astype(np.uint64)
                   @ (1 << np.arange(n_planes, dtype=np.uint64)))

    def bucket_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = _mat(pdf[vec_col])
            bits = (m @ planes.T > 0).astype(np.uint64)
            buckets = bits @ (1 << np.arange(n_planes, dtype=np.uint64))
            sel = buckets == q_bucket
            yield pdf[[id_col, vec_col]][sel]

    candidates = df.select(id_col, vec_col).mapInPandas(
        bucket_fn, df.select(id_col, vec_col).schema)
    return cosine_topk(candidates, id_col, vec_col, query_vec, k, exclude_ids)
