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
                        seed: int = 42, id_col: str | None = None) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a driver-side
    sample (the IVF index of FAISS-style ANN).

    The sample is the sample_rows rows with the SMALLEST xxhash64 — a
    uniform deterministic draw across every partition (TakeOrdered:
    O(sample) memory per partition, tiny shuffle).  A limit() here would
    read only the first partition(s), and with host-clustered
    partitioning the quantizer would train on one shard's distribution
    (skewed centroids -> skewed inverted lists)."""
    h = F.xxhash64(F.col(id_col)) if id_col else F.xxhash64(F.col(vec_col))
    cols = [id_col, vec_col] if id_col else [vec_col]
    sample = (df.select(*cols).withColumn("__h", h)
              .orderBy("__h").limit(sample_rows)
              .select(vec_col).collect())
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


def cosine_near_dup_lsh(df: DataFrame, id_col: str, vec_col: str,
                        threshold_ppm: int = 950000, n_planes: int = 8,
                        n_tables: int = 24, seed: int = 42,
                        bucket_cap: int = 1024) -> DataFrame:
    """All-pairs cosine near-dup WITHOUT the all-pairs join: multi-table
    random-hyperplane LSH generates candidates (docs sharing a (table,
    bucket) key), then an exact JVM-side cosine verifies them.

    Recall: a pair at cos=0.95 collides per table w.p. (1-acos(.95)/pi)^8
    ~= 0.43, so 24 tables miss it w.p. 0.57^24 ~= 2e-6; precision is
    exact (verify recomputes cosine).  Scale: the banded self-join is the
    only large shuffle and its keys are uniform hyperplane buckets; at
    larger corpora raise n_planes (~log2(N/64)) and n_tables together so
    per-bucket occupancy and recall both hold.  The verify stage
    broadcasts only the id-pair list; embeddings are never shuffled.

    `bucket_cap` drops (table, bucket) groups holding more vectors than
    the cap — the same guard as minhash's bucket_cap: without it a
    corpus dense with near-identical embeddings (exactly the dedup use
    case) makes one join group quadratic.  Byte-identical embeddings
    beyond the cap collide in EVERY table and should be collapsed by
    exact dedup first (they are exact dups — a hash groupBy, far
    cheaper); the LSH pass then handles the non-identical remainder.

    Returns (v1, v2) with floor(cos * 1e6) >= threshold_ppm, v1 < v2.
    """
    from ..functions import cosine_similarity

    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pows = (1 << np.arange(n_planes, dtype=np.uint64))

    def band_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = _mat(pdf[vec_col])
            # (B, T, P) sign bits -> (B, T) bucket ids
            bits = (np.einsum("bd,tpd->btp", m, planes) > 0).astype(np.uint64)
            buckets = (bits @ pows).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            n, t = buckets.shape
            yield pd.DataFrame({
                id_col: np.repeat(ids, t),
                "table": np.tile(np.arange(t, dtype=np.int32), n),
                "bucket": buckets.ravel(),
            })

    banded = df.select(id_col, vec_col).mapInPandas(
        band_fn, f"{id_col} long, table int, bucket long")
    if bucket_cap:
        small = (banded.groupBy("table", "bucket")
                 .agg(F.count("*").alias("sz"))
                 .where(F.col("sz") <= bucket_cap)
                 .select("table", "bucket"))
        banded = banded.join(small, ["table", "bucket"])
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, on=["table", "bucket"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("v1"),
                    F.col(f"b.{id_col}").alias("v2"))
            .distinct())

    e1 = df.select(F.col(id_col).alias("v1"),
                   F.col(vec_col).cast("array<double>").alias("e1"))
    e2 = df.select(F.col(id_col).alias("v2"),
                   F.col(vec_col).cast("array<double>").alias("e2"))
    s1 = e1.join(F.broadcast(cand), "v1")
    s2 = e2.join(F.broadcast(cand), "v2")
    pairs = s1.join(s2, ["v1", "v2"])
    sim = cosine_similarity(F.col("e1"), F.col("e2"))
    return (pairs.where(F.floor(sim * 1000000.0) >= threshold_ppm)
            .select("v1", "v2"))


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
