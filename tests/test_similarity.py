"""Similarity-search operator tests: exact brute-force baseline, the
LSH and IVF approximate scale paths, and dedup signature operators."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from compressed_vec_spark.operators import dedup, similarity
from compressed_vec_spark.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("cvx-sim-tests", cores=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def qvec(emb):
    return np.array(emb.where(F.col("vec_id") == 0)
                    .select("embedding").first()[0], dtype=np.float64)


def test_bruteforce_topk_matches_numpy(emb):
    q = qvec(emb)
    got = [r["vec_id"] for r in
           similarity.cosine_topk(emb, "vec_id", "embedding", q, k=10,
                                  exclude_ids=(0,)).collect()]
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    sims = (m @ (q / np.linalg.norm(q))) / np.linalg.norm(m, axis=1)
    order = np.lexsort((ids, -sims))
    expected = [int(i) for i in ids[order] if i != 0][:10]
    assert got == expected


def test_ivf_recall(emb):
    q = qvec(emb)
    cents = similarity.train_ivf_centroids(emb, "embedding", n_centroids=16)
    assert cents.shape[1] == 64
    # deterministic training
    again = similarity.train_ivf_centroids(emb, "embedding", n_centroids=16)
    assert (cents == again).all()
    exact = {r["vec_id"] for r in
             similarity.cosine_topk(emb, "vec_id", "embedding", q, 10, (0,)).collect()}
    approx = {r["vec_id"] for r in
              similarity.ivf_topk(emb, "vec_id", "embedding", cents, q, 10,
                                  nprobe=6, exclude_ids=(0,)).collect()}
    assert len(approx & exact) / 10 >= 0.5  # ANN recall floor


def test_lsh_topk_returns_subset_of_corpus(emb):
    q = qvec(emb)
    rows = similarity.lsh_bucket_topk(emb, "vec_id", "embedding", q, k=10,
                                      n_planes=6, exclude_ids=(0,)).collect()
    assert 0 < len(rows) <= 10
    assert all(r["sim"] <= 1.000001 for r in rows)


def test_simhash_near_duplicates_close():
    texts = ["the quick brown fox jumps over the lazy dog " * 5,
             "the quick brown fox jumps over the lazy dogs " * 5,  # near-dup
             "completely different content about spark and parquet " * 5]
    sigs = dedup.simhash64(pa.array(texts, type=pa.large_utf8()))
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])
    assert ham(sigs[0], sigs[1]) < 16


def test_minhash_signature_jaccard_estimate():
    a = "web crawl data pipeline compression engine " * 10
    b = "web crawl data pipeline compression engine " * 9 + "totally new suffix here "
    c = "unrelated text about gardening and cooking recipes " * 10
    sigs = dedup.minhash_signatures(pa.array([a, b, c], type=pa.large_utf8()))
    est_ab = (sigs[0] == sigs[1]).mean()
    est_ac = (sigs[0] == sigs[2]).mean()
    assert est_ab > 0.6 > est_ac
