"""Deterministic synthetic Common-Crawl-style web-page table.

BASELINE.json input_hint: (url string, warc_ts timestamp, html binary,
text string, lang string).  Everything is derived from the row id via a
splitmix64 hash chain, so the table is identical for a given (n, seed)
regardless of partitioning/parallelism — required for resume tests and
for the two-parallelism scaling benchmark to run the SAME input.

Host popularity follows a Zipf-ish power law (domain skew, exercising
the salted repartitioning); warc_ts is mostly-increasing epoch-µs with
repeats (exercising RLE/FoR); lang is 20 values with 'en' ~60%
(exercising dict + Constant sections); html wraps text deterministically
(so html↔text stays checkable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = np.array([
    "en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "sv", "cs", "el", "he", "th", "vi",
])
# ~60% en, rest geometric-ish
_LANG_CUM = np.cumsum(np.array([0.60, 0.08, 0.06, 0.05, 0.04, 0.03, 0.025, 0.02,
                                0.015, 0.013, 0.011, 0.009, 0.008, 0.007, 0.006,
                                0.005, 0.004, 0.004, 0.003, 0.01]))

_VOCAB = np.array((
    "the of and to in a is that for it with as on be at by this from or an "
    "are was but not you all they we when your can said there use each which "
    "she how their if will up other about out many then them these so some her "
    "would make like him into time has look two more write go see number way "
    "could people my than first water been call who oil its now find long down "
    "day did get come made may part crawl web page data index content server "
    "http html link site archive record warc header fetch parse token stream"
).split())

_TS_BASE_US = 1_700_000_000_000_000  # 2023-11-14, epoch µs


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    mix = (stream * 0x9E3779B97F4A7C15 + seed * 0xD1B54A32D192ED03) & 0xFFFFFFFFFFFFFFFF
    return _splitmix64(ids.astype(np.uint64) ^ np.uint64(mix))


def _uniform(ids, stream, seed):
    return (_hash(ids, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def gen_batch(ids: np.ndarray, seed: int = 42, n_hosts: int | None = None) -> pd.DataFrame:
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    n_hosts = n_hosts or max(64, n // 100)

    # Zipf(s~1.2) host ranks via inverse-CDF power law
    u = np.clip(_uniform(ids, 1, seed), 1e-12, 1.0)
    rank = np.minimum((u ** -1.2).astype(np.int64), n_hosts)
    host = np.char.add(np.char.add("site-", rank.astype("U12")), ".example.com")
    hex_chars = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    h2 = _hash(ids, 2, seed)
    nibs = np.stack([(h2 >> np.uint64(4 * (9 - i))).astype(np.uint64) & np.uint64(0xF)
                     for i in range(10)], axis=1).astype(np.int64)
    slug = hex_chars[nibs].view("S10").ravel().astype("U10")
    url = np.char.add(np.char.add(np.char.add("https://", host), "/page/"), slug)

    # mostly-increasing µs timestamps with repeats (runs of ~3)
    ts_us = _TS_BASE_US + (ids // 3) * 1000 + (_hash(ids, 3, seed) % np.uint64(3)).astype(np.int64)
    warc_ts = pd.to_datetime(ts_us, unit="us")

    lang = LANGS[np.searchsorted(_LANG_CUM, _uniform(ids, 4, seed))]

    # lognormal-ish token counts -> text from skewed vocab
    tok_n = np.clip(np.exp(4.0 + 1.0 * (_uniform(ids, 5, seed) * 2 - 1)), 30, 800).astype(np.int64)
    total = int(tok_n.sum())
    owner = np.repeat(ids, tok_n)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(tok_n)[:-1])), tok_n)
    tok_hash = _splitmix64(owner.astype(np.uint64) * np.uint64(1000003) + pos.astype(np.uint64)
                           + np.uint64(seed))
    # skew token choice toward the head of the vocab
    tv = ((tok_hash % np.uint64(len(_VOCAB) ** 2)).astype(np.float64)
          / len(_VOCAB) ** 2) ** 2
    tokens = _VOCAB[(tv * len(_VOCAB)).astype(np.int64)]
    joined = pd.Series(tokens).groupby(pd.Series(owner).values, sort=False).agg(" ".join)
    text = joined.reindex(ids).to_numpy(dtype=object)

    html = np.array([f"<!DOCTYPE html><html><body><p>{t}</p></body></html>".encode()
                     for t in text], dtype=object)

    return pd.DataFrame({
        "url": url, "warc_ts": warc_ts, "html": html,
        "text": text, "lang": lang,
    })


SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def webpages(spark: SparkSession, n: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInPandas."""
    n_hosts = max(64, n // 100)

    def gen(batches):
        for pdf in batches:
            yield gen_batch(pdf["id"].to_numpy(), seed=seed, n_hosts=n_hosts)

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=SCHEMA)
