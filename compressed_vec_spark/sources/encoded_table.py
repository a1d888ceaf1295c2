"""Reader for encoded-chunk tables with manifest-stats chunk pruning.

The scale analog of the reference's section-skip short-circuits
(reference src/filter.rs:218-224 null-section skip, README.md:79-81):
per-chunk min/max recorded at encode time let a predicate skip whole
chunks before any blob is fetched or decoded — the same idea as Parquet
row-group stats, applied to our compressed vectors.  Catalyst pushes the
stats filter into the parquet scan of the manifest (PushedFilters), so a
selective predicate touches only the matching chunks' blobs.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codecs import chunk as chunk_codec
from ..operators import filters


_I64MAX = (1 << 63) - 1
_I64MIN = -(1 << 63)


def _overlap(*thunks):
    """Run independent read-only Spark actions concurrently and return
    their results in call order (guide §2.6: overlap independent jobs).
    Every pruned kernel pays a small metadata action (manifest stats /
    chunk counts) beside its main scan; they share no state, so running
    them from a thread pool turns sum-of-latencies into max — the same
    pattern the composite queries already use at the query level."""
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def _keep_mask_df(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """(chunk_id, keep_mask) DataFrame of OR-merged DELETE bitmasks for
    every delete-affected chunk; None for a store with no live deletes.

    The masks stay DISTRIBUTED: every pruned_* reader left-joins this on
    chunk_id into its chunk scan (mirroring the write path,
    spark/delete_job.py delete_rows), so each task sees only its own
    chunks' masks.  The earlier driver-collected dict put
    O(affected_chunks x rows/8) bytes on the driver and in every task
    closure — ~125 GB for a corpus-wide delete at 10^12 rows; the join
    is AQE-planned (broadcast when small, shuffle when wide) and has no
    driver ceiling.

    Chunks with no deletes keep their compressed fast path untouched
    (keep_mask is NULL after the left join); only affected chunks fall
    back to a positional decode ANDed with the keep mask.  Snapshot
    (as_of) reads skip the join by design — deletes apply to the
    current table only (spark/delete_job.py contract)."""
    from ..spark import delete_job
    m = delete_job.merged_masks(spark, out_dir, check_empty=False)
    if m is None:
        return None
    return m.select("chunk_id", F.col("mask").alias("keep_mask"))


def _join_keep(chunks_df: DataFrame, masks: DataFrame | None) -> DataFrame:
    """Attach the `keep_mask` column to a chunk scan: left join when the
    store has live deletes, a NULL literal otherwise (so kernels read
    one uniform column either way)."""
    if masks is None:
        return chunks_df.withColumn("keep_mask",
                                    F.lit(None).cast("binary"))
    return chunks_df.join(masks, "chunk_id", "left")


def _keep_bools(packed: bytes, n: int) -> np.ndarray:
    """Packed delete mask -> boolean KEEP vector of length n (the
    sidecar's single mask decoding, owned by delete_job so the two
    layers can never drift)."""
    from ..spark.delete_job import _keep_mask
    return _keep_mask(packed, n)


def _prune_counts(manifest: DataFrame, column: str, pred,
                  extra: dict | None = None) -> tuple[int, int, dict]:
    """(total_chunks, scanned_chunks, extra_counts) for one column's
    manifest rows in a SINGLE aggregate job — the separate
    `.count()` round-trips each kernel used to make are folded into
    one manifest pass.  `extra` maps name -> predicate column for any
    additional conditional counts the caller wants from the same pass
    (e.g. the bloom-probe survivor count)."""
    aggs = [F.count(F.lit(1)).alias("__t"),
            F.count(F.when(pred, 1)).alias("__s")]
    for name, p in (extra or {}).items():
        aggs.append(F.count(F.when(p, 1)).alias(name))
    row = manifest.where(F.col("column") == column).agg(*aggs).collect()[0]
    return (int(row["__t"]), int(row["__s"]),
            {k: int(row[k]) for k in (extra or {})})


def chunk_stats_for(series: pd.Series) \
        -> tuple[int | None, int | None, int | None, int]:
    """(min, max, sum, null_count) for numeric/timestamp chunks
    ((None, None, None, nulls) otherwise).  The sum enables manifest-only
    aggregation pushdown (`pruned_filtered_sum`): a chunk fully covered
    by the predicate contributes its manifest sum with zero blob reads —
    the storage-layer analog of the reference's header-only section
    short-circuits (reference src/filter.rs:53-107).  Sum is over
    non-null values (SQL SUM semantics); None if it exceeds int64."""
    nulls = int(series.isna().sum())
    if series.dtype.kind == "M":
        v = series.dropna().astype("datetime64[us]").to_numpy().view(np.int64)
    elif series.dtype.kind in "iu":
        v = series.dropna().to_numpy()
    else:
        return None, None, None, nulls
    if not len(v):
        return None, None, None, nulls
    # exact overflow-free sum: elements split into hi/lo 32-bit halves
    # (v == (v >> 32) * 2^32 + (v & 0xFFFFFFFF) for arithmetic shift),
    # each partial sum fits its 64-bit dtype for any chunk <= 2^31
    # elements; recombined in Python ints
    if v.dtype.kind == "u":
        vv = v.astype(np.uint64)
        total = (int((vv & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
                 + (int((vv >> np.uint64(32)).sum(dtype=np.uint64)) << 32))
    else:
        vv = v.astype(np.int64)
        total = (int((vv & 0xFFFFFFFF).sum(dtype=np.int64))
                 + (int((vv >> 32).sum(dtype=np.int64)) << 32))
    if not (_I64MIN <= total <= _I64MAX):
        total = None
    return int(v.min()), int(v.max()), total, nulls


def float_chunk_stats(series: pd.Series) -> tuple[float | None, float | None]:
    """(min, max) for FLOAT chunks, (None, None) otherwise — the
    manifest stats that make float range predicates prunable at the
    chunk level.  Nulls and NaN payloads are excluded (SQL comparison
    semantics: NaN matches no range predicate, so it cannot tighten or
    poison the bounds)."""
    if series.dtype.kind != "f":
        return None, None
    v = series.dropna().to_numpy(dtype=np.float64)
    v = v[~np.isnan(v)]
    if not len(v):
        return None, None
    return float(v.min()), float(v.max())


def pruned_float_range_count(spark: SparkSession, out_dir: str,
                             column: str, lo: float, hi: float) \
        -> tuple[int, dict]:
    """count(column BETWEEN lo AND hi) for a FLOAT column over the
    persisted store: manifest [min_f64, max_f64] interval-intersection
    pruning (a chunk whose range misses [lo, hi] is never read), then
    surviving chunks decode and compare.  XOR-packed float sections
    carry no per-section min/max (the XOR chain is order-dependent), so
    unlike the int path there is no second, section-level skip — the
    chunk-level prune is the whole win, which is why the store sorts on
    the column when float range queries matter."""
    from ..codecs import chunk as chunk_codec

    def kernel(blob: bytes, codec: str) -> tuple[int, bool]:
        v = np.asarray(chunk_codec.decode_column(blob), dtype=np.float64)
        # NaN (decoded nulls or payload NaN) compares False
        return int(((v >= lo) & (v <= hi)).sum()), False

    return _pruned_count_scan(
        spark, out_dir, column,
        (F.col("max_f64") >= lo) & (F.col("min_f64") <= hi), kernel,
        track_fallback=False,
        decode_pred=lambda s: ((np.asarray(s, dtype=np.float64) >= lo)
                               & (np.asarray(s, dtype=np.float64) <= hi)))


def pruned_equals_count(spark: SparkSession, out_dir: str, column: str,
                        value: int) -> tuple[int, dict]:
    """count(column == value) over an encoded table: manifest [min,max]
    stats prune chunks, and surviving chunks answer on the COMPRESSED
    bytes — EqualsSink section masks for vec codecs (Null/Const
    sections from their headers), run-level counting for RLE chunks —
    decoding only when the compressed domain can't answer (zigzag,
    delete-affected chunks, a 0-probe against a nullable chunk whose
    null placeholders ride as payload zeros).  Returns (count, stats
    on chunks pruned / answered compressed / decoded)."""
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    zone_pred = (F.col("min_val") <= value) & (F.col("max_val") >= value)
    # the candidate ids stay distributed: a broadcast join prunes the
    # chunk scan instead of collecting ids into a driver-side isin()
    # (which would put millions of literals in the plan at scale)
    cand_ids = (manifest.where((F.col("column") == column) & zone_pred)
                .select("chunk_id"))

    chunks = _join_keep(
        (spark.read.parquet(os.path.join(out_dir, "chunks"))
         .where(F.col("column") == column)
         .join(F.broadcast(cand_ids), "chunk_id")),
        _keep_mask_df(spark, out_dir))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs import rle as rle_codec
        n = fast = dec = 0
        for pdf in batches:
            for blob, codec, km in zip(pdf["blob"], pdf["codec"],
                                       pdf["keep_mask"]):
                km = None if km is None else bytes(km)
                b = bytes(blob)
                nulm = b[:4] == b"NULM"
                if (km is not None
                        or codec not in ("vec_u64", "vec_u32", "rle")
                        or (nulm and value == 0)):
                    # decode_column without a target dtype yields int
                    # carriers for every numeric codec (timestamps as
                    # raw epoch-µs uint64), so one int compare covers
                    # all of them
                    s = pd.Series(chunk_codec.decode_column(b))
                    m = (s == value).fillna(False).to_numpy(dtype=bool)
                    if km is not None:
                        m &= _keep_bools(km, len(s))
                    n += int(m.sum())
                    dec += 1
                    continue
                # value != 0 here whenever nulls exist, so null
                # placeholders (zeros) can never be counted as hits
                fast += 1
                if codec == "rle":
                    n += rle_codec.count_in_range(_unwrap_vec(b),
                                                  value, value)
                    continue
                kind = "u64" if codec == "vec_u64" else "u32"
                n += filters.count_hits(filters.equals_mask(
                    _unwrap_vec(b), kind, value))
        yield pd.DataFrame({"hits": [n], "fast": [fast], "dec": [dec]})

    # the prune accounting and the chunk scan share no state: overlap
    (total_chunks, scanned_chunks, _), agg = _overlap(
        lambda: _prune_counts(manifest, column, zone_pred),
        lambda: (chunks.select("blob", "codec", "keep_mask")
                 .mapInPandas(fn, "hits long, fast long, dec long")
                 .agg(F.sum("hits").alias("h"), F.sum("fast").alias("f"),
                      F.sum("dec").alias("d")).collect()[0]))
    return int(agg["h"] or 0), {
        "total_chunks": total_chunks,
        "scanned_chunks": scanned_chunks,
        "pruned_chunks": total_chunks - scanned_chunks,
        "compressed_kernel_chunks": int(agg["f"] or 0),
        "decoded_chunks": int(agg["d"] or 0),
    }


def pruned_range_count(spark: SparkSession, out_dir: str, column: str,
                       lo: int, hi: int,
                       as_of: str | None = None) -> tuple[int, dict]:
    """count(lo <= column <= hi) over an encoded table with BOTH prune
    levels the format provides: manifest [min,max] stats skip whole
    chunks (broadcast-joined, like pruned_equals_count), and inside each
    surviving chunk `filters.range_mask` skips Null/Const/Delta sections
    straight from their headers — the filter runs on the compressed
    bytes, the column is never materialized.

    `as_of` composes this with snapshot reads (sources/snapshot.py):
    the part_id cutoff filters BOTH the manifest and the chunks scan,
    so the count runs against the table as of that append batch with
    the identical pushdown machinery — post-snapshot chunk files are
    partition-pruned away, never listed."""
    from .. import vector as vec_mod

    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    chunks_src = spark.read.parquet(os.path.join(out_dir, "chunks"))
    if as_of is not None:
        from .snapshot import _snapshot_bounds
        cutoff = _snapshot_bounds(spark, out_dir, as_of)["part_hi"]
        manifest = manifest.where(F.col("part_id") < cutoff)
        chunks_src = chunks_src.where(F.col("part_id") < cutoff)
    zone_pred = (F.col("min_val") <= hi) & (F.col("max_val") >= lo)
    cand_ids = (manifest.where((F.col("column") == column) & zone_pred)
                .select("chunk_id"))

    # snapshot reads predate deletes by contract (delete_job docstring);
    # current-table reads subtract them via the distributed mask join
    chunks = _join_keep(
        (chunks_src
         .where(F.col("column") == column)
         .join(F.broadcast(cand_ids), "chunk_id")),
        None if as_of is not None else _keep_mask_df(spark, out_dir))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs import rle as rle_codec
        hits = skipped = sections = 0
        for pdf in batches:
            for blob, codec, km in zip(pdf["blob"], pdf["codec"],
                                       pdf["keep_mask"]):
                km = None if km is None else bytes(km)
                nulm = bytes(blob[:4]) == b"NULM"
                if km is not None or codec not in (
                        "vec_u64", "vec_u32", "rle"):
                    # delete-affected chunks (section counts can't be
                    # masked) and codecs with no order-preserving
                    # compressed domain (zigzag interleaves negatives):
                    # decode positionally — never silently dropped
                    s = pd.Series(chunk_codec.decode_column(bytes(blob)))
                    m = ((s >= lo) & (s <= hi)).fillna(False) \
                        .to_numpy(dtype=bool)
                    if km is not None:
                        m &= _keep_bools(km, len(s))
                    hits += int(m.sum())
                    continue
                if codec == "rle":
                    if nulm and lo <= 0 <= hi:
                        # nulls ride as run zeros; a 0-admitting range
                        # would count them — decode restores NULL
                        s = pd.Series(chunk_codec.decode_column(bytes(blob)))
                        hits += int(((s >= lo) & (s <= hi))
                                    .fillna(False).sum())
                        continue
                    # run-level count: R runs touched, never n rows —
                    # the natural fast path of a clustered/sorted store
                    hits += rle_codec.count_in_range(
                        _unwrap_vec(blob), lo, hi)
                    continue
                kind = "u64" if codec == "vec_u64" else "u32"
                b = bytes(blob)
                null_hits = 0
                if b[:4] == b"NULM":  # null-mask wrapper: nulls ride the
                    n = int.from_bytes(b[4:8], "little")  # payload as 0s
                    nbytes = (n + 7) // 8
                    if lo <= 0 <= hi:
                        # a range admitting 0 counts every null's zero
                        # placeholder exactly once — subtract them (SQL:
                        # NULL never matches); real zeros stay counted
                        null_hits = int(np.unpackbits(
                            np.frombuffer(b[8:8 + nbytes], np.uint8),
                            count=n).sum())
                    b = b[8 + nbytes:]
                payload = b[4:]  # strip the chunk codec tag
                masks, st = filters.range_mask(payload, kind, lo, hi,
                                               return_stats=True)
                hits += filters.count_hits(masks) - null_hits
                skipped += st["skipped_without_decode"]
                sections += st["sections"]
        yield pd.DataFrame({"hits": [hits], "skipped": [skipped],
                            "sections": [sections]})

    # prune accounting overlapped with the chunk scan (independent jobs)
    (total_chunks, scanned_chunks, _), agg = _overlap(
        lambda: _prune_counts(manifest, column, zone_pred),
        lambda: (chunks.select("blob", "codec", "keep_mask").mapInPandas(
            fn, "hits long, skipped long, sections long")
            .agg(F.sum("hits").alias("h"), F.sum("skipped").alias("sk"),
                 F.sum("sections").alias("se")).collect()[0]))
    return int(agg["h"] or 0), {
        "total_chunks": total_chunks,
        "scanned_chunks": scanned_chunks,
        "pruned_chunks": total_chunks - scanned_chunks,
        "sections_skipped_without_decode": int(agg["sk"] or 0),
        "sections_total": int(agg["se"] or 0),
    }


def _pruned_count_scan(spark: SparkSession, out_dir: str, column: str,
                       manifest_pred, chunk_fn,
                       track_fallback: bool = True,
                       bloom_value: str | list[str] | None = None,
                       decode_pred=None) -> tuple[int, dict]:
    """Shared skeleton of every chunk-pruned count over the store:
    manifest-stat prune -> broadcast surviving chunk ids -> per-chunk
    kernel inside mapInPandas -> one-row aggregate.  `chunk_fn(blob,
    codec) -> (hits, used_fast_path)` supplies the predicate-specific
    kernel; everything else (the prune accounting, the join shape, the
    stats dict) is identical across predicate shapes by construction.

    `bloom_value` (equality/IN probes only; a str or a list of str)
    adds a second prune level AFTER the zone maps: chunks whose
    manifest Bloom filter proves every probed value absent are dropped
    before any blob read — the level that matters when the store isn't
    sorted on the probed column and every chunk's [min_str, max_str]
    admits the value (codecs/bloom.py).  Stores older than format v5
    have no bloom column; the probe then degrades to zone-map pruning
    alone (bloom_pruned_chunks = 0).

    `decode_pred(series) -> bool ndarray` (positional, null-safe) is
    the predicate's decoded form, used ONLY for delete-affected chunks:
    their rows must be ANDed with the keep mask, so the compressed
    kernel (whose counts cannot be masked) is bypassed for exactly
    those chunks."""
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    candidates = manifest.where((F.col("column") == column) & manifest_pred)
    if bloom_value is not None and "bloom" in manifest.columns:
        import pyarrow as pa
        from ..codecs import bloom as bloom_codec
        probe_vals = ([bloom_value] if isinstance(bloom_value, str)
                      else list(bloom_value))
        hashes = bloom_codec.hash_values(
            pa.array(probe_vals, type=pa.large_utf8()))

        @F.pandas_udf("boolean")
        def _probe(blooms: pd.Series) -> pd.Series:
            return pd.Series([bool(bloom_codec.contains_many(
                bytes(b) if b is not None else None, hashes).any())
                for b in blooms])

        # total / zone-survivor / bloom-survivor counts in ONE pass
        prune_thunk = lambda: _prune_counts(  # noqa: E731
            manifest, column, manifest_pred,
            extra={"__b": manifest_pred & _probe(F.col("bloom"))})
        candidates = candidates.where(_probe(F.col("bloom")))
    else:
        prune_thunk = lambda: _prune_counts(  # noqa: E731
            manifest, column, manifest_pred)
    cand_ids = candidates.select("chunk_id")

    chunks = _join_keep(
        (spark.read.parquet(os.path.join(out_dir, "chunks"))
         .where(F.col("column") == column)
         .join(F.broadcast(cand_ids), "chunk_id")),
        _keep_mask_df(spark, out_dir))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hits = fast = decoded = 0
        for pdf in batches:
            for blob, codec, km in zip(pdf["blob"], pdf["codec"],
                                       pdf["keep_mask"]):
                km = None if km is None else bytes(km)
                if km is not None:
                    if decode_pred is None:
                        raise ValueError(
                            "store has live position deletes but this "
                            "reader supplied no decoded predicate form")
                    s = pd.Series(chunk_codec.decode_column(bytes(blob)))
                    m = np.asarray(decode_pred(s), dtype=bool)
                    m &= _keep_bools(km, len(s))
                    hits += int(m.sum())
                    decoded += 1
                    continue
                h, was_fast = chunk_fn(bytes(blob), codec)
                hits += h
                if was_fast:
                    fast += 1
                else:
                    decoded += 1
        yield pd.DataFrame({"hits": [hits], "fast": [fast], "dec": [decoded]})

    # prune accounting overlapped with the chunk scan (independent jobs)
    (total_chunks, zone_survivors, ex), agg = _overlap(
        prune_thunk,
        lambda: (chunks.select("blob", "codec", "keep_mask")
                 .mapInPandas(fn, "hits long, fast long, dec long")
                 .agg(F.sum("hits").alias("h"), F.sum("fast").alias("f"),
                      F.sum("dec").alias("d")).collect()[0]))
    scanned_chunks = ex["__b"] if "__b" in ex else zone_survivors
    stats = {
        "total_chunks": total_chunks,
        "scanned_chunks": scanned_chunks,
        "pruned_chunks": total_chunks - scanned_chunks,
    }
    if bloom_value is not None:
        stats["bloom_pruned_chunks"] = zone_survivors - scanned_chunks
    if track_fallback:
        stats["dict_fast_chunks"] = int(agg["f"] or 0)
        stats["decoded_fallback_chunks"] = int(agg["d"] or 0)
    return int(agg["h"] or 0), stats


def _decoded_strings(blob: bytes) -> pd.Series:
    """Fallback decode of a non-dict string chunk to a non-null Series.
    Values are str for utf8-coded chunks (fsst) and bytes for
    binary-coded ones (binary_fsst / deflate, or overrides)."""
    from ..codecs import chunk as chunk_codec
    return pd.Series(chunk_codec.decode_column(blob)).dropna()


def _align_bounds(s: pd.Series, *bounds: str) -> tuple:
    """Encode str bounds to UTF-8 when the chunk decoded to bytes —
    UTF-8 bytewise order equals code-point order, so every comparison
    agrees with the str form (a mixed comparison would raise)."""
    if len(s) and isinstance(s.iloc[0], bytes):
        return tuple(b.encode("utf-8") for b in bounds)
    return bounds


def _string_pred(op, *bounds: str):
    """Positional, null-safe decoded form of a string predicate for
    delete-affected chunks: `op(non_null_values, *aligned_bounds) ->
    bool array` evaluated only on non-null rows, nulls never match
    (SQL semantics), bounds aligned str/bytes per `_align_bounds`."""
    def pred(s: pd.Series) -> np.ndarray:
        out = np.zeros(len(s), dtype=bool)
        nn = s.notna().to_numpy(dtype=bool)
        if not nn.any():
            return out
        vals = s[nn]
        out[nn] = np.asarray(op(vals, *_align_bounds(vals, *bounds)),
                             dtype=bool)
        return out
    return pred


def pruned_string_equals_count(spark: SparkSession, out_dir: str,
                               column: str, value: str) -> tuple[int, dict]:
    """count(column == value) for a STRING column over the persisted
    store — the reference's headline design goal, filtering over
    dictionary codes without decompression (reference README.md:77-78,
    EqualsSink src/filter.rs:112-139), applied at the storage layer:

      1. manifest [min_str, max_str] stats (UTF-8 bytewise order, the
         same order Spark and the sorted dictionary use) prune chunks
         whose range cannot hold the value — never read;
      2. surviving dict-codec chunks binary-search the value in the
         sorted dictionary heap (`code_of`) and run the equality on the
         COMPRESSED u32 code vector (`equals_mask`) — the strings are
         never materialized; an absent value costs one heap search;
      3. non-dict string chunks (fsst/deflate) fall back to a full
         decode + compare, counted in the stats.
    """
    from ..codecs import dictionary

    def kernel(blob: bytes, codec: str) -> tuple[int, bool]:
        if codec == "dict":  # dict stores nulls natively: no NULM
            payload = blob[4:]
            code = dictionary.code_of(payload, value)
            if not code:
                return 0, True
            return filters.count_hits(filters.equals_mask(
                dictionary.codes_vector(payload), "u32", code)), True
        s = _decoded_strings(blob)
        v, = _align_bounds(s, value)
        return int((s == v).sum()), False

    return _pruned_count_scan(
        spark, out_dir, column,
        (F.col("min_str") <= value) & (F.col("max_str") >= value), kernel,
        bloom_value=value,
        decode_pred=_string_pred(lambda v, b: v == b, value))


def pruned_string_in_count(spark: SparkSession, out_dir: str,
                           column: str, values: list[str]) \
        -> tuple[int, dict]:
    """count(column IN (values)) for a STRING column over the persisted
    store — the reference's OneOfSink (src/filter.rs:143-177) at the
    storage layer.  Pruning layers:

      1. manifest zone maps: a chunk survives only if its
         [min_str, max_str] admits at least one of the values;
      2. the chunk's Bloom filter: ALL values hashed once, one
         `contains_many` pass per chunk — a chunk where every value is
         provably absent is never read (the level that matters when the
         store isn't sorted on the probed column);
      3. surviving dict chunks map the values to codes via the sorted
         heap (`code_of`, absent values drop out free) and run OneOf on
         the COMPRESSED u32 code vector (`one_of_mask`); non-dict
         chunks decode once and compare against the value set.
    """
    from ..codecs import dictionary

    # SQL IN semantics: a NULL element never matches anything
    values = [v for v in values if v is not None]
    if not values:  # SQL: x IN () is a syntax error; treat as no match
        return 0, {"total_chunks": 0, "scanned_chunks": 0,
                   "pruned_chunks": 0, "bloom_pruned_chunks": 0}

    def kernel(blob: bytes, codec: str) -> tuple[int, bool]:
        if codec == "dict":
            payload = blob[4:]
            codes = [c for c in (dictionary.code_of(payload, v)
                                 for v in values) if c]
            if not codes:
                return 0, True
            return filters.count_hits(filters.one_of_mask(
                dictionary.codes_vector(payload), "u32", codes)), True
        s = _decoded_strings(blob)
        vset = set(_align_bounds(s, *values))
        return int(s.isin(vset).sum()), False

    # one [min(values), max(values)] interval instead of a per-value OR:
    # a thousand-value list would otherwise put 2N expressions in the
    # manifest filter (Catalyst analysis cost), and the Bloom probe
    # right behind it already prunes per-value exactly
    return _pruned_count_scan(
        spark, out_dir, column,
        (F.col("min_str") <= max(values)) & (F.col("max_str") >= min(values)),
        kernel, bloom_value=values,
        decode_pred=_string_pred(lambda v, *bs: v.isin(set(bs)), *values))


def pruned_string_prefix_count(spark: SparkSession, out_dir: str,
                               column: str, prefix: str) -> tuple[int, dict]:
    """count(column LIKE 'prefix%') over the persisted store.  The
    manifest prune truncates [min_str, max_str] to len(prefix): prefix
    truncation is monotone in lexicographic order, so a chunk holding a
    match must satisfy trunc(min) <= prefix <= trunc(max) — an exact
    prune with no sentinel-suffix edge cases.  Surviving dict chunks map
    the predicate to an inclusive code range on the sorted dictionary
    (`prefix_range`) and scan the compressed code vector with
    `range_mask` (Null/Const/Delta sections skipped from headers);
    non-dict chunks decode and compare."""
    from ..codecs import dictionary

    L = len(prefix)

    def kernel(blob: bytes, codec: str) -> tuple[int, bool]:
        if codec == "dict":
            payload = blob[4:]
            lo, hi = dictionary.prefix_range(payload, prefix)
            if lo > hi:
                return 0, True
            return filters.count_hits(filters.range_mask(
                dictionary.codes_vector(payload), "u32", lo, hi)), True
        s = _decoded_strings(blob)
        p, = _align_bounds(s, prefix)
        return int(sum(1 for x in s if x.startswith(p))), False

    return _pruned_count_scan(
        spark, out_dir, column,
        (F.substring(F.col("min_str"), 1, L) <= prefix)
        & (F.substring(F.col("max_str"), 1, L) >= prefix), kernel,
        decode_pred=_string_pred(
            lambda v, p: np.fromiter((x.startswith(p) for x in v),
                                     bool, len(v)), prefix))


def pruned_string_range_count(spark: SparkSession, out_dir: str,
                              column: str, lo: str, hi: str) -> tuple[int, dict]:
    """count(column BETWEEN lo AND hi) over the persisted store — the
    third string predicate shape (equality and LIKE-prefix above), and
    the one BI tools emit for string dimensions.  Layers:

      1. manifest prune: a chunk can hold a match only if its
         [min_str, max_str] interval intersects [lo, hi]
         (max_str >= lo AND min_str <= hi) — never read otherwise;
      2. surviving dict chunks map [lo, hi] to an inclusive CODE range
         on the lexicographically-sorted dictionary (`code_range`,
         order-preserving codes) and scan the compressed u32 code
         vector with `range_mask` — Null/Const/Delta sections are
         skipped from their headers, strings never materialize;
      3. non-dict string chunks (fsst/deflate) decode and compare.
    """
    from ..codecs import dictionary

    def kernel(blob: bytes, codec: str) -> tuple[int, bool]:
        if codec == "dict":
            payload = blob[4:]
            c_lo, c_hi = dictionary.code_range(payload, lo, hi)
            if c_lo > c_hi:
                return 0, True
            return filters.count_hits(filters.range_mask(
                dictionary.codes_vector(payload), "u32", c_lo, c_hi)), True
        s = _decoded_strings(blob)
        lo_v, hi_v = _align_bounds(s, lo, hi)
        return int(((s >= lo_v) & (s <= hi_v)).sum()), False

    return _pruned_count_scan(
        spark, out_dir, column,
        (F.col("max_str") >= lo) & (F.col("min_str") <= hi), kernel,
        decode_pred=_string_pred(
            lambda v, lo_v, hi_v: (v >= lo_v) & (v <= hi_v), lo, hi))


def _pruned_select(spark: SparkSession, out_dir: str, filter_col: str,
                   manifest_pred, mask_fn, project_cols: list[str],
                   dtypes: dict | None = None,
                   with_stats: bool = False):
    """Shared skeleton of every row-returning filtered read over the
    store: manifest-stat prune -> broadcast candidate chunk ids ->
    chunk_id join pairing the filter blob with its projection blobs ->
    per-chunk `mask_fn(blob, codec) -> bool ndarray | None` -> only
    masked rows decoded for the projection and shipped out of the task.
    Column pruning and predicate pushdown meet at the chunk level, like
    Parquet row-group skipping but over this engine's own format.
    With with_stats=True returns (df, prune-counter stats) — one extra
    manifest aggregate, no chunk reads."""
    from ..codecs import chunk as chunk_codec

    if dtypes is None:
        _, dtypes = stored_schema(spark, out_dir)
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    candidates = manifest.where(
        (F.col("column") == filter_col) & manifest_pred)
    cand_ids = candidates.select("chunk_id")

    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    fb = (chunks.where(F.col("column") == filter_col)
          .join(F.broadcast(cand_ids), "chunk_id")
          .select("chunk_id", F.col("codec").alias("f_codec"),
                  F.col("blob").alias("f_blob")))
    paired = fb
    for i, col in enumerate(project_cols):
        pb = (chunks.where(F.col("column") == col)
              .select("chunk_id", F.col("blob").alias(f"p{i}")))
        paired = paired.join(pb, "chunk_id")

    out_schema = ", ".join(
        f"{c} {dtypes.get(c, 'string').replace('int64', 'long')}"
        for c in project_cols)

    paired = _join_keep(paired, _keep_mask_df(spark, out_dir))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                mask = mask_fn(bytes(row.f_blob), row.f_codec)
                if mask is None or not mask.any():
                    continue
                km = row.keep_mask
                if km is not None:
                    mask = mask & _keep_bools(bytes(km), len(mask))
                    if not mask.any():
                        continue
                cols = {}
                for i, c in enumerate(project_cols):
                    dec = chunk_codec.decode_column(
                        bytes(getattr(row, f"p{i}")), dtypes.get(c))
                    vals = dec[mask]
                    cols[c] = (vals.reset_index(drop=True)
                               if isinstance(vals, pd.Series)
                               else pd.Series(vals))
                yield pd.DataFrame(cols)

    res = paired.mapInPandas(fn, out_schema)
    if not with_stats:
        return res
    total, scanned, _ = _prune_counts(manifest, filter_col, manifest_pred)
    return res, {"total_chunks": total, "scanned_chunks": scanned,
                 "pruned_chunks": total - scanned, "select_kernel": True}


def _where_cand_df(manifest: DataFrame, where: list[dict]) -> DataFrame:
    """Lazy chunk-id DataFrame of the chunks surviving EVERY spec's
    manifest-stat predicate — the shared pruning front of the
    WHERE-spec kernels (grouped_dict_agg, pruned_select_where)."""
    cand = None
    for w in where:
        ids = (manifest.where((F.col("column") == w["col"])
                              & w["manifest_pred"])
               .select("chunk_id"))
        cand = ids if cand is None else cand.join(ids, "chunk_id")
    return cand


def pruned_select_where(spark: SparkSession, out_dir: str,
                        where: list[dict], project_cols: list[str]) \
        -> tuple[DataFrame, dict] | None:
    """Row-returning filtered projection under an AND of predicate
    specs — the multi-predicate generalization of `_pruned_select`.
    Each spec is {"col", "manifest_pred", "mask_fn"} (the same shape
    `grouped_dict_agg`'s WHERE takes): chunk candidates are the
    INTERSECTION of every spec's manifest survivors, each surviving
    chunk evaluates all row masks on its filter vectors (mask_fn ->
    None = provably no match, chunk skipped), and projection columns
    decode only where the combined mask (ANDed with live-delete keeps)
    passes.  Returns None when a column is missing from some chunk
    (schema evolution) — callers fall back."""
    from ..codecs import chunk as chunk_codec

    if not where:
        return None
    _, dtypes = stored_schema(spark, out_dir)
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    cand = _where_cand_df(manifest, where)
    # the column census and the survivor count are independent jobs
    # (the count is wasted work only on the rare fallback-return path)
    counts, scanned = _overlap(
        lambda: (manifest.groupBy("column")
                 .agg(F.count(F.lit(1)).alias("n")).collect()),
        lambda: cand.count())
    by_col = {r["column"]: int(r["n"]) for r in counts}
    n_chunks = max(by_col.values(), default=0)
    need = {w["col"] for w in where} | set(project_cols)
    if any(by_col.get(c) != n_chunks for c in need):
        return None

    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    # broadcast the (tiny) surviving-id set into the big chunk scan,
    # then pair filter blobs with projection blobs on chunk_id
    paired = F.broadcast(cand)
    for i, w in enumerate(where):
        paired = paired.join(
            chunks.where(F.col("column") == w["col"])
            .select("chunk_id", F.col("codec").alias("wc%d" % i),
                    F.col("blob").alias("w%d" % i)),
            "chunk_id")
    for i, col in enumerate(project_cols):
        paired = paired.join(
            chunks.where(F.col("column") == col)
            .select("chunk_id", F.col("blob").alias("p%d" % i)),
            "chunk_id")
    paired = _join_keep(paired, _keep_mask_df(spark, out_dir))
    out_schema = ", ".join(
        f"{c} {dtypes.get(c, 'string').replace('int64', 'long')}"
        for c in project_cols)
    where_fns = [w["mask_fn"] for w in where]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                mask, dead = None, False
                for i, mfn in enumerate(where_fns):
                    m = mfn(bytes(getattr(row, "w%d" % i)),
                            getattr(row, "wc%d" % i))
                    if m is None:
                        dead = True
                        break
                    mask = m if mask is None else mask & m
                if dead or not mask.any():
                    continue
                km = row.keep_mask
                if km is not None:
                    mask &= _keep_bools(bytes(km), len(mask))
                    if not mask.any():
                        continue
                cols = {}
                for i, c in enumerate(project_cols):
                    dec = chunk_codec.decode_column(
                        bytes(getattr(row, "p%d" % i)), dtypes.get(c))
                    vals = dec[mask]
                    cols[c] = (vals.reset_index(drop=True)
                               if isinstance(vals, pd.Series)
                               else pd.Series(vals))
                yield pd.DataFrame(cols)

    return (paired.mapInPandas(fn, out_schema),
            {"total_chunks": n_chunks, "scanned_chunks": scanned,
             "pruned_chunks": n_chunks - scanned,
             "where_specs": len(where), "select_kernel": True})


def pruned_filter_select(spark: SparkSession, out_dir: str,
                         filter_col: str, value: str,
                         project_cols: list[str],
                         with_stats: bool = False):
    """SELECT project_cols WHERE filter_col == value over the persisted
    store, returning decoded ROWS — the drop-in query shape a user
    migrating a SQL workload runs constantly.  Pushdown layers:

      1. manifest [min_str, max_str] prunes chunks before any blob read
         (only the filter column's stats are consulted);
      2. a surviving chunk's filter mask comes from the compressed dict
         code vector (code_of + equality on u32 codes; decode fallback
         for non-dict chunks, str- or bytes-valued);
      3. projection columns decode ONLY in surviving chunks, and only
         the masked rows ship out of the task.

    Scale shape: one broadcast of candidate chunk ids, one chunk_id
    join to pair the filter blob with its projection blobs, no shuffle
    of decoded rows beyond the matching output."""
    from ..codecs import dictionary

    def mask_fn(blob: bytes, codec: str):
        if codec == "dict":
            payload = blob[4:]
            code = dictionary.code_of(payload, value)
            if not code:
                return None
            return dictionary.codes(payload) == np.uint64(code)
        s = pd.Series(chunk_codec.decode_column(blob))
        v, = _align_bounds(s.dropna(), value)
        return (s == v).fillna(False).to_numpy(dtype=bool)

    return _pruned_select(
        spark, out_dir, filter_col,
        (F.col("min_str") <= value) & (F.col("max_str") >= value),
        mask_fn, project_cols, with_stats=with_stats)


def pruned_range_select(spark: SparkSession, out_dir: str,
                        filter_col: str, lo, hi,
                        project_cols: list[str],
                        with_stats: bool = False):
    """SELECT project_cols WHERE filter_col BETWEEN lo AND hi for a
    NUMERIC filter column — the numeric sibling of
    `pruned_filter_select`: manifest interval pruning on the stats
    columns matching the filter column's TYPE (int columns carry
    [min_val, max_val], float columns [min_f64, max_f64] — consulting
    the wrong pair would NULL-prune every chunk and silently return
    nothing), the range evaluated on the decoded filter vector of
    surviving chunks only, projections decoded only where the mask
    passes."""
    _, dtypes = stored_schema(spark, out_dir)
    dt = dtypes.get(filter_col)
    if dt == "int64":
        pred = (F.col("max_val") >= lo) & (F.col("min_val") <= hi)
    elif dt in ("double", "float"):
        pred = (F.col("max_f64") >= lo) & (F.col("min_f64") <= hi)
    else:
        raise ValueError(
            f"pruned_range_select: filter column {filter_col!r} has "
            f"dtype {dt!r}; int and float columns are supported (use "
            "pruned_string_range_count / pruned_filter_select for "
            "string predicates)")

    def mask_fn(blob: bytes, codec: str):
        s = pd.Series(chunk_codec.decode_column(blob))
        return ((s >= lo) & (s <= hi)).fillna(False).to_numpy(dtype=bool)

    return _pruned_select(spark, out_dir, filter_col, pred,
                          mask_fn, project_cols, dtypes=dtypes,
                          with_stats=with_stats)


def store_membership(spark: SparkSession, out_dir: str, column: str,
                     probes: DataFrame, value_col: str,
                     id_col: str) -> tuple[DataFrame, dict]:
    """Batch membership probe against the persisted store — the
    incremental-crawl dedup question: for each probe row, does
    probes[value_col] appear anywhere in `column` of the store?
    Returns (DataFrame[id_col, present:boolean], stats).

    The store is typically NOT sorted on the probed column (it sorts on
    (host, warc_ts); the probe is a text/url), so zone maps admit every
    chunk and the per-chunk Bloom filters (codecs/bloom.py, format v5)
    carry the whole prune:

      1. every probe is hashed ONCE, distributed (`bloom.hash_values`
         inside mapInPandas); only (id, hash) pairs — 16 bytes/probe —
         are collected and broadcast, never the values.  A crawl batch
         is small next to the corpus by definition; 10^8 probes
         broadcast as ~1.6 GB, beyond which the caller shards the batch;
      2. one pass over the manifest tests ALL probe hashes against each
         chunk's filter in one numpy call (`bloom.contains_many`) —
         a probe absent from every filter is PROVEN absent with zero
         blob reads (Blooms have no false negatives), so the common
         case (a genuinely new document) never touches a chunk;
      3. surviving (chunk, probe) candidate pairs — true hits plus
         ~FPR·chunks false positives per probe — verify exactly: pairs
         join back to their probe values, group per chunk, and each
         surviving chunk decodes ONCE (dict chunks answer from a
         dictionary-heap search without decoding).  False positives
         cost I/O, never wrong answers.

    Pre-v5 stores (no bloom column) degrade to verifying every
    (chunk, probe) pair — correct, with pairs_bloom_pruned = 0.
    NULL probe values are never equal to anything (SQL semantics):
    present = false without probing."""
    from ..codecs import bloom as bloom_codec, dictionary

    nn = probes.where(F.col(value_col).isNotNull())

    def hash_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        for pdf in batches:
            vals = pa.array(pdf[value_col].astype(object),
                            type=pa.large_utf8())
            h = bloom_codec.hash_values(vals)
            yield pd.DataFrame({"pid": pdf[id_col].to_numpy(np.int64),
                                "h": h.view(np.int64)})

    manifest = (spark.read.parquet(os.path.join(out_dir, "manifest"))
                .where(F.col("column") == column))
    # probe hashing, the manifest count and the null-probe check are
    # three independent jobs: one overlap wave
    hp, total_chunks, has_null_probes = _overlap(
        lambda: (nn.select(id_col, value_col)
                 .mapInPandas(hash_fn, "pid long, h long").toPandas()),
        lambda: manifest.count(),
        lambda: bool(probes.where(F.col(value_col).isNull())
                     .limit(1).count()))
    ids = hp["pid"].to_numpy(np.int64)
    hashes = hp["h"].to_numpy(np.int64).view(np.uint64)
    n_probes = len(ids)
    bc = spark.sparkContext.broadcast((ids, hashes))
    has_bloom = "bloom" in manifest.columns
    man_cols = ["chunk_id"] + (["bloom"] if has_bloom else [])

    def probe_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p_ids, p_hashes = bc.value
        for pdf in batches:
            blooms = pdf["bloom"] if "bloom" in pdf else [None] * len(pdf)
            chunk_col, id_out = [], []
            for cid, blm in zip(pdf["chunk_id"], blooms):
                m = bloom_codec.contains_many(
                    bytes(blm) if blm is not None else None, p_hashes)
                sel = p_ids[m]
                if len(sel):
                    id_out.append(sel)
                    chunk_col.extend([cid] * len(sel))
            yield pd.DataFrame({
                "chunk_id": pd.Series(chunk_col, dtype=object),
                "pid": (np.concatenate(id_out) if id_out
                        else np.empty(0, dtype=np.int64))})

    # single consumer now (stats come from the materialized verify
    # verdicts below), so the Bloom pass needs no persist and no
    # separate stats job
    cand = manifest.select(*man_cols).mapInPandas(
        probe_fn, "chunk_id string, pid long")

    # pair each candidate with its probe VALUE (first time values move),
    # then verify per chunk: one decode answers all of that chunk's pairs
    pairs = cand.join(nn.select(F.col(id_col).alias("pid"), value_col),
                      "pid")
    grouped = pairs.groupBy("chunk_id").agg(
        F.collect_list(F.struct(F.col("pid"), F.col(value_col).alias("v")))
        .alias("plist"))
    chunks = _join_keep(
        (spark.read.parquet(os.path.join(out_dir, "chunks"))
         .where(F.col("column") == column)
         .select("chunk_id", "codec", "blob")
         .join(grouped, "chunk_id")),
        _keep_mask_df(spark, out_dir))

    def verify_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for cid, blob, codec, plist, km in zip(pdf["chunk_id"],
                                                   pdf["blob"],
                                                   pdf["codec"],
                                                   pdf["plist"],
                                                   pdf["keep_mask"]):
                pid = np.array([r["pid"] for r in plist], dtype=np.int64)
                vals = [r["v"] for r in plist]
                km = None if km is None else bytes(km)
                if codec == "dict" and km is None:
                    # every dictionary entry was built from a value the
                    # chunk actually holds: heap search IS membership
                    # (a delete-affected chunk loses this shortcut — an
                    # entry may survive only in deleted rows)
                    payload = bytes(blob)[4:]
                    found = np.array(
                        [bool(dictionary.code_of(payload, v))
                         for v in vals], dtype=bool)
                elif codec == "dict":
                    payload = bytes(blob)[4:]
                    codes = dictionary.codes(payload)
                    live = set(codes[_keep_bools(km, len(codes))]
                               .tolist())
                    found = np.array(
                        [(lambda c: bool(c) and c in live)(
                            dictionary.code_of(payload, v))
                         for v in vals], dtype=bool)
                else:
                    s = pd.Series(
                        chunk_codec.decode_column(bytes(blob)))
                    if km is not None:
                        s = s[_keep_bools(km, len(s))]
                    s = s.dropna()
                    present = set(s)
                    if len(s) and isinstance(s.iloc[0], bytes):
                        vals = [v.encode("utf-8") for v in vals]
                    found = np.array([v in present for v in vals],
                                     dtype=bool)
                yield pd.DataFrame({
                    "chunk_id": pd.Series([cid] * len(pid), dtype=object),
                    "pid": pid, "found": found})

    # materialize the PER-PAIR verdicts NOW — candidate_pairs rows,
    # the same driver bound the broadcast probe hashes already assume —
    # and derive presence AND both stats counts from this single job
    # (previously a persisted candidate pass fed a separate stats
    # aggregate plus the verify join)
    raw_pdf = (chunks.mapInPandas(verify_fn,
                                  "chunk_id string, pid long, "
                                  "found boolean")
               .toPandas())
    candidate_pairs = len(raw_pdf)
    candidate_chunks = int(raw_pdf["chunk_id"].nunique())
    found_pdf = (raw_pdf.groupby("pid", as_index=False)["found"].max()
                 .rename(columns={"found": "present"})
                 if len(raw_pdf) else
                 pd.DataFrame({"pid": pd.Series([], dtype="int64"),
                               "present": pd.Series([], dtype=bool)}))
    found_df = spark.createDataFrame(found_pdf,
                                     "pid long, present boolean")
    result = (nn.select(F.col(id_col).alias("pid"))
              .join(found_df, "pid", "left")
              .select(F.col("pid").alias(id_col),
                      F.coalesce("present", F.lit(False)).alias("present")))
    if has_null_probes:
        result = result.unionByName(
            probes.where(F.col(value_col).isNull())
            .select(id_col, F.lit(False).alias("present")))
    stats = {
        "total_chunks": total_chunks,
        "n_probes": n_probes,
        "pairs_possible": n_probes * total_chunks,
        "candidate_pairs": candidate_pairs,
        "pairs_bloom_pruned": (n_probes * total_chunks - candidate_pairs
                               if has_bloom else 0),
        "chunks_verified": candidate_chunks,
    }
    return result, stats


def _schema_rows(spark: SparkSession, out_dir: str) -> list[dict]:
    """Rows of the store's table_schema parquet, position-ordered.

    table_schema is store METADATA — a handful of rows regardless of
    table size — so the driver reads it directly with pyarrow (the
    Iceberg-metadata pattern: no Spark job for a KB-sized file).
    Non-local URIs fall back to a Spark read, which works everywhere."""
    path = os.path.join(out_dir, "table_schema")
    local = path[7:] if path.startswith("file://") else path
    if "://" not in local:
        try:
            import pyarrow.parquet as pq
            rows = pq.read_table(local).to_pylist()
            return sorted(rows, key=lambda r: r["position"])
        except Exception:
            pass  # racing rewrite / exotic layout: Spark read below
    return [r.asDict() for r in
            spark.read.parquet(path).orderBy("position").collect()]


def stored_schema(spark: SparkSession, out_dir: str) -> tuple[str, dict]:
    """(DDL string, decode dtypes) recovered from the store's own
    table_schema parquet — an encoded table is self-describing."""
    rows = _schema_rows(spark, out_dir)
    ddl = ", ".join(f"{r['name']} {r['dtype']}" for r in rows)

    def decode_dtype(sql_type: str) -> str:
        if sql_type.startswith("timestamp"):
            return "timestamp"
        if sql_type in ("bigint", "int", "smallint", "tinyint"):
            return "int64"
        return sql_type

    return ddl, {r["name"]: decode_dtype(r["dtype"]) for r in rows}


def _unwrap_vec(blob: bytes) -> bytes:
    """Strip the optional NULM wrapper + chunk codec tag, returning the
    raw BinaryVector payload (nulls ride as zeros)."""
    b = bytes(blob)
    if b[:4] == b"NULM":
        n = int.from_bytes(b[4:8], "little")
        b = b[8 + (n + 7) // 8:]
    return b[4:]


def pruned_multi_and_count(spark: SparkSession, out_dir: str,
                           range_col: str, lo: int, hi: int,
                           eq_col: str, value: int) -> tuple[int, dict]:
    """count(lo <= range_col <= hi AND eq_col == value) over an encoded
    table — the reference's MultiVectorFilter (src/filter.rs:239-286)
    running on the PERSISTED store:

      1. manifest [min,max] stats prune chunks per column; a chunk
         survives only if BOTH predicates admit it (candidate id sets
         intersected before any blob is read),
      2. the two columns' blobs of one chunk_id pair up with one join
         (chunks are row-aligned by construction),
      3. inside a chunk, range_mask runs first and its all-zero sections
         short-circuit the equality column's decode
         (section_masks(skip_sections=...)), exactly the reference's
         sparse-first ordering."""
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    cand_r = manifest.where(
        (F.col("column") == range_col)
        & (F.col("min_val") <= hi) & (F.col("max_val") >= lo))
    cand_e = manifest.where(
        (F.col("column") == eq_col)
        & (F.col("min_val") <= value) & (F.col("max_val") >= value))
    cand = (cand_r.select("chunk_id")
            .join(cand_e.select("chunk_id"), "chunk_id"))

    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    vec_codecs = ["vec_u64", "vec_u32"]
    a = (chunks.where(F.col("column") == range_col)
         .select("chunk_id", F.col("blob").alias("blob_r"),
                 F.col("codec").alias("codec_r")))
    b = (chunks.where(F.col("column") == eq_col)
         .select("chunk_id", F.col("blob").alias("blob_e"),
                 F.col("codec").alias("codec_e")))
    paired = _join_keep((a.join(F.broadcast(cand), "chunk_id")
                         .join(b, "chunk_id")),
                        _keep_mask_df(spark, out_dir))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hits = skipped_sections = 0
        for pdf in batches:
            for br, cr, be, ce, km in zip(pdf["blob_r"], pdf["codec_r"],
                                          pdf["blob_e"], pdf["codec_e"],
                                          pdf["keep_mask"]):
                km = None if km is None else bytes(km)
                br_b, be_b = bytes(br), bytes(be)
                # the compressed kernels see nulls as payload zeros: a
                # range admitting 0 or an equality against 0 on a
                # nullable chunk would count NULL rows — decode instead
                null_hazard = ((br_b[:4] == b"NULM" and lo <= 0 <= hi)
                               or (be_b[:4] == b"NULM" and value == 0))
                # non-vec codecs (rle / zigzag) take the decoded path
                # instead of being silently dropped from the join
                if (km is not None or null_hazard
                        or cr not in vec_codecs or ce not in vec_codecs):
                    # positional decode of both columns; keep mask
                    # ANDed in for delete-affected chunks
                    rv = pd.Series(chunk_codec.decode_column(br_b))
                    ev = pd.Series(chunk_codec.decode_column(be_b))
                    m = (((rv >= lo) & (rv <= hi)).fillna(False)
                         .to_numpy(dtype=bool))
                    m &= (ev == value).fillna(False).to_numpy(dtype=bool)
                    if km is not None:
                        m &= _keep_bools(km, len(rv))
                    hits += int(m.sum())
                    continue
                kr = "u64" if cr == "vec_u64" else "u32"
                ke = "u64" if ce == "vec_u64" else "u32"
                m1 = filters.range_mask(_unwrap_vec(br), kr, lo, hi)
                dead = ~m1.any(axis=1)
                skipped_sections += int(dead.sum())
                m2 = filters.section_masks(_unwrap_vec(be), ke, [value],
                                           skip_sections=dead)
                hits += filters.count_hits(m1 & m2)
        yield pd.DataFrame({"hits": [hits], "skipped": [skipped_sections]})

    # the two metadata counts and the chunk scan are independent jobs
    total_chunks, scanned, agg = _overlap(
        lambda: manifest.where(F.col("column") == range_col).count(),
        lambda: cand.count(),
        lambda: (paired.select("blob_r", "codec_r", "blob_e",
                               "codec_e", "keep_mask")
                 .mapInPandas(fn, "hits long, skipped long")
                 .agg(F.sum("hits").alias("h"), F.sum("skipped").alias("s"))
                 .collect()[0]))
    return int(agg["h"] or 0), {
        "total_chunks": total_chunks,
        "scanned_chunks": scanned,
        "pruned_chunks": total_chunks - scanned,
        "eq_sections_short_circuited": int(agg["s"] or 0),
    }


def pruned_filtered_sum(spark: SparkSession, out_dir: str,
                        filter_col: str, lo: int, hi: int,
                        sum_col: str) -> tuple[int, dict]:
    """SUM(sum_col) WHERE lo <= filter_col <= hi with THREE pushdown
    levels, cheapest first:

      1. manifest prune: chunks whose filter-col [min,max] is disjoint
         from [lo,hi] contribute nothing — never read;
      2. manifest ANSWER: chunks fully covered (min >= lo, max <= hi,
         no nulls) contribute their manifest `sum_val` — zero blob
         reads, the aggregation analog of Parquet row-group stats;
      3. partially-overlapping chunks decode only the sections the
         range mask needs (`filters.range_mask` header skips) and sum
         via `filters.masked_sum` (Const/Null sections summed from
         their header byte).

    Cross-chunk accumulation runs in decimal(38,0) so no int64 overflow
    regardless of chunk count.  Chunks with nulls or non-vec codecs in
    either column fall back to a full decode of that chunk (SQL null
    semantics: null filter values never match, null sum values add 0).
    """
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    f_man = manifest.where(F.col("column") == filter_col)
    overlap = f_man.where((F.col("min_val") <= hi) & (F.col("max_val") >= lo))

    s_man = (manifest.where(F.col("column") == sum_col)
             .select("chunk_id", F.col("sum_val").alias("s_sum"),
                     F.col("null_count").alias("s_nulls"),
                     F.col("codec").alias("s_codec")))
    masks = _keep_mask_df(spark, out_dir)
    j = _join_keep(overlap.join(s_man, "chunk_id"), masks)
    # a delete-affected chunk's manifest sum includes deleted rows: it
    # must take the decoded path whatever its stats say (keep_mask is
    # non-NULL exactly for affected chunks after the left join)
    covered = ((F.col("min_val") >= lo) & (F.col("max_val") <= hi)
               & (F.col("null_count") == 0) & F.col("s_sum").isNotNull()
               & F.col("keep_mask").isNull())
    partial_ids = j.where(~covered).select(
        "chunk_id", "null_count", "s_nulls", "codec", "s_codec")
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    fb = (chunks.where(F.col("column") == filter_col)
          .select("chunk_id", F.col("blob").alias("blob_f")))
    sb = (chunks.where(F.col("column") == sum_col)
          .select("chunk_id", F.col("blob").alias("blob_s")))
    paired = _join_keep(
        fb.join(F.broadcast(partial_ids), "chunk_id").join(sb, "chunk_id"),
        masks)

    vec_codecs = ("vec_u64", "vec_u32")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        task_sum, fast_sections = 0, 0
        for pdf in batches:
            for bf, cf, nf, bs, cs, ns, km in zip(
                    pdf["blob_f"], pdf["codec"], pdf["null_count"],
                    pdf["blob_s"], pdf["s_codec"], pdf["s_nulls"],
                    pdf["keep_mask"]):
                km = None if km is None else bytes(km)
                if (km is None and cf in vec_codecs and cs in vec_codecs
                        and not nf and not ns):
                    kf = "u64" if cf == "vec_u64" else "u32"
                    ks = "u64" if cs == "vec_u64" else "u32"
                    masks = filters.range_mask(_unwrap_vec(bf), kf, lo, hi)
                    t, st = filters.masked_sum(_unwrap_vec(bs), ks, masks,
                                               return_stats=True)
                    fast_sections += st["summed_without_decode"]
                else:  # nullable, non-vec codec, or delete-affected:
                    fv = pd.Series(chunk_codec.decode_column(bytes(bf)))
                    sv = pd.Series(chunk_codec.decode_column(bytes(bs)))
                    m = (fv >= lo) & (fv <= hi)
                    m = m.fillna(False).to_numpy(dtype=bool)
                    if km is not None:
                        m &= _keep_bools(km, len(fv))
                    t = int(sv[m].dropna().astype(object).sum())
                task_sum += t
        # exact cross-chunk accumulation: the Python-int partial rides as
        # a string, Spark finishes in decimal(38,0) — no float, no wrap
        yield pd.DataFrame({"part_sum": [str(task_sum)],
                            "fast_sections": [fast_sections]})

    # metadata count, covered-chunk aggregate and the partial-chunk
    # scan are three independent jobs: overlap them
    total_chunks, agg, part = _overlap(
        lambda: f_man.count(),
        lambda: j.agg(
            F.sum(F.when(covered, F.col("s_sum")).otherwise(F.lit(0))
                  .cast("decimal(38,0)")).alias("manifest_sum"),
            F.sum(F.when(covered, 1).otherwise(0)).alias("covered"),
            F.count("*").alias("scanned")).collect()[0],
        lambda: (paired.mapInPandas(fn, "part_sum string, fast_sections long")
                 .agg(F.sum(F.col("part_sum").cast("decimal(38,0)"))
                      .alias("s"),
                      F.sum("fast_sections").alias("fs")).collect()[0]))
    manifest_sum = int(agg["manifest_sum"] or 0)
    covered_chunks = int(agg["covered"] or 0)
    scanned = int(agg["scanned"] or 0)
    partial_sum = int(part["s"] or 0)
    return manifest_sum + partial_sum, {
        "total_chunks": total_chunks,
        "pruned_chunks": total_chunks - scanned,
        "covered_from_manifest": covered_chunks,
        "partial_chunks": scanned - covered_chunks,
        "sections_summed_without_decode": int(part["fs"] or 0),
    }


def pruned_topk(spark: SparkSession, out_dir: str, column: str,
                k: int) -> tuple[list[int], dict]:
    """The k largest values of a column with manifest-threshold pruning.

    Every chunk contributes at least its max, so the k-th largest
    per-chunk max_val (M_k) lower-bounds the k-th largest value — chunks
    with max_val < M_k cannot hold a top-k element (ties at M_k are
    kept: the prune is strict-less-than).  Surviving chunks emit only a
    k-row partial top-k each, so the final shuffle is k x chunks rows.
    """
    _, dtypes = stored_schema(spark, out_dir)
    if dtypes.get(column) != "int64":
        # float columns have NULL int zone maps (empty threshold =>
        # silent []), and the int64 partials below would truncate —
        # refuse loudly like pruned_range_select does
        raise ValueError(
            f"pruned_topk: column {column!r} has dtype "
            f"{dtypes.get(column)!r}; integer columns only")
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    col_man = manifest.where(F.col("column") == column)
    masks = _keep_mask_df(spark, out_dir)
    # metadata-only job: the k largest chunk maxima.  The threshold is
    # sound only if each contributing max is a LIVE value, so delete-
    # affected chunks (whose manifest max may be a deleted row) are
    # excluded from threshold DERIVATION — while remaining prunable BY
    # it, since a manifest max is still an upper bound of live values.
    thr_man = (col_man.join(masks.select("chunk_id"),
                            "chunk_id", "left_anti")
               if masks is not None else col_man)
    # the total count and the threshold derivation are independent jobs
    total_chunks, thr_rows = _overlap(
        lambda: col_man.count(),
        lambda: thr_man.orderBy(F.desc("max_val")).limit(k).collect())
    maxes = [r["max_val"] for r in thr_rows if r["max_val"] is not None]
    if not maxes and masks is None:
        return [], {"total_chunks": total_chunks, "scanned_chunks": 0,
                    "pruned_chunks": total_chunks}
    threshold = min(maxes) if len(maxes) >= k else None
    cand = col_man if threshold is None else \
        col_man.where(F.col("max_val") >= threshold)

    chunks = _join_keep(
        (spark.read.parquet(os.path.join(out_dir, "chunks"))
         .where(F.col("column") == column)
         .join(F.broadcast(cand.select("chunk_id")), "chunk_id")),
        masks)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob, km in zip(pdf["blob"], pdf["keep_mask"]):
                v = np.asarray(chunk_codec.decode_column(bytes(blob)))
                if km is not None:
                    v = v[_keep_bools(bytes(km), len(v))]
                v = pd.Series(v).dropna().to_numpy()
                if not len(v):
                    continue
                part = np.sort(v)[-k:]  # chunk-local top-k only
                yield pd.DataFrame({"v": part.astype(np.int64)})

    # the survivor count and the data top-k are independent jobs
    scanned, top = _overlap(
        lambda: cand.count(),
        lambda: (chunks.select("blob", "keep_mask").mapInPandas(fn, "v long")
                 .orderBy(F.desc("v")).limit(k).collect()))
    return [int(r["v"]) for r in top], {
        "total_chunks": total_chunks,
        "scanned_chunks": scanned,
        "pruned_chunks": total_chunks - scanned,
    }


def exact_weighted_bincount(codes: np.ndarray, weights) -> np.ndarray:
    """Exact int64 per-group sums of int64 weights: each weight splits
    into hi/lo 32-bit halves (w == (w >> 32) * 2^32 + (w & 0xFFFFFFFF)
    for arithmetic shift), two float64-weighted bincounts accumulate the
    halves exactly (|half| < 2^32 and <= 2^21 rows/chunk keep every
    partial under float64's 2^53 exact range), and the halves recombine
    in int64 — the same exact-accumulation scheme as chunk_stats_for.
    NaN weights count as 0 (SQL SUM null semantics).  Degrades nothing
    and asserts nothing about the VALUES — only the row count, which
    Arrow batch sizing already bounds far below the 2^21 limit."""
    assert len(codes) < (1 << 21), "chunk too large for exact hi/lo sums"
    if isinstance(weights, pd.Series):  # nullable Int64 from NULM decode
        iv = weights.fillna(0).to_numpy(dtype=np.int64)
    else:
        w = np.asarray(weights)
        if w.dtype.kind == "f":  # float carrier: NaN = SQL NULL = 0
            iv = np.nan_to_num(w, copy=True).astype(np.int64)
        else:  # integer input stays integer end to end — exact at 2^63
            iv = w.astype(np.int64)
    lo = (iv & 0xFFFFFFFF).astype(np.float64)
    hi = (iv >> 32).astype(np.float64)
    acc_lo = np.bincount(codes, weights=lo).astype(np.int64)
    acc_hi = np.bincount(codes, weights=hi).astype(np.int64)
    return acc_lo + (acc_hi << 32)


def _notna_i64(decoded) -> np.ndarray:
    """Element-wise non-null indicator of a decoded column as int64."""
    if isinstance(decoded, pd.Series):
        return decoded.notna().to_numpy(dtype=np.int64)
    a = np.asarray(decoded)
    if a.dtype.kind == "f":
        return (~np.isnan(a)).astype(np.int64)
    return np.ones(len(a), dtype=np.int64)


def grouped_dict_agg(spark: SparkSession, out_dir: str, group_col: str,
                     aggs: list[dict],
                     where: list[dict] | None = None) \
        -> tuple[DataFrame, dict] | None:
    """GROUP BY a dict-coded string column answered straight off the
    compressed store — the aggregation analog of the reference's
    filter-on-codes design goal (reference README.md:83-86): per chunk
    ONE bincount over the u32 code vector (plus one weighted bincount
    per SUM/COUNT(col) item), so the shuffle carries (distinct values
    x chunks) tiny partials and no row-level string ever exists.

    `aggs`: [{"fn": "count" | "count_col" | "sum", "col", "alias"}].
    Exact SQL semantics: a NULL group (code 0) is emitted, COUNT(col)
    skips nulls, SUM over an all-null group is NULL, and live DELETE
    masks zero out deleted rows before any bincount.  Cross-chunk SUM
    accumulates in decimal(38,0) (no int64 wrap across chunks).

    `where` composes predicate pushdown under the group kernel: each
    spec is {"col", "manifest_pred", "mask_fn"} — the manifest_pred
    (a Column over that column's manifest stats row) prunes whole
    chunks before any blob read, and mask_fn(blob, codec) -> bool
    ndarray | None row-masks surviving chunks (None = provably no
    match, e.g. an absent dict code) before the bincounts — so
    `SELECT g, aggs FROM t WHERE p GROUP BY g` keeps both the chunk
    pruning of the count kernels and the no-row-strings property of
    the group kernel.  Groups emptied by the WHERE are not emitted.

    Returns (DataFrame [group_col] + aliases, stats), or None when the
    shape is outside the kernel (group column not 100% dict-coded, a
    chunk missing either column — e.g. pre-evolution chunks) — callers
    fall back to the decoded view."""
    from ..codecs import dictionary

    where = list(where or [])
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    pairs_thunk = lambda: (  # noqa: E731
        manifest.groupBy("column")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.col("codec") == "dict", 1).otherwise(0))
             .alias("n_dict")).collect())
    if where:
        # overlap the column census with the WHERE survivor count (the
        # count is wasted work only on the rare fallback-return path)
        w_cand = _where_cand_df(manifest, where)
        pairs, w_scanned = _overlap(pairs_thunk, lambda: w_cand.count())
    else:
        pairs = pairs_thunk()
    by_col = {r["column"]: r for r in pairs}
    if group_col not in by_col:
        return None
    g = by_col[group_col]
    n_chunks = int(g["n"])
    if int(g["n_dict"]) != n_chunks:
        return None  # mixed/non-dict group encodings: fallback
    extra_cols = []
    for a in aggs:
        if a["fn"] not in ("count", "count_col", "sum", "min", "max"):
            return None
        if a["fn"] in ("min", "max") and a["col"] == group_col:
            return None  # string MIN/MAX of the key: decoded view's job
        if a["fn"] == "count" or a["col"] == group_col:
            continue
        c = a["col"]
        if c not in by_col or int(by_col[c]["n"]) != n_chunks:
            return None  # column absent for some chunks (evolution)
        if c not in extra_cols:
            extra_cols.append(c)
    for w in where:
        c = w["col"]
        if c not in by_col or int(by_col[c]["n"]) != n_chunks:
            return None  # predicate column absent for some chunks

    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    scan = (chunks.where(F.col("column") == group_col)
            .select("chunk_id", F.col("blob").alias("blob_g")))
    scanned = n_chunks
    if where:
        scanned = w_scanned
        scan = scan.join(F.broadcast(w_cand), "chunk_id")
    for i, c in enumerate(extra_cols):
        scan = scan.join(
            chunks.where(F.col("column") == c)
            .select("chunk_id", F.col("blob").alias("blob_%d" % i)),
            "chunk_id")
    for i, w in enumerate(where):
        scan = scan.join(
            chunks.where(F.col("column") == w["col"])
            .select("chunk_id", F.col("codec").alias("wc%d" % i),
                    F.col("blob").alias("w%d" % i)),
            "chunk_id")
    scan = _join_keep(scan, _keep_mask_df(spark, out_dir))
    col_ix = {c: i for i, c in enumerate(extra_cols)}
    where_fns = [w["mask_fn"] for w in where]

    # per-agg partial columns: count -> 1 long; count_col -> 1 long;
    # sum -> value (string: decimal-exact across chunks) + nonnull long;
    # min/max -> 1 nullable long (NULL partial = group all-null here)
    out_fields, agg_specs = ["g string"], []
    for i, a in enumerate(aggs):
        if a["fn"] == "sum":
            out_fields += ["s%d string" % i, "nn%d long" % i]
        elif a["fn"] in ("min", "max"):
            out_fields.append("m%d long" % i)
        else:
            out_fields.append("c%d long" % i)
        agg_specs.append((a["fn"], None if a["fn"] == "count"
                          else col_ix.get(a["col"])))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                payload = bytes(row.blob_g)[4:]  # strip chunk codec tag
                codes = dictionary.codes(payload).astype(np.int64)
                vals = dictionary.dictionary(payload)
                width = len(vals) + 1  # + the code-0 null sentinel
                km = row.keep_mask
                keep = (None if km is None
                        else _keep_bools(bytes(km), len(codes)))
                dead = False
                for i, mfn in enumerate(where_fns):
                    m = mfn(bytes(getattr(row, "w%d" % i)),
                            getattr(row, "wc%d" % i))
                    if m is None:  # provably no match in this chunk
                        dead = True
                        break
                    keep = m if keep is None else keep & m
                if dead or (where_fns and not keep.any()):
                    continue
                ck = codes if keep is None else codes[keep]
                counts = np.bincount(ck, minlength=width)
                live = np.flatnonzero(counts)
                if not len(live):
                    continue
                decoded = {}
                for c, i in col_ix.items():
                    d = chunk_codec.decode_column(
                        bytes(getattr(row, "blob_%d" % i)))
                    if keep is not None:
                        d = (d[keep] if isinstance(d, np.ndarray)
                             else d[keep].reset_index(drop=True))
                    decoded[c] = d
                cols = {"g": pd.Series(
                    [None if code == 0 else vals[code - 1]
                     for code in live], dtype=object)}
                for i, (a, (fn_name, cix)) in enumerate(
                        zip(aggs, agg_specs)):
                    if fn_name in ("min", "max"):
                        d = decoded[a["col"]]
                        if isinstance(d, pd.Series):
                            nn_b = d.notna().to_numpy()
                            dv = d.fillna(0).to_numpy(dtype=np.int64)
                        else:
                            arr = np.asarray(d)
                            if arr.dtype.kind == "f":
                                nn_b = ~np.isnan(arr)
                                dv = np.nan_to_num(arr).astype(np.int64)
                            else:
                                nn_b = np.ones(len(arr), dtype=bool)
                                dv = arr.astype(np.int64)
                        info = np.iinfo(np.int64)
                        acc = np.full(width, info.max if fn_name == "min"
                                      else info.min, dtype=np.int64)
                        ufn = (np.minimum if fn_name == "min"
                               else np.maximum)
                        ufn.at(acc, ck[nn_b], dv[nn_b])
                        nn = np.bincount(ck[nn_b], minlength=width)
                        s = pd.Series(acc[live], dtype="Int64")
                        s[nn[live] == 0] = pd.NA
                        cols["m%d" % i] = s
                        continue
                    if fn_name == "count":
                        part = counts
                    elif fn_name == "count_col" and a["col"] == group_col:
                        part = counts.copy()
                        part[0] = 0  # COUNT(g): NULL g rows don't count
                    else:
                        d = decoded[a["col"]]
                        if fn_name == "count_col":
                            part = np.bincount(
                                ck, weights=_notna_i64(d).astype(
                                    np.float64),
                                minlength=width).astype(np.int64)
                        else:
                            part = exact_weighted_bincount(ck, d)
                            part = np.pad(part, (0, width - len(part)))
                            nn = np.bincount(ck, weights=_notna_i64(d)
                                             .astype(np.float64),
                                             minlength=width)
                            cols["nn%d" % i] = pd.Series(
                                nn[live].astype(np.int64))
                    if fn_name == "sum":
                        cols["s%d" % i] = pd.Series(
                            [str(int(v)) for v in part[live]],
                            dtype=object)
                    else:
                        part = np.pad(part, (0, max(0, width - len(part))))
                        cols["c%d" % i] = pd.Series(
                            part[live].astype(np.int64))
                yield pd.DataFrame(cols)

    part = scan.mapInPandas(fn, ", ".join(out_fields))
    final = []
    for i, a in enumerate(aggs):
        if a["fn"] in ("min", "max"):
            # NULL partials (all-null group slice) are skipped by
            # MIN/MAX; an everywhere-null group correctly yields NULL
            final.append((F.min if a["fn"] == "min" else F.max)
                         (F.col("m%d" % i)).cast("long")
                         .alias(a["alias"]))
        elif a["fn"] == "sum":
            final.append(
                F.when(F.sum("nn%d" % i) > 0,
                       F.sum(F.col("s%d" % i).cast("decimal(38,0)"))
                       .cast("long"))
                .otherwise(F.lit(None).cast("long")).alias(a["alias"]))
        else:
            final.append(F.sum("c%d" % i).cast("long").alias(a["alias"]))
    res = (part.groupBy("g").agg(*final)
           .withColumnRenamed("g", group_col))
    return res, {"total_chunks": n_chunks, "scanned_chunks": scanned,
                 "pruned_chunks": n_chunks - scanned,
                 "dict_fast_chunks": scanned,
                 "where_specs": len(where), "group_kernel": True}


def dict_distinct(spark: SparkSession, out_dir: str,
                  column: str) -> tuple[DataFrame, dict] | None:
    """SELECT DISTINCT column answered from the per-chunk dictionary
    HEAPS — a chunk's sorted symbol table holds exactly the values
    present in that chunk, so the union of heaps IS the distinct set;
    the u32 code vectors are decoded only for delete-affected chunks
    (surviving codes via one bincount — still no per-row strings).
    NULL membership comes from the manifest null counts, which stay
    exact under schema evolution and live deletes
    (`manifest_null_count`).  Scale shape: each task ships one
    <= |dict|-sized value set, then a single distinct over (chunks x
    |dict|) tiny rows — never N rows.  Returns None when the column
    is not 100% dict-coded (callers fall back)."""
    from ..codecs import dictionary

    manifest = spark.read.parquet(os.path.join(out_dir, "manifest"))
    agg = (manifest.where(F.col("column") == column)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("codec") == "dict", 1).otherwise(0))
                .alias("n_dict")).collect()[0])
    n_chunks = int(agg["n"])
    if n_chunks == 0 or int(agg["n_dict"] or 0) != n_chunks:
        return None

    chunks = (spark.read.parquet(os.path.join(out_dir, "chunks"))
              .where(F.col("column") == column)
              .select("chunk_id", "blob"))
    joined = _join_keep(chunks, _keep_mask_df(spark, out_dir))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals: set[str] = set()
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                payload = bytes(row.blob)[4:]  # strip chunk codec tag
                heap = dictionary.dictionary(payload)
                km = row.keep_mask
                if km is None:
                    vals.update(heap)
                    continue
                codes = dictionary.codes(payload)
                kb = _keep_bools(bytes(km), len(codes))
                counts = np.bincount(codes[kb].astype(np.int64),
                                     minlength=len(heap) + 1)
                vals.update(v for c, v in enumerate(heap, 1)
                            if counts[c] > 0)
        yield pd.DataFrame({"v": pd.Series(sorted(vals), dtype=object)})

    df = (joined.mapInPandas(fn, "v string").distinct()
          .withColumnRenamed("v", column))
    nulls, _ = manifest_null_count(spark, out_dir, column)
    if nulls > 0:
        df = df.unionAll(spark.range(0, 1, 1, 1).select(
            F.lit(None).cast("string").alias(column)))
    return df, {"total_chunks": n_chunks, "scanned_chunks": n_chunks,
                "pruned_chunks": 0, "dict_fast_chunks": n_chunks,
                "distinct_kernel": True}


def manifest_min_max(spark: SparkSession, out_dir: str,
                     column: str) -> tuple[int | None, int | None]:
    """Global MIN/MAX of a column answered from the manifest ALONE —
    no chunk blob is ever read (min of chunk mins / max of chunk maxes;
    SQL semantics: nulls ignored, all-null table yields (None, None)).
    On a store with live position deletes the result is a BOUND, not
    an exact live min/max (a deleted row may carry the extreme) — the
    same contract Iceberg's file stats keep under positional deletes;
    use read_decoded(...).agg(min, max) for the exact live answer."""
    m = (spark.read.parquet(os.path.join(out_dir, "manifest"))
         .where(F.col("column") == column)
         .agg(F.min("min_val").alias("mn"), F.max("max_val").alias("mx"))
         .collect()[0])
    return (None if m["mn"] is None else int(m["mn"]),
            None if m["mx"] is None else int(m["mx"]))


def read_decoded(spark: SparkSession, out_dir: str, schema: str | None = None,
                 dtypes: dict[str, str] | None = None,
                 apply_deletes: bool = True) -> DataFrame:
    """Full decoded view of an encoded table (see decode_job for the
    chunk-zip mechanics).  With schema=None the store describes itself
    via its table_schema file.  Position deletes (spark/delete_job.py)
    are subtracted by default — apply_deletes=False reads the raw
    pre-delete rows (the view a snapshot read also sees)."""
    from ..spark import decode_job, delete_job
    if schema is None:
        schema, auto_dtypes = stored_schema(spark, out_dir)
        dtypes = dtypes or auto_dtypes
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    masks = (delete_job.merged_masks(spark, out_dir)
             if apply_deletes else None)
    return decode_job.decode_chunks(chunks, schema, dtypes,
                                    delete_masks=masks)


def register_encoded_table(spark: SparkSession, out_dir: str,
                           name: str) -> DataFrame:
    """Expose an encoded store as a temp view so plain `spark.sql`
    queries run over the decoded rows — the drop-in path for a user
    switching an existing SQL workload onto this engine's storage."""
    df = read_decoded(spark, out_dir)
    df.createOrReplaceTempView(name)
    return df


def manifest_row_count(spark: SparkSession, out_dir: str) -> int:
    """Total LIVE row count answered from metadata alone: sum of
    num_elements over the store's position-0 column (every part has
    it — columns are only ever added) minus the delete sidecar's
    per-chunk n_deleted (exact: masks are OR-merged before counting).
    No chunk blob is read."""
    m = spark.read.parquet(os.path.join(out_dir, "manifest"))
    first_col = _schema_rows(spark, out_dir)[0]["name"]
    total = (m.where(F.col("column") == first_col)
             .agg(F.sum("num_elements")).collect()[0][0]) or 0
    from ..spark import delete_job
    mm = delete_job.merged_masks(spark, out_dir, check_empty=False)
    deleted = (0 if mm is None
               else mm.agg(F.sum("n_deleted")).collect()[0][0] or 0)
    return int(total) - int(deleted)


def manifest_null_count(spark: SparkSession, out_dir: str,
                        column: str) -> tuple[int, int]:
    """(null_rows, non_null_rows) for a column answered from the
    manifest ALONE, exact on SCHEMA-EVOLVED stores too: parts encoded
    before the column existed carry no manifest rows for it, and every
    one of their rows decodes as a back-filled NULL — those are counted
    via the store's position-0 column, which every part has (columns
    are only ever added, never removed).

    On a store with live position deletes the answer stays exact and
    stays CHEAP: clean chunks still come from the manifest; only the
    delete-affected chunks of this column (O(affected) blob reads)
    decode to intersect their null mask with the keep mask, and
    evolved parts' virtual nulls subtract the part's deleted-row count
    from the sidecar metadata."""
    m = spark.read.parquet(os.path.join(out_dir, "manifest"))
    first_col = _schema_rows(spark, out_dir)[0]["name"]
    rows = (m.where(F.col("column") == first_col)
            .groupBy("part_id")
            .agg(F.sum("num_elements").alias("part_rows")))
    col_man = m.where(F.col("column") == column)
    from ..spark import delete_job
    # check_empty=False: skips the one-job zero-row probe; an
    # empty-but-present sidecar then flows through the delete path,
    # where empty joins yield the same answer
    mm = delete_job.merged_masks(spark, out_dir, check_empty=False)
    if mm is None:
        col_stats = (col_man.groupBy("part_id")
                     .agg(F.sum("null_count").alias("nulls"),
                          F.sum("num_elements").alias("elems")))
        agg = (rows.join(col_stats, "part_id", "left")
               .agg(F.sum(F.coalesce(F.col("nulls"),
                                     F.col("part_rows"))).alias("n"),
                    F.sum(F.coalesce(F.col("elems") - F.col("nulls"),
                                     F.lit(0))).alias("nn"))
               .collect()[0])
        return int(agg["n"] or 0), int(agg["nn"] or 0)

    # masks stay DISTRIBUTED (the same _keep_mask_df join every pruned
    # reader uses): the former driver-side mask collect put
    # O(affected_chunks x rows/8) bytes on the driver and in every task
    # closure — a corpus-wide delete at 10^12 rows is ~125 GB
    mask_ids = mm.select("chunk_id")
    # clean chunks: manifest stats are live
    clean_df = (col_man.join(mask_ids, "chunk_id", "left_anti")
                .agg(F.sum("null_count").alias("n"),
                     F.sum(F.col("num_elements")
                           - F.col("null_count")).alias("nn")))
    # affected chunks of THIS column: decode, null/keep intersect —
    # each task reads only its own chunks' masks via the join
    aff = (spark.read.parquet(os.path.join(out_dir, "chunks"))
           .where(F.col("column") == column)
           .join(mm.select("chunk_id", "mask"), "chunk_id")
           .select("chunk_id", "blob", "mask"))

    def live_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            a = b = 0
            for blob, mask in zip(pdf["blob"], pdf["mask"]):
                s = pd.Series(chunk_codec.decode_column(bytes(blob)))
                kb = _keep_bools(bytes(mask), len(s))
                isna = s.isna().to_numpy(dtype=bool)
                a += int((isna & kb).sum())
                b += int((~isna & kb).sum())
            yield pd.DataFrame({"n": [a], "nn": [b]})

    # the clean-chunk aggregate, the affected-chunk scan and the
    # evolved-part correction are three independent jobs: overlap them.
    # Evolved parts (no manifest rows for the column): all live rows
    # are virtual NULLs — the part's deleted count comes off the top,
    # aggregated store-side (no driver loop over parts)
    clean, la, virt = _overlap(
        lambda: clean_df.collect()[0],
        lambda: (aff.mapInPandas(live_fn, "n long, nn long")
                 .agg(F.sum("n").alias("n"),
                      F.sum("nn").alias("nn")).collect()[0]),
        lambda: (rows.join(col_man.select("part_id").distinct(),
                           "part_id", "left_anti")
                 .join(mm.groupBy("part_id")
                       .agg(F.sum("n_deleted").alias("nd")),
                       "part_id", "left")
                 .agg(F.sum(F.col("part_rows")
                            - F.coalesce(F.col("nd"), F.lit(0))).alias("v"))
                 .collect()[0]))
    n = int(clean["n"] or 0) + int(la["n"] or 0) + int(virt["v"] or 0)
    nn = int(clean["nn"] or 0) + int(la["nn"] or 0)
    return n, nn
