"""Store compaction: merge plans, passthrough identity, decode
equality, recomputed stats, and prune behavior on the compacted copy."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from compressed_vec_spark.sources import encoded_table
from compressed_vec_spark.spark import compact_job, decode_job, encode_job
from compressed_vec_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    # small arrow batches => many small chunks to compact
    s = get_spark("cvx-test-compact", cores=4, chunk_rows=500)
    yield s
    s.stop()


def _mixed_df(spark, n=4000):
    pdf = pd.DataFrame({"k": range(n)})
    pdf["host"] = ["h%02d" % (k // 200) for k in range(n)]
    pdf["v"] = pdf["k"].astype(float) / 4.0
    pdf.loc[pdf.index % 50 == 3, "v"] = None
    return (spark.createDataFrame(pdf)
            .repartitionByRange(4, "k").sortWithinPartitions("k"))


def test_plan_groups_shapes():
    ids0 = [f"p00000-c{i:05d}" for i in range(4)]
    ids1 = [f"p00001-c{i:05d}" for i in range(2)]
    plan = pd.DataFrame({
        "part_id": [0] * 4 + [1] * 2,
        "chunk_id": ids0 + ids1,
        "num_elements": [500, 500, 500, 500, 2000, 100],
    })
    m = compact_job._plan_groups(plan, target_elements=1000)
    got = {(r.part_id, r.chunk_id): r.new_seq for r in m.itertuples()}
    # part 0: 500+500 close a group, next 500+500 the second
    assert got[(0, ids0[0])] == 0 and got[(0, ids0[1])] == 0
    assert got[(0, ids0[2])] == 1 and got[(0, ids0[3])] == 1
    # part 1: the 2000-chunk already meets the target alone; the 100
    # tail starts a new group (parts never merge across the boundary)
    assert got[(1, ids1[0])] == 0 and got[(1, ids1[1])] == 1


def test_compact_streamed_store_with_colliding_chunk_seq(spark, tmp_path):
    """A streamed store's chunk_seq values collide across micro-batches
    (each batch restarts at 0; only the b-prefixed chunk_id is unique).
    Compaction must key row groups on chunk_id — and the zero-padded
    batch prefix sorts in arrival order, so row order is preserved."""
    src = str(tmp_path / "src_stream")
    chunks_path = os.path.join(src, "chunks")
    pdf = pd.DataFrame({"k": range(2000)})
    pdf["v"] = pdf["k"] * 7
    df = spark.createDataFrame(pdf).coalesce(1)
    # simulate two micro-batches the way start_encode_stream writes them
    (spark.createDataFrame([(encode_job.STORE_FORMAT_VERSION,)],
                           "format_version int")
        .write.parquet(os.path.join(src, "store_meta")))
    schema_rows = [(i, n, "bigint") for i, n in enumerate(["k", "v"])]
    (spark.createDataFrame(schema_rows,
                           "position int, name string, dtype string")
        .write.parquet(os.path.join(src, "table_schema")))
    for batch_id, pred in ((0, F.col("k") < 1000), (1, F.col("k") >= 1000)):
        enc = encode_job.encode_table(spark, df.where(pred), out_dir="",
                                      write=False, url_col=None)
        enc = enc.withColumn(
            "chunk_id",
            F.concat(F.lit(f"b{batch_id:08d}-"), F.col("chunk_id")))
        enc.write.mode("append").parquet(chunks_path)
        if batch_id == 0:
            # the second batch's manifest write "crashed": its chunks
            # are committed but unlisted — chunks/ is the data of
            # record, so compaction must still carry those rows
            (enc.select(*encode_job.MANIFEST_COLS)
                .write.mode("append").parquet(os.path.join(src, "manifest")))

    # both batches produced (part_id=0, chunk_seq=0): the collision
    c = spark.read.parquet(chunks_path)
    seqs = c.select("part_id", "chunk_seq").distinct().count()
    rows = c.select("chunk_id").distinct().count()
    assert rows > seqs

    dst = str(tmp_path / "dst_stream")
    stats = compact_job.compact_store(spark, src, dst,
                                      target_elements=10**6)
    assert stats["merged_groups"] > 0
    ddl, _ = encoded_table.stored_schema(spark, dst)
    got = decode_job.decode_chunks(
        spark.read.parquet(os.path.join(dst, "chunks")), ddl) \
        .toPandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == list(range(2000))
    assert got["v"].tolist() == [7 * k for k in range(2000)]


def test_compact_store_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    encode_job.encode_table(spark, _mixed_df(spark), src, url_col=None,
                            codec_overrides={"host": "dict"})

    stats = compact_job.compact_store(spark, src, dst,
                                      target_elements=1000,
                                      codec_overrides={"host": "dict"})
    assert stats["chunks_after"] < stats["chunks_before"]
    assert stats["merged_groups"] > 0

    # the forced codec survives the merge re-encode
    host_codecs = {r["codec"] for r in spark.read.parquet(
        os.path.join(dst, "manifest"))
        .where(F.col("column") == "host").collect()}
    assert host_codecs == {"dict"}

    # same format version, fewer manifest rows, same total elements
    assert encode_job._store_version(spark, dst) == \
        encode_job.STORE_FORMAT_VERSION
    src_m = spark.read.parquet(os.path.join(src, "manifest"))
    dst_m = spark.read.parquet(os.path.join(dst, "manifest"))
    for col in ("k", "host", "v"):
        s_n = src_m.where(F.col("column") == col) \
            .agg(F.sum("num_elements")).collect()[0][0]
        d_n = dst_m.where(F.col("column") == col) \
            .agg(F.sum("num_elements")).collect()[0][0]
        assert s_n == d_n
    assert dst_m.count() < src_m.count()

    # decoded rows identical (order-insensitive compare on key)
    ddl, _ = encoded_table.stored_schema(spark, dst)
    src_rows = decode_job.decode_chunks(
        spark.read.parquet(os.path.join(src, "chunks")), ddl) \
        .toPandas().sort_values("k").reset_index(drop=True)
    dst_rows = decode_job.decode_chunks(
        spark.read.parquet(os.path.join(dst, "chunks")), ddl) \
        .toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(src_rows, dst_rows)

    # recomputed stats still answer pruned queries exactly
    cnt, st = encoded_table.pruned_range_count(spark, dst, "k", 100, 300)
    assert cnt == 201
    cnt, _ = encoded_table.pruned_string_equals_count(
        spark, dst, "host", "h05")
    assert cnt == 200
    expect = sum(1 for k in range(400, 801) if k % 50 != 3)
    cnt, _ = encoded_table.pruned_float_range_count(
        spark, dst, "v", 100.0, 200.0)
    assert cnt == expect


def test_compact_passthrough_is_byte_identical(spark, tmp_path):
    src = str(tmp_path / "src2")
    dst = str(tmp_path / "dst2")
    encode_job.encode_table(spark, _mixed_df(spark), src, url_col=None)
    # target below every chunk size => every group is single-member
    stats = compact_job.compact_store(spark, src, dst, target_elements=1)
    assert stats["merged_groups"] == 0
    assert stats["passthrough_chunks"] == stats["chunks_before"]
    src_sha = {r["chunk_id"] + "|" + r["column"]: r["sha256"]
               for r in spark.read.parquet(os.path.join(src, "manifest"))
               .collect()}
    dst_sha = {r["chunk_id"] + "|" + r["column"]: r["sha256"]
               for r in spark.read.parquet(os.path.join(dst, "manifest"))
               .collect()}
    assert src_sha == dst_sha  # blobs untouched, ids stable


def test_id_order_key_is_numeric_not_lexicographic():
    ids = ["p00000-c100000", "p00000-c99999", "b00000002-p00000-c00000",
           "b00000010-p00000-c00000"]
    ordered = sorted(ids, key=compact_job._id_order_key)
    # c99999 < c100000 numerically (lexicographic would invert them);
    # batch 2 < batch 10 (same)
    assert ordered == ["p00000-c99999", "p00000-c100000",
                       "b00000002-p00000-c00000", "b00000010-p00000-c00000"]


def test_compact_keeps_string_stats_on_binary_codec_chunks(spark, tmp_path):
    """A string column stored under a binary codec (deflate override)
    decodes to bytes in the merge; its min_str/max_str must still be
    recomputed (decoded back from the UTF-8 bytes) or string predicates
    on the compacted store NULL-prune the merged chunks and silently
    return 0."""
    src = str(tmp_path / "src_sb")
    dst = str(tmp_path / "dst_sb")
    df = spark.range(0, 3000, 1, 2).select(
        F.col("id").alias("k"),
        F.concat(F.lit("val-"),
                 F.lpad((F.col("id") / 1000).cast("int").cast("string"),
                        2, "0")).alias("s"))
    df = df.repartitionByRange(2, "s", "k").sortWithinPartitions("s", "k")
    encode_job.encode_table(spark, df, src, url_col=None,
                            codec_overrides={"s": "deflate"})
    stats = compact_job.compact_store(spark, src, dst, target_elements=10**6,
                                      codec_overrides={"s": "deflate"})
    assert stats["merged_groups"] > 0
    m = spark.read.parquet(os.path.join(dst, "manifest"))
    s_rows = m.where(F.col("column") == "s").collect()
    assert all(r["min_str"] is not None for r in s_rows), s_rows
    cnt, st = encoded_table.pruned_string_equals_count(
        spark, dst, "s", "val-01")
    assert cnt == 1000, st


def test_compact_refuses_nonempty_dst(spark, tmp_path):
    src = str(tmp_path / "src_ne")
    encode_job.encode_table(spark, _mixed_df(spark, 500), src, url_col=None)
    dst = str(tmp_path / "dst_ne")
    compact_job.compact_store(spark, src, dst, target_elements=10**6)
    with pytest.raises(ValueError, match="already has chunks"):
        compact_job.compact_store(spark, src, dst, target_elements=10**6)


def test_compact_rejects_foreign_version(spark, tmp_path):
    src = str(tmp_path / "src3")
    (spark.createDataFrame([(1,)], "format_version int")
        .write.parquet(os.path.join(src, "store_meta")))
    with pytest.raises(ValueError, match="format v1"):
        compact_job.compact_store(spark, src, str(tmp_path / "dst3"))


def _scrambled_df(spark, n=4000):
    """k-sorted rows whose v2 column is value-scrambled: every chunk of
    a k-ordered store spans nearly the whole v2 domain, so zone maps on
    v2 prune nothing until the store is re-clustered on it."""
    pdf = pd.DataFrame({"k": range(n)})
    pdf["v2"] = (pdf["k"] * 2654435761) % n
    pdf["host"] = ["h%02d" % (k % 20) for k in range(n)]
    return (spark.createDataFrame(pdf)
            .repartitionByRange(4, "k").sortWithinPartitions("k"))


def test_cluster_store_tightens_zone_maps(spark, tmp_path):
    src = str(tmp_path / "src_cl")
    dst = str(tmp_path / "dst_cl")
    encode_job.encode_table(spark, _scrambled_df(spark), src, url_col=None,
                            codec_overrides={"host": "dict"})

    # scattered layout: the [100, 300] slice of v2 appears in nearly
    # every chunk's [min, max], so the manifest prune skips ~nothing
    # (repartitionByRange samples with a random seed, so a tiny tail
    # chunk can occasionally dodge the slice — allow one)
    cnt_src, st_src = encoded_table.pruned_range_count(
        spark, src, "v2", 100, 300)
    assert st_src["pruned_chunks"] <= 1, st_src

    stats = compact_job.cluster_store(spark, src, dst, "v2", num_parts=4,
                                      codec_overrides={"host": "dict"})
    assert stats == {"rows": 4000, "parts": 4, "cluster_by": ["v2"]}

    cnt_dst, st_dst = encoded_table.pruned_range_count(
        spark, dst, "v2", 100, 300)
    expect = sum(1 for k in range(4000)
                 if 100 <= (k * 2654435761) % 4000 <= 300)
    assert cnt_src == cnt_dst == expect
    # clustered layout: most chunks' v2 ranges miss [100, 300] entirely
    assert st_dst["pruned_chunks"] > st_dst["total_chunks"] // 2, st_dst

    # same rows, new order; forced codec survives the rewrite
    ddl, _ = encoded_table.stored_schema(spark, dst)
    src_rows = decode_job.decode_chunks(
        spark.read.parquet(os.path.join(src, "chunks")), ddl) \
        .toPandas().sort_values("k").reset_index(drop=True)
    dst_rows = decode_job.decode_chunks(
        spark.read.parquet(os.path.join(dst, "chunks")), ddl) \
        .toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(src_rows, dst_rows)
    host_codecs = {r["codec"] for r in spark.read.parquet(
        os.path.join(dst, "manifest"))
        .where(F.col("column") == "host").collect()}
    assert host_codecs == {"dict"}


def test_cluster_store_materializes_deletes(spark, tmp_path):
    from compressed_vec_spark.spark import delete_job
    src = str(tmp_path / "src_cld")
    dst = str(tmp_path / "dst_cld")
    encode_job.encode_table(spark, _scrambled_df(spark, 2000), src,
                            url_col=None, codec_overrides={"host": "dict"})
    d = delete_job.delete_where_equals(spark, src, "host", "h03", "d1")
    assert d["rows_deleted"] == 100
    stats = compact_job.cluster_store(spark, src, dst, "v2", num_parts=2)
    assert stats["parts"] == 2
    # dst is born clean: deleted rows gone from the data, no sidecar
    assert not delete_job.has_deletes(spark, dst)
    ddl, _ = encoded_table.stored_schema(spark, dst)
    dst_rows = decode_job.decode_chunks(
        spark.read.parquet(os.path.join(dst, "chunks")), ddl).toPandas()
    assert len(dst_rows) == 1900
    assert not (dst_rows["host"] == "h03").any()


def test_cluster_store_guards(spark, tmp_path):
    src = str(tmp_path / "src_clg")
    encode_job.encode_table(spark, _scrambled_df(spark, 500), src,
                            url_col=None)
    with pytest.raises(ValueError, match="not in store columns"):
        compact_job.cluster_store(spark, src, str(tmp_path / "dst_clg"),
                                  "no_such_col")
    dst = str(tmp_path / "dst_clg2")
    compact_job.cluster_store(spark, src, dst, "v2", num_parts=1)
    with pytest.raises(ValueError, match="already has chunks"):
        compact_job.cluster_store(spark, src, dst, "v2")
