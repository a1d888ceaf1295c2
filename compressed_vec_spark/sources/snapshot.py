"""Snapshot (time-travel) reads over an encoded store's append log.

Every append_table batch reserves a CONTIGUOUS, MONOTONICALLY INCREASING
part-id range, recorded in {out_dir}/append_log BEFORE any chunk is
written (spark/encode_job.py append_table), and compaction never moves
rows across parts — so the store's history is totally ordered by part
id, and "the table as of batch B" is exactly the chunk partitions with
part_id < part_offset_B + n_parts_B.

That turns a snapshot read into pure parquet PARTITION PRUNING: the
chunks dataset is partitioned by part_id, so `part_id < cutoff` is
resolved from directory listings alone and no chunk outside the
snapshot is ever opened, at any store size.  Iceberg-style time travel
on the engine's own metadata, with zero extra state: the append log the
ingest loop already writes for idempotence doubles as the snapshot
history.

Semantics mirror Iceberg's snapshot reads (reference: the north rule's
Iceberg-table framing; Apache Iceberg spec "Snapshots"):
 - list_snapshots: ordered history — the base encode plus each batch.
 - read_snapshot:  decoded DataFrame as of a batch (or the base table).
 - snapshot_diff:  only the rows a batch ADDED (incremental consumers).

Caveat (documented, enforced): a RETRIED append rewrites its reserved
parts in place, so history is immutable only per committed batch_id —
the same contract append_table itself states.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Pseudo batch id naming the original encode_table output (every part
#: below the first append's reserved range).
BASE_SNAPSHOT = "<base>"


def _log_rows(spark: SparkSession, out_dir: str) -> list[dict]:
    """append_log rows ordered by part_offset (== commit order: each
    new batch reserves strictly above every earlier reservation)."""
    from ..spark.encode_job import _fs_exists
    path = os.path.join(out_dir, "append_log")
    if not _fs_exists(spark, path):
        return []
    rows = spark.read.parquet(path).collect()
    return sorted(
        ({"batch_id": r["batch_id"], "part_offset": int(r["part_offset"]),
          "n_parts": int(r["n_parts"])} for r in rows),
        key=lambda d: d["part_offset"])


def list_snapshots(spark: SparkSession, out_dir: str) -> list[dict]:
    """Ordered snapshot history: [{batch_id, part_lo, part_hi}] with
    part_hi EXCLUSIVE.  First entry is always BASE_SNAPSHOT (the
    original encode), even when no batch was ever appended."""
    log = _log_rows(spark, out_dir)
    base_hi = log[0]["part_offset"] if log else None
    if base_hi is None:
        mx = (spark.read.parquet(os.path.join(out_dir, "chunks"))
              .agg(F.max("part_id")).collect()[0][0])
        base_hi = (int(mx) + 1) if mx is not None else 0
    snaps = [{"batch_id": BASE_SNAPSHOT, "part_lo": 0, "part_hi": base_hi}]
    snaps += [{"batch_id": r["batch_id"], "part_lo": r["part_offset"],
               "part_hi": r["part_offset"] + r["n_parts"]} for r in log]
    return snaps


def _snapshot_bounds(spark: SparkSession, out_dir: str,
                     batch_id: str) -> dict:
    for s in list_snapshots(spark, out_dir):
        if s["batch_id"] == batch_id:
            return s
    known = [s["batch_id"] for s in list_snapshots(spark, out_dir)]
    raise ValueError(
        f"read_snapshot: unknown batch_id {batch_id!r}; store history is "
        f"{known}")


def snapshot_chunks(spark: SparkSession, out_dir: str,
                    as_of: str | None = None) -> DataFrame:
    """The store's chunk rows as of a batch — the raw (still-encoded)
    surface every pruned reader consumes.  as_of=None returns the
    current table; the part_id predicate is partition pruning on the
    chunks parquet, so out-of-snapshot chunks are never listed as
    input files, let alone decoded."""
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    if as_of is None:
        return chunks
    cutoff = _snapshot_bounds(spark, out_dir, as_of)["part_hi"]
    return chunks.where(F.col("part_id") < F.lit(cutoff))


def read_snapshot(spark: SparkSession, out_dir: str,
                  as_of: str | None = None) -> DataFrame:
    """Decoded view of the store as of a batch (None = current,
    BASE_SNAPSHOT = the original encode before any append)."""
    from ..spark import decode_job
    from .encoded_table import stored_schema
    schema, dtypes = stored_schema(spark, out_dir)
    return decode_job.decode_chunks(
        snapshot_chunks(spark, out_dir, as_of), schema, dtypes)


def snapshot_diff(spark: SparkSession, out_dir: str,
                  batch_id: str) -> DataFrame:
    """Only the decoded rows `batch_id` ADDED — the incremental-consumer
    read (process each crawl batch exactly once, straight off the
    store).  For BASE_SNAPSHOT this is the base table itself."""
    from ..spark import decode_job
    from .encoded_table import stored_schema
    b = _snapshot_bounds(spark, out_dir, batch_id)
    chunks = (spark.read.parquet(os.path.join(out_dir, "chunks"))
              .where((F.col("part_id") >= F.lit(b["part_lo"]))
                     & (F.col("part_id") < F.lit(b["part_hi"]))))
    schema, dtypes = stored_schema(spark, out_dir)
    return decode_job.decode_chunks(chunks, schema, dtypes)
