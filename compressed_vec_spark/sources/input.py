"""Input-table readers for the encode pipeline.

The north rule's production input is an Iceberg table of web pages; in
environments without the Iceberg runtime jars this falls back to plain
parquet (same DataFrame downstream — the pipeline is source-agnostic).
Iceberg-specific wins when available: snapshot pinning for idempotent
resume (re-runs read the SAME snapshot), partition pruning on
host-prefix partitions, and metadata-only row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_webpages(spark: SparkSession, source: str,
                  snapshot_id: int | None = None) -> DataFrame:
    """source: an Iceberg table name (catalog.db.table) or a parquet
    path.  snapshot_id pins an Iceberg snapshot so resumed encode runs
    see identical input."""
    if "/" not in source and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source)
    return spark.read.parquet(source)
