"""Partition-pruned upsert: merge keyed updates into a partitioned
parquet dataset by rewriting ONLY the partitions the updates touch.

The incremental-maintenance pattern every 100 TB table needs without a
table format: with ``spark.sql.sources.partitionOverwriteMode=dynamic``,
an ``overwrite`` insert replaces exactly the partition directories
present in the written DataFrame — untouched partitions keep their
files byte-for-byte. Cost scales with the updated partitions, not the
table. (Delta/Iceberg refine this to file-level with a transaction log;
the partition-level form is what plain parquet supports, and the merge
semantics are identical.)

Merge semantics: keep the highest-``version`` row per key; ties break to
the update side. Keys new to a partition insert; existing keys update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_keep_latest(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    version_col: str,
) -> DataFrame:
    """Union base + updates, keep one row per key: highest version wins,
    update side wins version ties. One shuffle on the key; no join."""
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key_col).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def partition_pruned_upsert(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    key_col: str,
    version_col: str,
    part_col: str,
) -> list:
    """Upsert ``updates`` into the ``part_col``-partitioned parquet
    dataset at ``base_dir``; returns the partition values rewritten.

    Reads ONLY the affected partitions (partition-pruning filter on the
    scan), merges keep-latest, and writes with dynamic partition
    overwrite so untouched partition directories are never rewritten.
    Scale: work ∝ affected partitions; the merge is one shuffle on the
    key within that slice."""
    parts = [r[0] for r in updates.select(part_col).distinct().collect()]
    base = spark.read.parquet(base_dir).filter(F.col(part_col).isin(parts))
    merged = merge_keep_latest(base, updates, key_col, version_col)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(base_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return parts
