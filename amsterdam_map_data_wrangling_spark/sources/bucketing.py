"""Bucketed-table co-location: the write-time answer to repeated big joins.

A fact↔fact join (e.g. lineitem↔orders on orderkey, or tags↔entities on
id in the OSM schema) shuffles BOTH sides on every query. Bucketing both
tables by the join key at write time pre-partitions the data on disk, so
every subsequent join (and groupBy on the key) runs exchange-free — the
single biggest repeated-query win at 100 TB.

tests/test_bucketing.py proves the property: the physical plan of a join
between two co-bucketed tables contains NO Exchange operator.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted-within-buckets)
    catalog table. Sorting by the key additionally removes the per-task
    sort from sort-merge joins."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # with an in-memory catalog a previous session's managed-table files
    # survive as an orphan location saveAsTable refuses to overwrite
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def cobucket_star(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    keys: dict[str, str],
    num_buckets: int = 16,
) -> dict[str, DataFrame]:
    """Bucket a set of tables on their join keys (same bucket count →
    co-located join graph) and return the catalog-backed DataFrames."""
    out = {}
    for name, df in tables.items():
        write_bucketed(df, name, keys[name], num_buckets, sort_by=keys[name])
        out[name] = spark.table(name)
    return out
