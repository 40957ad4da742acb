"""Star-schema loader: parquet dir → DataFrames + catalog views.

Replaces the reference's CSV→SQLite import step (``Readme.md:11``,
SURVEY.md §3.2): in Spark the parquet scan *is* the load, and a temp
view registration is the catalog entry. Scans stay lazy; Catalyst prunes
columns and pushes filters into the parquet reader, so "loading" all ten
tables costs nothing until a query runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from amsterdam_map_data_wrangling_spark.schemas import STAR_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Lazy DataFrames for each star-schema table under ``sf_dir``."""
    names = tables if tables is not None else STAR_TABLES
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = _fix_nanos(spark.read.parquet(path))
    return out


def _fix_nanos(df: DataFrame) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as long ns (via
    ``spark.sql.legacy.parquet.nanosAsLong``); convert to timestamp.
    Only ``events.ts`` is affected in the testdata."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
    return df


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (SQL entry point)."""
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
