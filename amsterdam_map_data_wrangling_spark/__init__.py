"""amsterdam_map_data_wrangling_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``xmindata/Amsterdam-Map-Data-Wrangling`` (an OSM XML → relational ETL +
SQL analysis workload; see ``SURVEY.md``) as an idiomatic Spark engine:

- ``sources``    — OSM XML reader (``sources/osm.py``), star-schema loader
- ``functions``  — cleaning + text Column expressions (JVM-side, zero UDFs)
- ``operators``  — dedup (exact/MinHash/SimHash/Jaccard), similarity
  search (cosine / sign-LSH ANN), multimodal binary plumbing
- ``plans``      — the named analytical query catalog with DuckDB oracles,
  plus the reference's README SQL workload over shaped OSM views
- ``streaming``  — windowed event aggregation (batch-equivalent + stream)
- ``pipeline``   — the 1-scan-per-kind → 5-table OSM ETL job

Everything is DataFrame/SQL-first: explicit StructType schemas, built-in
``pyspark.sql.functions`` in hot paths (zero row-at-a-time Python UDFs),
Parquet storage, and plans designed to survive a 1000-executor / 100 TB
deployment (broadcast small dims, partial aggregation, pushed filters).
"""

from amsterdam_map_data_wrangling_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
