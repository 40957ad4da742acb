"""OSM XML source: the Spark-native replacement for the reference's
``ET.iterparse`` streaming scan (``amsterdam_map_data_wrangling.py:179-186``,
SURVEY.md §2.1 S1/S2).

Spark 4's built-in XML data source parses each ``rowTag`` occurrence into a
row; nested ``<tag>``/``<nd>`` children land as ``array<struct>`` columns.
The reference's bounded-memory trick (``root.clear()``) is played by Spark's
partitioned, batched input — no whole-document materialization.

The element-kind filter (S2: relations dropped, ``:227``) happens at the
parser via ``rowTag`` selection: ``relation`` elements are simply never
parsed, which is stronger than a post-hoc ``filter``.

Scale note (100 TB): a single XML document is not splittable mid-element, so
parallelism is per-file — at scale the input should be many OSM extract
files (or pre-converted to Parquet via :func:`amsterdam_map_data_wrangling_spark.pipeline.run_pipeline`,
after which every downstream query reads columnar splittable storage). The
many-file path is PROVEN, not prose: ``tests/test_reference_parity.py::
test_many_file_osm_ingest_parallelism_and_parity`` shards the 22,391-way
parity corpus into 8 files, reads them with one :func:`read_osm` call, and
asserts >= 8 input partitions plus row-identical shaped tables vs the
single-file read. An explicit schema is always passed so Spark never runs a
sampling pass over the input to infer one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amsterdam_map_data_wrangling_spark.schemas import OSM_NODE_RAW, OSM_WAY_RAW

_SCHEMAS = {"node": OSM_NODE_RAW, "way": OSM_WAY_RAW}


def read_osm(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Read every ``<node>`` or ``<way>`` element of the OSM file(s) at
    ``path`` into a raw DataFrame (attributes prefixed ``_``, children as
    ``tag``/``nd`` struct arrays)."""
    if kind not in _SCHEMAS:
        raise ValueError(f"kind must be 'node' or 'way', got {kind!r}")
    return (
        spark.read.format("xml")
        .option("rowTag", kind)
        .option("attributePrefix", "_")
        # XML attribute values keep surrounding whitespace (the reference's
        # ET.iterparse does); the Spark XML default would trim it.
        .option("ignoreSurroundingSpaces", "false")
        .schema(_SCHEMAS[kind])
        .load(path)
    )
