"""Explicit StructType schemas.

The reference declares its schemas as field-order lists
(``amsterdam_map_data_wrangling.py:92-96``) and relies on positional
CSV↔SQLite binding (comment at ``:91``). Here every table gets a named,
typed StructType (SURVEY.md §1.3): ids are longs, lat/lon doubles,
timestamps real timestamps — SQLite's everything-is-a-string dynamic
typing is deliberately not reproduced.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# OSM raw (XML-parsed) schemas — source model per SURVEY.md §1.1.
# Attribute columns carry the XML attribute prefix ``_`` as produced by
# Spark's built-in XML reader; tag/nd children are arrays of structs.
# ---------------------------------------------------------------------------

TAG_STRUCT = T.StructType(
    [
        T.StructField("_k", T.StringType()),
        T.StructField("_v", T.StringType()),
    ]
)

ND_STRUCT = T.StructType([T.StructField("_ref", T.LongType())])

OSM_NODE_RAW = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("_lat", T.DoubleType()),
        T.StructField("_lon", T.DoubleType()),
        T.StructField("_user", T.StringType()),
        T.StructField("_uid", T.LongType()),
        T.StructField("_version", T.IntegerType()),
        T.StructField("_changeset", T.LongType()),
        T.StructField("_timestamp", T.StringType()),
        T.StructField("tag", T.ArrayType(TAG_STRUCT)),
    ]
)

OSM_WAY_RAW = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("_user", T.StringType()),
        T.StructField("_uid", T.LongType()),
        T.StructField("_version", T.IntegerType()),
        T.StructField("_changeset", T.LongType()),
        T.StructField("_timestamp", T.StringType()),
        T.StructField("tag", T.ArrayType(TAG_STRUCT)),
        T.StructField("nd", T.ArrayType(ND_STRUCT)),
    ]
)

# ---------------------------------------------------------------------------
# OSM shaped (relational) schemas — the five output tables, typed.
# Column sets per amsterdam_map_data_wrangling.py:92-96.
# ---------------------------------------------------------------------------

NODES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("user", T.StringType()),
        T.StructField("uid", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

NODES_TAGS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)

WAYS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("user", T.StringType()),
        T.StructField("uid", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

WAYS_TAGS = NODES_TAGS

WAYS_NODES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("node_id", T.LongType(), False),
        T.StructField("position", T.IntegerType(), False),
    ]
)

#: Field order of the reference CSV outputs (amsterdam_map_data_wrangling.py:92-96),
#: kept for byte-compat export mode.
NODE_FIELDS = ["id", "lat", "lon", "user", "uid", "version", "changeset", "timestamp"]
NODE_TAGS_FIELDS = ["id", "key", "value", "type"]
WAY_FIELDS = ["id", "user", "uid", "version", "changeset", "timestamp"]
WAY_TAGS_FIELDS = ["id", "key", "value", "type"]
WAY_NODES_FIELDS = ["id", "node_id", "position"]

#: Star-schema test tables (TESTDATA.md); names double as view names.
STAR_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
