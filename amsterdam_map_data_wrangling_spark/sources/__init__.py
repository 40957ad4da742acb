from amsterdam_map_data_wrangling_spark.sources.bucketing import (
    cobucket_star,
    write_bucketed,
)
from amsterdam_map_data_wrangling_spark.sources.osm import read_osm
from amsterdam_map_data_wrangling_spark.sources.registry import (
    load_tables,
    register_views,
)

__all__ = [
    "cobucket_star",
    "load_tables",
    "read_osm",
    "register_views",
    "write_bucketed",
]
