"""Query catalog package — importing it registers every query module."""

from amsterdam_map_data_wrangling_spark.plans import (  # noqa: F401
    dedup,
    features,
    geo,
    multimodal,
    queries,
    r08_queue,
    similarity,
    sketches,
    sparse,
    text,
    windows,
    wrangling,
)
from amsterdam_map_data_wrangling_spark.plans.catalog import (
    QUERIES,
    QuerySpec,
    oracle_sql,
)
from amsterdam_map_data_wrangling_spark.plans.catalog import (
    queries as query_builders,
)

__all__ = ["QUERIES", "QuerySpec", "query_builders", "oracle_sql"]
