from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
