from amsterdam_map_data_wrangling_spark.sources.registry import load_tables, register_views

__all__ = ["load_tables", "register_views"]
