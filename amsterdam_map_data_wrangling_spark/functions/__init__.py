from amsterdam_map_data_wrangling_spark.functions.cleaning import (
    LOWER_COLON_PATTERN,
    PROBLEMCHARS_PATTERN,
    is_problematic_key,
    normalize_phone,
    normalize_postcode,
    split_tag_key,
)

__all__ = [
    "LOWER_COLON_PATTERN",
    "PROBLEMCHARS_PATTERN",
    "is_problematic_key",
    "normalize_phone",
    "normalize_postcode",
    "split_tag_key",
]
