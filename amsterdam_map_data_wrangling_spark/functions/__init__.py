from amsterdam_map_data_wrangling_spark.functions.cleaning import (
    LOWER_COLON_PATTERN,
    PROBLEMCHARS_PATTERN,
    clean_tag_value,
    is_problematic_key,
    normalize_phone,
    normalize_postcode,
    split_tag_key,
)
from amsterdam_map_data_wrangling_spark.functions.text import (
    fingerprint,
    lexical_diversity,
    marker_score,
    rolling_fingerprint,
    token_count,
    tokens,
)

__all__ = [
    "LOWER_COLON_PATTERN",
    "PROBLEMCHARS_PATTERN",
    "clean_tag_value",
    "is_problematic_key",
    "normalize_phone",
    "normalize_postcode",
    "split_tag_key",
    "fingerprint",
    "lexical_diversity",
    "marker_score",
    "rolling_fingerprint",
    "token_count",
    "tokens",
]
