"""Multimodal plumbing query, oracle-gated.

The binary payloads are fabricated from document text (this container has
no media files or decode libraries — see ``operators/multimodal.py``), but
the plan is the real thing: binary column → Arrow-batched ``mapInPandas``
feature extraction. DuckDB verifies the features (octet length + sha256)
computed through the Python path bit-for-bit.
"""

from __future__ import annotations

from amsterdam_map_data_wrangling_spark.operators.multimodal import (
    as_media_table,
    extract_features,
)
from amsterdam_map_data_wrangling_spark.plans.catalog import _t, query


@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           substr(sha256(text), 1, 16) AS sha16
    FROM documents
    """,
    "Multimodal feature extraction: text→binary payload (stand-in for "
    "image/audio bytes), then an Arrow-batched mapInPandas stage computes "
    "per-asset features (byte length, sha256 prefix). The ONLY Python-path "
    "query in the catalog — deliberately, to keep the pandas-UDF extension "
    "point (SURVEY §2.10) exercised and gated. Scale: batches stream "
    "through Arrow; payload column pruned everywhere else.",
)
def multimodal_features(spark, sf_dir):
    (documents,) = _t(spark, sf_dir, "documents")
    media = as_media_table(documents, "doc_id", "text")
    return extract_features(media)
