"""Multimodal plumbing: schema contract, Arrow batch path, honest stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    as_media_table,
    decode_stub,
    extract_features,
)

from .conftest import SF_ORACLE


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "image/png")


def test_media_table_schema_and_features(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(25)
    media = as_media_table(docs, "doc_id", "text")
    # simpleString ignores nullability (lit() columns come back non-null)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    feats = {r.media_id: r for r in extract_features(media).collect()}
    want = {r.doc_id: r.text for r in docs.collect()}
    assert set(feats) == set(want)
    for doc_id, text in want.items():
        raw = text.encode("utf-8")
        assert feats[doc_id].n_bytes == len(raw)
        assert feats[doc_id].sha16 == hashlib.sha256(raw).hexdigest()[:16]


def test_metadata_query_prunes_payload(spark):
    """A metadata-only aggregation over the media table must not read the
    payload column (column pruning through the struct)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    media = as_media_table(docs, "doc_id", "text")
    explained = (
        media.groupBy(F.col("meta.mime"))
        .agg(F.count("*").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in explained
