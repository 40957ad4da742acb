"""Source/sink format breadth: the engine round-trips its tables through
the formats a training-data pipeline meets in the wild — JSONL (corpus
wire format), ORC, and parquet (canonical). Schema and values must
survive each round-trip."""

from __future__ import annotations

import os

import pytest

from .conftest import SF_ORACLE

BASE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "formats")


@pytest.mark.parametrize("fmt", ["json", "orc", "parquet"])
def test_documents_roundtrip(spark, fmt):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    path = os.path.join(BASE, fmt)
    docs.write.mode("overwrite").format(fmt).save(path)
    back = (
        spark.read.schema(docs.schema).format(fmt).load(path)
        if fmt == "json"  # JSON is schemaless on disk; supply the schema
        else spark.read.format(fmt).load(path)
    )
    assert back.schema.simpleString() == docs.schema.simpleString()
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
