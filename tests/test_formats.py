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


def test_parquet_schema_evolution_merge(spark):
    """Schema evolution — the 100 TB reality that yesterday's files have
    fewer columns than today's: an appended batch adds a column; reading
    with mergeSchema unifies the schema and null-backfills old rows,
    and column pruning on the shared columns still works."""
    from pyspark.sql import functions as F

    path = os.path.join(BASE, "evolve")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.limit(20).write.mode("overwrite").parquet(path)
    docs.filter(F.col("doc_id").between(100, 119)).withColumn(
        "quality", F.lit(0.5)
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "quality"}
    assert merged.count() == 40
    # old rows backfill null, new rows keep their value
    assert merged.filter(F.col("quality").isNull()).count() == 20
    assert merged.filter(F.col("quality") == 0.5).count() == 20
    # WITHOUT mergeSchema the footer-sampled schema may miss the new
    # column — pruning to shared columns must stay correct either way
    assert (
        spark.read.parquet(path).select("doc_id").distinct().count()
        == merged.select("doc_id").distinct().count()
    )


def test_jsonl_corrupt_record_modes(spark):
    """Malformed lines in a JSONL corpus: PERMISSIVE quarantines them in
    _corrupt_record (pipeline keeps going, bad rows auditable),
    DROPMALFORMED silently drops, FAILFAST raises — the three contracts
    an ingest stage picks between."""
    from pyspark.sql import types as T

    path = os.path.join(BASE, "corrupt")
    os.makedirs(path, exist_ok=True)
    lines = [
        '{"doc_id": 1, "text": "good row"}',
        '{"doc_id": 2, "text": "also good"}',
        '{"doc_id": 3, "text": "truncated',  # malformed
        "not json at all",  # malformed
    ]
    with open(os.path.join(path, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    permissive = spark.read.schema(schema).json(path)
    # Spark requires caching/materialization to query _corrupt_record
    # alongside data columns in one pass
    rows = permissive.cache().collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    permissive.unpersist()
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 2

    dropped = (
        spark.read.schema(
            T.StructType(schema.fields[:2])
        ).option("mode", "DROPMALFORMED").json(path)
    )
    assert {r.doc_id for r in dropped.collect()} == {1, 2}

    with pytest.raises(Exception):
        spark.read.schema(T.StructType(schema.fields[:2])).option(
            "mode", "FAILFAST"
        ).json(path).collect()


def test_avro_roundtrip_if_available(spark, tmp_path):
    """Avro round-trip — env-gated like the tws e2e drain: spark-avro is
    a built-in-but-EXTERNAL module (its jar isn't in this container and
    there's no network to fetch it), so the skip lifts automatically in
    any deployment that ships the jar. The container formats that ARE
    present (parquet/CSV/JSONL/ORC) round-trip above."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        "id", F.concat(F.lit("v"), F.col("id").cast("string")).alias("s")
    )
    path = str(tmp_path / "avro_rt")
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:
        if "Failed to find data source: avro" in str(e):
            pytest.skip("spark-avro external jar not in this container")
        raise
    back = spark.read.format("avro").load(path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_variant_and_xml_malformed_input_contracts(spark):
    """Ingestion robustness for the round-6 semi-structured surfaces:
    try_parse_json returns NULL on malformed input (the streaming-safe
    form) while parse_json raises; from_xml yields a null/partial struct
    rather than failing the task — the contracts a 100 TB ingest relies
    on when a bad record appears mid-partition."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, "{not json"), (3, None)], "id int, js string"
    )
    ok = df.select(
        "id", F.try_parse_json("js").alias("v")
    ).select("id", F.try_variant_get("v", "$.a", "int").alias("a"))
    got = {r["id"]: r["a"] for r in ok.collect()}
    assert got == {1: 1, 2: None, 3: None}
    with pytest.raises(Exception):
        df.select(F.parse_json("js")).collect()

    xdf = spark.createDataFrame(
        [(1, '<node id="7"/>'), (2, "<node id="), (3, "plain text")],
        "id int, x string",
    )
    parsed = xdf.select(
        "id", F.from_xml("x", "_id BIGINT").alias("n")
    ).select("id", F.col("n._id").alias("nid"))
    got_x = {r["id"]: r["nid"] for r in parsed.collect()}
    assert got_x[1] == 7 and got_x[2] is None and got_x[3] is None


def test_parquet_codec_parity_snappy_zstd_gzip(spark):
    """Storage-codec breadth: the same table written under snappy,
    zstd, and gzip parquet compression reads back value-identical.
    Codec choice is a 100 TB storage/CPU dial, never a semantics one
    (zstd typically wins size at similar scan cost on modern Spark)."""
    import glob

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    want = {tuple(r) for r in docs.collect()}
    sizes = {}
    for codec in ["snappy", "zstd", "gzip"]:
        path = os.path.join(BASE, f"codec_{codec}")
        docs.write.mode("overwrite").option("compression", codec).parquet(
            path
        )
        back = spark.read.parquet(path)
        assert {tuple(r) for r in back.collect()} == want
        sizes[codec] = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )
    assert all(s > 0 for s in sizes.values())
