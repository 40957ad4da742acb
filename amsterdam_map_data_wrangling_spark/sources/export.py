"""Corpus export: the shipping side of a training-data pipeline.
Datasets leave as sharded JSONL (the corpus wire format) accompanied by
a MANIFEST — per-shard row counts, byte sizes, and md5 checksums — so
the consumer can verify integrity and resume partial transfers without
trusting the filesystem.

Scale shape: the write is the built-in JSON sink (``maxRecordsPerFile``
bounds shard size; compression via codec option); the manifest is
computed DISTRIBUTED — a ``binaryFile`` scan of the written shards with
JVM-side md5/length, never a driver-side loop over files — so
manifesting a million shards is just another map job."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.sources.fs import (
    read_text_file,
    write_text_file,
)


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    records_per_file: int = 10_000,
    compression: str | None = "gzip",
) -> DataFrame:
    """Write ``df`` as sharded JSONL under ``path`` and return the
    manifest DataFrame (shard, n_rows, n_bytes, md5). The manifest is
    also persisted as ``_MANIFEST.jsonl`` next to the shards (written
    LAST — its presence marks a complete export, the poor-cluster's
    commit protocol, same role as Spark's _SUCCESS but carrying
    verifiable content)."""
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", records_per_file
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    manifest = corpus_manifest(df.sparkSession, path)
    rows = manifest.collect()  # manifests are shard-count-sized: small
    import json

    # Hadoop-FS write, not a driver-local open(): the manifest must land
    # NEXT TO the shards on whatever filesystem the export targeted
    # (hdfs://, s3a://, file:) — r7 ADVICE.
    lines = "".join(
        json.dumps(
            {
                "shard": r.shard,
                "n_rows": r.n_rows,
                "n_bytes": r.n_bytes,
                "md5": r.md5,
            }
        )
        + "\n"
        for r in rows
    )
    write_text_file(df.sparkSession, path + "/_MANIFEST.jsonl", lines)
    return manifest


def corpus_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Distributed manifest of the JSONL shards under ``path``:
    (shard, n_rows, n_bytes, md5). Row counts come from a real read of
    each shard (newline count would miscount embedded newlines —
    Spark's JSON reader is the arbiter); bytes and md5 from a
    binaryFile scan. Both are map jobs over the shard set."""
    # binaryFile yields file:/..., input_file_name() file:///... —
    # normalize both to a bare filesystem path before joining
    norm = lambda c: F.regexp_replace(c, r"^file:/+", "/")  # noqa: E731
    bins = (
        spark.read.format("binaryFile")
        .load(path)
        .filter(~F.col("path").contains("_MANIFEST"))
        .filter(~F.col("path").contains("_SUCCESS"))
        .select(
            norm(F.col("path")).alias("shard"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("md5"),
        )
    )
    counts = (
        spark.read.json(path)
        .select(norm(F.input_file_name()).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    return bins.join(counts, "shard", "left").select(
        "shard",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        "n_bytes",
        "md5",
    )


def verify_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Re-derive the manifest from the shards on disk and diff it
    against the stored ``_MANIFEST.jsonl``: returns the mismatch rows
    (empty = intact corpus). The consumer-side integrity check."""
    import json

    stored = [
        json.loads(line)
        for line in read_text_file(spark, path + "/_MANIFEST.jsonl").splitlines()
        if line.strip()
    ]
    stored_df = spark.createDataFrame(
        [(r["shard"], r["n_rows"], r["n_bytes"], r["md5"]) for r in stored],
        "shard string, n_rows long, n_bytes long, md5 string",
    )
    actual = corpus_manifest(spark, path)
    return stored_df.alias("s").join(
        actual.alias("a"), "shard", "full"
    ).filter(
        F.col("s.md5").isNull()
        | F.col("a.md5").isNull()
        | (F.col("s.md5") != F.col("a.md5"))
        | (F.col("s.n_rows") != F.col("a.n_rows"))
    ).select("shard")
