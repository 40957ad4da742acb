"""Corpus export + checksummed manifest round trip."""

from __future__ import annotations

import os

from amsterdam_map_data_wrangling_spark.sources.export import (
    verify_manifest,
    write_jsonl_corpus,
)

from .conftest import SF_ORACLE


def test_export_manifest_roundtrip_and_verify(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = str(tmp_path / "corpus")
    manifest = write_jsonl_corpus(
        docs, out, records_per_file=100, compression="gzip"
    )
    rows = manifest.collect()
    # all rows accounted for across shards
    assert sum(r.n_rows for r in rows) == docs.count()
    assert all(r.n_bytes > 0 and len(r.md5) == 32 for r in rows)
    assert os.path.exists(os.path.join(out, "_MANIFEST.jsonl"))
    # content parity through the wire format
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # intact corpus verifies clean
    assert verify_manifest(spark, out).count() == 0


def test_manifest_catches_corruption(spark, tmp_path):
    import glob
    import gzip

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(50)
    out = str(tmp_path / "corpus2")
    write_jsonl_corpus(docs, out, records_per_file=10)
    victim = sorted(glob.glob(os.path.join(out, "part-*.json.gz")))[0]
    data = gzip.decompress(open(victim, "rb").read())
    with open(victim, "wb") as f:
        f.write(gzip.compress(data.replace(b"doc_id", b"doc_1d", 1)))
    # drop Hadoop's local-FS .crc sidecar for the victim (a transferred
    # corpus has no sidecars — the manifest is exactly for that case;
    # with the sidecar present Hadoop itself rejects the read first)
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    bad = [r.shard for r in verify_manifest(spark, out).collect()]
    assert len(bad) == 1 and victim.split("/")[-1] in bad[0]


def test_full_crawl_to_corpus_pipeline(spark, tmp_path):
    """The capstone composition: WARC ingest → HTML→text → exact-dup
    fingerprint dedup → token sizing → sequence packing → manifested
    JSONL export → consumer verification. Every stage is the engine's
    own operator; the test proves they COMPOSE."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.functions.text import (
        html_to_text,
        tokens,
    )
    from amsterdam_map_data_wrangling_spark.operators.packing import (
        pack_sequences,
    )
    from amsterdam_map_data_wrangling_spark.sources.archives import (
        read_warc_records,
    )

    # 1) a WARC with 3 responses, one an exact duplicate
    def rec(rid, uri, body_html):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + body_html
        )
        hdr = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(http)}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n\r\n"
        ).encode()
        return hdr + http + b"\r\n\r\n"

    page_a = b"<html><body><p>alpha beta gamma delta</p></body></html>"
    page_b = b"<html><body><p>unique words entirely here now</p></body></html>"
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "shard.warc").write_bytes(
        rec("r1", "http://a.example/1", page_a)
        + rec("r2", "http://b.example/2", page_b)
        + rec("r3", "http://c.example/dup", page_a)  # exact dup of r1
    )

    # 2) ingest → clean text
    docs = (
        read_warc_records(spark, str(d))
        .filter(F.col("warc_type") == "response")
        .select(
            "record_id",
            "target_uri",
            html_to_text(F.col("http_body").cast("string")).alias("text"),
        )
    )
    # 3) exact dedup on the text fingerprint (keep min record_id)
    deduped = (
        docs.withColumn("fp", F.md5("text"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("record_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    assert deduped.count() == 2  # the duplicate page collapsed
    # 4) size + pack into a 16-token context
    sized = deduped.withColumn("n_tokens", F.size(tokens(F.col("text"))))
    sized = sized.withColumn(
        "doc_key", F.abs(F.hash("record_id")).cast("long")
    )
    packed = pack_sequences(sized, "doc_key", "n_tokens", 16, shards=2)
    assert packed.count() == 2
    assert all(not r.oversize for r in packed.collect())
    # 5) export with manifest, 6) verify
    from amsterdam_map_data_wrangling_spark.sources.export import (
        verify_manifest,
        write_jsonl_corpus,
    )

    out = str(tmp_path / "corpus")
    manifest = write_jsonl_corpus(
        deduped.select("record_id", "target_uri", "text"), out
    )
    assert sum(r.n_rows for r in manifest.collect()) == 2
    assert verify_manifest(spark, out).count() == 0
