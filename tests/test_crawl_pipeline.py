"""End-to-end crawl pipeline composition: landing zone → streaming
ranged ingest (warc_split byte ranges in foreachBatch) → HTML→text
curation → checksummed JSONL corpus export → manifest verification.
Each stage has its own unit suite; this pins that the stages actually
COMPOSE — schemas line up, URIs survive the hops, and the exported
corpus round-trips the landed records."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _shard(land, a, n):
    from .test_archives import _warc_record

    body = lambda i: (  # noqa: E731
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><h1>Doc %d-%d</h1><p>par one</p></body></html>"
        % (a, i)
    )
    (land / f"shard_{a:02d}.warc").write_bytes(
        b"".join(
            _warc_record(
                f"s{a}r{i}", "response", f"http://site{a}.test/{i}",
                body(i),
                content_type="application/http; msgtype=response",
            )
            for i in range(n)
        )
    )


def test_landing_to_verified_corpus(spark, tmp_path):
    from amsterdam_map_data_wrangling_spark.functions.text import html_to_text
    from amsterdam_map_data_wrangling_spark.sources.export import (
        verify_manifest,
        write_jsonl_corpus,
    )
    from amsterdam_map_data_wrangling_spark.streaming.ingest import (
        start_ranged_warc_ingest,
    )

    land = tmp_path / "landing"
    land.mkdir()
    _shard(land, 0, 5)
    _shard(land, 1, 7)

    # 1. streaming ranged ingest into per-epoch parquet
    q = start_ranged_warc_ingest(
        spark, str(land), str(tmp_path / "records"), str(tmp_path / "ckpt"),
        split_bytes=1024, available_now=True,
    )
    q.awaitTermination()
    records = spark.read.parquet(str(tmp_path / "records"))
    assert records.count() == 12

    # 2. curation: http responses → (url, text)
    docs = (
        records.filter(F.col("warc_type") == "response")
        .select(
            F.col("record_id"),
            F.col("target_uri").alias("url"),
            html_to_text(F.col("http_body").cast("string")).alias("text"),
        )
    )
    texts = {r.record_id: r.text for r in docs.collect()}
    assert len(texts) == 12
    assert all("par one" in t and "<p>" not in t for t in texts.values())

    # 3. checksummed JSONL export + manifest verification round-trip
    out = str(tmp_path / "corpus")
    manifest = write_jsonl_corpus(docs, out, compression=None)
    assert manifest.agg(F.sum("n_rows")).collect()[0][0] == 12
    diff = verify_manifest(spark, out)
    assert diff.count() == 0, diff.collect()

    back = spark.read.json(out)
    assert {
        (r.record_id, hashlib.md5(r.text.encode()).hexdigest())
        for r in back.collect()
    } == {
        (k, hashlib.md5(v.encode()).hexdigest()) for k, v in texts.items()
    }
