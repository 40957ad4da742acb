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


def test_corpus_to_training_shards_composition(spark, tmp_path):
    """The r16 tail of the pipeline, composed: WARC landing →
    documents_from_warc (ingest-width guardrail ON) → exact-dup drop →
    quality floor → deterministic training-order shuffle → sharded
    parquet corpus. Pins that the stages compose (schemas line up, the
    guardrail's part identity survives the hops) and the written shards
    are a reproducible permutation of the curated rows with every row
    width under the cap."""
    from amsterdam_map_data_wrangling_spark.operators.packing import (
        training_order_shuffle,
    )
    from amsterdam_map_data_wrangling_spark.sources.archives import (
        documents_from_warc,
    )

    land = tmp_path / "landing"
    land.mkdir()
    _shard(land, 0, 6)
    _shard(land, 1, 5)
    # one shard with a HUGE page (the guardrail's reason to exist) and
    # an exact duplicate of a shard-0 page (the dedup stage's)
    from .test_archives import _warc_record

    big_html = ("<html><body>" + " ".join(
        f"w{i}" for i in range(3_000)
    ) + "</body></html>").encode()
    dup_body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><h1>Doc 0-1</h1><p>par one</p></body></html>"
    )
    (land / "shard_02.warc").write_bytes(
        _warc_record("big", "response", "http://big.test/",
                     b"HTTP/1.1 200 OK\r\n\r\n" + big_html,
                     content_type="application/http; msgtype=response")
        + _warc_record("dupe", "response", "http://dupe.test/", dup_body,
                       content_type="application/http; msgtype=response")
    )

    cap = 4_000
    docs = documents_from_warc(spark, str(land), max_doc_chars=cap)

    # curation: drop exact duplicate TEXTS (keep min doc_id per md5),
    # floor tiny fragments
    curated = (
        docs.withColumn("fp", F.md5("text"))
        .withColumn(
            "keep",
            F.row_number().over(
                __import__("pyspark").sql.window.Window.partitionBy(
                    "fp"
                ).orderBy("doc_id", "part_idx")
            ),
        )
        .filter((F.col("keep") == 1) & (F.col("n_chars") >= 20))
        .drop("fp", "keep")
    )
    n_curated = curated.count()
    # the duplicate page text appears twice pre-curation, once after
    assert docs.count() == n_curated + 1

    shuffled = training_order_shuffle(curated, "doc_id", shards=4, seed="ep0")
    out = str(tmp_path / "train")
    shuffled.write.partitionBy("_shard").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == n_curated
    # every training row respects the ingest cap
    assert back.filter(F.length("text") > cap).count() == 0
    # the big page arrived as multiple parts under one doc_id
    parts = back.filter(F.col("n_parts") > 1)
    assert parts.count() >= 2
    # reproducible: same seed → identical (doc_id, part_idx, shard, rank)
    again = training_order_shuffle(curated, "doc_id", shards=4, seed="ep0")
    key = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.part_idx, r._shard, r._rank)
        for r in df.select("doc_id", "part_idx", "_shard", "_rank").collect()
    )
    assert key(again) == key(back)
