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
