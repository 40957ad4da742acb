"""Streaming MinHash/LSH near-dup detection (streaming/neardup.py):
signature-construction parity with the batch path, cross-micro-batch
first-wins flagging, and the bounded-state admission cap."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.dedup import (
    minhash_signatures,
    shingle_hashes,
    with_minhash_sigs,
)
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
from amsterdam_map_data_wrangling_spark.streaming.neardup import (
    doc_verdicts,
    near_dup_hits_stream,
)

from .conftest import SF_SMALL

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _text(seed: int, n: int = 24) -> str:
    # deterministic 24-token soup, distinct across seeds: token t of doc
    # s is words[(s*7 + t*t) % 20] + a per-doc suffix on every 5th token
    return " ".join(
        _WORDS[(seed * 7 + t * t) % len(_WORDS)]
        + (str(seed) if t % 5 == 0 else "")
        for t in range(n)
    )


def _corpus():
    originals = [(i, _text(i)) for i in range(1, 13)]
    # exact copies of 1..4 and one-token-appended near-dups of 5..8,
    # all with later ids (arrive in the second micro-batch)
    exact = [(100 + i, t) for i, t in originals[:4]]
    near = [(200 + i, t + " zulu") for i, t in originals[4:8]]
    fresh = [(300 + i, _text(50 + i)) for i in range(4)]
    return originals, exact + near + fresh


def test_with_minhash_sigs_matches_batch_construction(spark):
    docs = load_tables(spark, SF_SMALL, ["documents"])["documents"]
    k, w = 16, 3
    batch = minhash_signatures(shingle_hashes(docs, "doc_id", "text", w), k)
    narrow = (
        with_minhash_sigs(docs, "doc_id", "text", w, k)
        .filter(F.col("h0").isNotNull())
        .select("doc_id", *[f"h{i}" for i in range(k)])
    )
    assert sorted(tuple(r) for r in narrow.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )


def _run_stream(spark, in_dir, name, **kwargs):
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    hits = near_dup_hits_stream(stream, **kwargs)
    (
        hits.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name)


def test_first_wins_flagging_across_microbatches(spark, tmp_path):
    base = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), ".tmp", "neardup_stream"
    )
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    originals, later = _corpus()
    df1 = spark.createDataFrame(originals, "doc_id long, text string")
    df2 = spark.createDataFrame(later, "doc_id long, text string")
    df1.coalesce(1).write.mode("overwrite").parquet(in_dir)
    time.sleep(1.1)  # strictly later mtime → second micro-batch
    df2.coalesce(1).write.mode("append").parquet(in_dir)

    hits = _run_stream(spark, in_dir, "t_neardup_hits", threshold=0.5)
    all_docs = df1.unionByName(df2)
    v = {
        r.doc_id: r
        for r in doc_verdicts(all_docs, hits).collect()
    }
    assert len(v) == len(originals) + len(later)
    # originals are representatives: never flagged
    for i, _ in originals:
        assert not v[i].is_near_dup, f"original {i} wrongly flagged"
    # exact copies: flagged against exactly their original, est = 1.0
    for i in range(1, 5):
        r = v[100 + i]
        assert r.is_near_dup and r.dup_of == i and r.est_jaccard == 1.0, r
    # appended-token near-dups: flagged against their original with a
    # high (but sub-1) agreement estimate
    for i in range(5, 9):
        r = v[200 + i]
        assert r.is_near_dup and r.dup_of == i, r
        assert r.est_jaccard >= 0.5, r
    # fresh docs: unflagged
    for i in range(4):
        assert not v[300 + i].is_near_dup, f"fresh {300 + i} flagged"


def test_admission_cap_zero_disables_flagging(spark):
    """max_reps_per_bucket bounds state ADMISSION: with a 0 cap no doc
    ever becomes a representative, so even exact copies pass unflagged —
    the saturation degradation is recall, never memory."""
    base = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), ".tmp", "neardup_cap0"
    )
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    rows = [(1, _text(1)), (2, _text(1))]  # exact pair, same batch
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(in_dir)
    hits = _run_stream(
        spark, in_dir, "t_neardup_cap0", max_reps_per_bucket=0
    )
    assert hits.count() == 0


def test_bucket_state_survives_checkpoint_restart(spark, tmp_path):
    """First-wins must hold ACROSS query restarts: docs registered as
    representatives before a stop still flag duplicates that arrive
    after the resume (parquet sink + shared checkpoint — the same
    fault-tolerant drain pattern as the WARC-ingest resume test)."""
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    originals, _ = _corpus()
    spark.createDataFrame(
        originals, "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            near_dup_hits_stream(stream, threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    assert drain().count() == 0  # originals only: no hits yet

    # exact copies land AFTER the first drain committed its state
    time.sleep(1.1)
    spark.createDataFrame(
        [(100 + i, t) for i, t in originals[:4]],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    hits = drain()  # resumes from the SAME checkpoint
    flagged = {
        r.doc_id: r.dup_of for r in hits.select("doc_id", "dup_of").collect()
    }
    assert flagged == {100 + i: i for i in range(1, 5)}


def test_state_ttl_expires_idle_buckets(spark, tmp_path):
    """With a processing-time TTL, an idle bucket's representatives are
    dropped: a duplicate arriving after expiry is RE-ADMITTED as the new
    representative instead of flagged (the bounded-horizon trade the
    module doc prescribes: streaming dedup within the horizon, batch
    jobs beyond it). Timers fire on the next micro-batch after expiry,
    so an unrelated middle batch advances the clock."""
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    originals, _ = _corpus()

    def land(rows):
        time.sleep(1.1)
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            near_dup_hits_stream(stream, threshold=0.5, state_ttl_ms=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    land(originals[:1])              # batch 1: doc 1 registered, timer 1 ms
    land([(300, _text(99))])         # batch 2: expires doc 1's bucket
    land([(101, originals[0][1])])   # batch 3: exact copy — NOT flagged
    assert drain().count() == 0
