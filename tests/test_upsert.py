"""Partition-pruned upsert: correctness AND the pruning property —
untouched partition directories must keep their files byte-for-byte."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.upsert import (
    merge_keep_latest,
    partition_pruned_upsert,
)

BASE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "upsert")


def _files_with_mtime(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_merge_keep_latest_semantics(spark):
    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")], "k long, v long, x string"
    )
    updates = spark.createDataFrame(
        [(2, 2, "B"), (2, 1, "tie-goes-to-update"), (4, 1, "d")],
        "k long, v long, x string",
    )
    got = {
        r.k: (r.v, r.x)
        for r in merge_keep_latest(base, updates, "k", "v").collect()
    }
    assert got == {
        1: (1, "a"),  # untouched
        2: (2, "B"),  # higher version wins
        3: (2, "c"),  # untouched
        4: (1, "d"),  # insert
    }
    # version tie on the same key: update side wins
    got_tie = {
        r.k: r.x
        for r in merge_keep_latest(
            base, updates.filter(F.col("x") == "tie-goes-to-update"), "k", "v"
        ).collect()
    }
    assert got_tie[2] == "tie-goes-to-update"


def test_upsert_rewrites_only_affected_partitions(spark):
    import shutil

    shutil.rmtree(BASE, ignore_errors=True)
    rows = [(k, 1, f"v{k}", k % 4) for k in range(40)]
    df = spark.createDataFrame(rows, "k long, ver long, val string, p int")
    df.write.partitionBy("p").parquet(BASE)
    before = _files_with_mtime(BASE)

    updates = spark.createDataFrame(
        [(1, 2, "UPDATED", 1), (101, 1, "NEW", 1)],
        "k long, ver long, val string, p int",
    )
    parts = partition_pruned_upsert(spark, BASE, updates, "k", "ver", "p")
    assert parts == [1]

    after = _files_with_mtime(BASE)
    untouched_before = {f: m for f, m in before.items() if "p=1" not in f}
    untouched_after = {f: m for f, m in after.items() if "p=1" not in f}
    # the pruning property: every file outside p=1 survives IDENTICALLY
    assert untouched_before == untouched_after
    # p=1 was rewritten (its old files are gone)
    assert not set(f for f in before if "p=1" in f) & set(after)

    final = spark.read.parquet(BASE)
    assert final.count() == 41  # 40 original + 1 insert
    got = {r.k: (r.ver, r.val) for r in final.filter("p = 1").collect()}
    assert got[1] == (2, "UPDATED")
    assert got[101] == (1, "NEW")
    assert got[5] == (1, "v5")  # same-partition key untouched by the merge
    # other partitions fully intact
    assert spark.read.parquet(BASE).filter("p = 2").count() == 10


def test_streaming_cdc_apply_via_foreach_batch(spark):
    """The CDC-apply pattern: a stream of keyed updates drained through
    foreachBatch(partition_pruned_upsert) — each micro-batch merges into
    the partitioned parquet target, rewriting only touched partitions.
    After the drain the target equals a batch keep-latest merge of
    base + all updates."""
    import shutil

    target = os.path.join(BASE, "cdc_target")
    feed = os.path.join(BASE, "cdc_feed")
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)
    # a stale checkpoint would make the re-run see zero new files
    shutil.rmtree(os.path.join(BASE, "cdc_ckpt"), ignore_errors=True)

    rows = [(k, 1, f"v{k}", k % 3) for k in range(30)]
    schema = "k long, ver long, val string, p int"
    spark.createDataFrame(rows, schema).write.partitionBy("p").parquet(target)

    updates = [(3, 2, "U3", 0), (4, 2, "U4", 1), (200, 1, "NEW", 2)]
    spark.createDataFrame(updates, schema).write.parquet(feed)

    def apply_batch(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        partition_pruned_upsert(batch_df.sparkSession, target, batch_df, "k", "ver", "p")

    (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .parquet(feed)
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(BASE, "cdc_ckpt")
        )
        .start()
        .awaitTermination()
    )

    want = {
        r.k: (r.ver, r.val)
        for r in merge_keep_latest(
            spark.createDataFrame(rows, schema),
            spark.createDataFrame(updates, schema),
            "k",
            "ver",
        ).collect()
    }
    got = {r.k: (r.ver, r.val) for r in spark.read.parquet(target).collect()}
    assert got == want
    assert got[3] == (2, "U3") and got[200] == (1, "NEW")
