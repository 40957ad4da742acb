"""Compaction planner math + a real small-files round trip."""

from __future__ import annotations

import os

import pytest

from amsterdam_map_data_wrangling_spark.operators.compaction import (
    compaction_plan,
    compact_parquet_dir,
)


def test_plan_respects_target_and_is_deterministic():
    sizes = [("a", 60), ("b", 50), ("c", 40), ("d", 30), ("e", 10), ("f", 200)]
    plan = compaction_plan(sizes, target_bytes=100)
    # oversized file is a singleton
    assert ["f"] in plan
    # every multi-file group fits the target
    by_name = dict(sizes)
    for g in plan:
        if len(g) > 1:
            assert sum(by_name[p] for p in g) <= 100
    # all files appear exactly once
    assert sorted(p for g in plan for p in g) == sorted(by_name)
    # deterministic: same metadata, same plan (input order irrelevant)
    assert plan == compaction_plan(list(reversed(sizes)), 100)


def test_plan_group_count_is_near_optimal():
    # 30 files of 40 bytes at target 100 → optimal 15 groups (2 each);
    # FFD must not exceed the 1.22·OPT + 1 bound (here: 19).
    sizes = [(f"f{i:02d}", 40) for i in range(30)]
    plan = compaction_plan(sizes, 100)
    assert len(plan) <= 19
    assert all(len(g) <= 2 for g in plan)


def test_plan_rejects_nonpositive_target():
    with pytest.raises(ValueError):
        compaction_plan([("a", 1)], 0)


def test_compact_parquet_dir_round_trip(spark, tmp_path):
    """16 tiny files → a handful of compacted ones, exact row parity."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    from pyspark.sql import functions as F

    base = spark.range(1600).select(
        "id", (F.col("id") % 7).alias("v")
    )
    for i in range(16):
        base.filter(F.col("id") % 16 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in >= 16

    audit = compact_parquet_dir(spark, src, dst, target_bytes=64 * 1024)
    assert audit["n_input_files"] == n_in
    assert audit["n_groups"] < n_in
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_out == audit["n_groups"]
    # exact content parity
    got = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    want = sorted(tuple(r) for r in base.collect())
    assert got == want


def test_should_compact_thresholds():
    from amsterdam_map_data_wrangling_spark.operators.compaction import (
        should_compact,
    )

    # 17k-file pathology: tiny files, huge ratio -> compact
    many = [(f"f{i}", 10_000) for i in range(17_000)]
    d = should_compact(many, target_bytes=128 * 1024 * 1024)
    assert d["compact"] and d["ideal_files"] == 2
    assert d["n_files"] == 17_000 and d["filecount_ratio"] == 8500.0

    # well-laid-out table: ~target-sized files -> leave alone
    good = [(f"g{i}", 120 * 1024 * 1024) for i in range(40)]
    assert not should_compact(good)["compact"]

    # high ratio but trivially few files -> noise, not a job
    tiny = [("a", 1_000), ("b", 1_000), ("c", 1_000)]
    t = should_compact(tiny)
    assert t["filecount_ratio"] == 3.0 and not t["compact"]

    # empty listing -> nothing to do
    assert not should_compact([])["compact"]


def test_compact_if_needed_paths(spark, tmp_path):
    import pyspark.sql.functions as F

    from amsterdam_map_data_wrangling_spark.operators.compaction import (
        compact_if_needed,
    )

    # pathological layout: 80 tiny files -> compacts
    src = str(tmp_path / "src")
    spark.range(2_000).withColumn("v", F.col("id") * 2).repartition(
        80
    ).write.parquet(src)
    dst = str(tmp_path / "dst")
    audit = compact_if_needed(
        spark, src, dst, target_bytes=64 * 1024 * 1024, min_excess_files=16
    )
    assert audit["compacted"] and audit["n_input_files"] == 80
    assert audit["n_output_rows"] == 2_000
    got = spark.read.parquet(dst)
    assert got.count() == 2_000
    assert got.agg(F.sum("v")).collect()[0][0] == 2_000 * 1_999

    # healthy layout: decision is a no-op, dst untouched
    healthy = str(tmp_path / "healthy")
    spark.range(100).coalesce(1).write.parquet(healthy)
    audit2 = compact_if_needed(
        spark, healthy, str(tmp_path / "never"), min_excess_files=16
    )
    assert not audit2["compacted"]
    import os

    assert not os.path.exists(str(tmp_path / "never"))


def test_compact_empty_src_returns_zero_audit(spark, tmp_path):
    """r16 ADVICE: a src with no matching parquet files plans zero
    groups, so nothing is written — the audit must short-circuit to the
    zero result instead of listing the never-created dst (the direct-
    caller regression the footer audit introduced)."""
    src = tmp_path / "empty_src"
    src.mkdir()
    (src / "notes.txt").write_text("not parquet")
    audit = compact_parquet_dir(
        spark, str(src), str(tmp_path / "never_dst")
    )
    assert audit == {"n_input_files": 0, "n_groups": 0, "n_output_rows": 0}
    assert not os.path.exists(str(tmp_path / "never_dst"))


def test_audit_rows_falls_back_to_spark_count(spark, tmp_path, monkeypatch):
    """r16 ADVICE: pyarrow cannot open every Hadoop scheme (s3a://
    without mapping, hdfs:// without libhdfs) — a footer-path failure
    must fall back to ONE Spark-side count of the output, never fail a
    maintenance pass whose rewrite already succeeded."""
    import pyarrow.parquet as pq

    from amsterdam_map_data_wrangling_spark.operators import compaction

    out = str(tmp_path / "out")
    spark.range(321).coalesce(1).write.parquet(out)

    def _boom(*a, **k):
        raise OSError("scheme not supported (simulated s3a://)")

    monkeypatch.setattr(pq, "read_metadata", _boom)
    assert compaction._audit_rows(spark, out) == 321


def test_streaming_epoch_tree_compacts_byte_identically(spark, tmp_path):
    """The composed lifecycle (r16 axis → fix, end to end): a ranged
    streaming ingest leaves a per-epoch small-files tree; the
    maintenance pass (compact_if_needed, recursive) flattens an AGED
    tree into target-sized files with the corpus content byte-identical.
    Active streams keep their epoch dirs (idempotent overwrite); only
    finished ingests compact."""
    import hashlib

    from amsterdam_map_data_wrangling_spark.operators.compaction import (
        compact_if_needed,
    )
    from amsterdam_map_data_wrangling_spark.streaming.ingest import (
        start_ranged_warc_ingest,
    )

    from .test_archives import _warc_record

    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    for a in range(3):
        (land / f"shard_{a}.warc").write_bytes(
            b"".join(
                _warc_record(f"s{a}r{i}", "metadata", f"http://s{a}/{i}",
                             (f"payload {a}:{i} ".encode()) * 40)
                for i in range(5)
            )
        )
        # one epoch per shard: maxFilesPerTrigger=1
        q = start_ranged_warc_ingest(
            spark, str(land), out, ckpt, split_bytes=2048,
            max_files_per_trigger=1, available_now=True,
        )
        q.awaitTermination()

    def corpus(path):
        return {
            (r.record_id, hashlib.md5(bytes(r.payload)).hexdigest())
            for r in spark.read.parquet(path).collect()
        }

    before = corpus(out)
    assert len(before) == 15

    dst = str(tmp_path / "compacted")
    audit = compact_if_needed(
        spark, out, dst, min_excess_files=4, recursive=True
    )
    assert audit["compacted"], f"epoch tree must trip the threshold: {audit}"
    assert audit["n_input_files"] > audit["n_groups"]
    assert corpus(dst) == before
    assert audit["n_output_rows"] == 15


def test_object_store_slack_guidance_changes_the_decision():
    """The r17 latency axis's operating guidance, made executable: a
    layout at ~2x the ideal file count is NOT worth compacting on local
    FS (per-file cost ~13 ms/catalog-pass; the measured local threshold
    is ratio 4) but IS on an object store (>= 2 RTTs per file per scan
    = 3-8x the local coefficient, so the local ratio-4 degradation
    arrives at ~0.5-1.3) — callers there pass filecount_slack=1.5."""
    from amsterdam_map_data_wrangling_spark.operators.compaction import (
        should_compact,
    )

    target = 128 * 1024 * 1024
    # 200 files of ~1.28 MB over ~256 MB of data: ideal 2, ratio 100 —
    # obviously compact everywhere. Borderline case: ratio ~2.
    borderline = [(f"f{i}", 64 * 1024 * 1024) for i in range(130)]
    # 130 x 64 MB = 8320 MB -> ideal 65 -> ratio 2.0, excess 65 files
    local = should_compact(borderline, target)  # default slack 4.0
    objstore = should_compact(borderline, target, filecount_slack=1.5)
    assert local["filecount_ratio"] == 2.0
    assert not local["compact"], "ratio 2 is inside the local flat band"
    assert objstore["compact"], (
        "ratio 2 costs 3-8x more per file at 20-50 ms/GET — the "
        "documented object-store slack must trigger the rewrite"
    )
