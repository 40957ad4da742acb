"""Small-file compaction — the lakehouse maintenance task that keeps a
100 TB table scannable: streaming sinks and per-partition writers leave
thousands of KB-sized parquet files, and every downstream scan then
pays a task per file. The planner is deterministic driver-side math
over FILE METADATA ONLY (sizes, never contents); the executor does one
read of each group and one coalesced write — data moves exactly once.

Sizing rule (mirrors the session conf reasoning): target ≈
``spark.sql.files.maxPartitionBytes`` (128 MB default) so one compacted
file ≈ one scan partition. Files already at/over target are left alone
(rewriting them burns IO for nothing).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from amsterdam_map_data_wrangling_spark.sources.fs import list_files


def compaction_plan(
    sizes: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """First-fit-decreasing bin packing of (path, bytes) into groups of
    combined size <= ``target_bytes``. Deterministic: files sort by
    (size DESC, path) so the same metadata always yields the same plan.
    Files individually >= target form singleton groups (left-alone
    candidates — the caller skips rewriting singletons). FFD guarantees
    every returned multi-file group is <= target and uses at most
    ~1.22x the optimal group count — planner quality is bounded, not
    heuristic luck."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    order = sorted(sizes, key=lambda t: (-t[1], t[0]))
    bins: list[tuple[int, list[str]]] = []  # (used_bytes, paths)
    for path, sz in order:
        if sz >= target_bytes:
            bins.append((sz, [path]))
            continue
        for i, (used, paths) in enumerate(bins):
            if used + sz <= target_bytes and used < target_bytes:
                bins[i] = (used + sz, paths + [path])
                break
        else:
            bins.append((sz, [path]))
    return [paths for _used, paths in bins]


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Compact every ``*.parquet`` under ``src_dir`` into ``dst_dir``
    with one output file per planned group (singleton groups of
    already-big files rewrite too, keeping dst self-contained — flip to
    a copy for a true in-place maintenance job). Returns the audit
    {n_input_files, n_groups, n_output_rows}. Each group is an
    independent read→coalesce(1)→append job — a scheduler can run
    groups in parallel, and no shuffle happens anywhere (coalesce(1)
    merges partitions map-side)."""
    # Hadoop-FS listing (not os.listdir) so the maintenance job runs
    # against hdfs:// / s3a:// tables, not just the driver's disk.
    files = [
        (p, sz)
        for p, sz in list_files(spark, src_dir)
        if p.endswith(".parquet")
    ]
    groups = compaction_plan(files, target_bytes)
    total = 0
    for i, group in enumerate(groups):
        df = spark.read.parquet(*group).coalesce(1)
        df.write.mode("append" if i else "overwrite").parquet(dst_dir)
        total += df.count()
    return {
        "n_input_files": len(files),
        "n_groups": len(groups),
        "n_output_rows": total,
    }
