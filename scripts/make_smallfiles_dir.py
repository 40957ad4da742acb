#!/usr/bin/env python
"""Synthesize a MANY-SMALL-FILES twin of a testdata SF directory — the
r16 stress axis (r15 verdict "Next round" #4): same rows, same values,
pathological file layout. Streaming sinks and per-key partitioned
writers leave a 100 TB lake as millions of KB-sized parquet files, and
every downstream scan then pays listing + footer reads + per-file open
cost + task scheduling that the byte volume alone never predicted.

Usage:
    python scripts/make_smallfiles_dir.py \
        [--src /root/testdata/sf0.1] [--dst /tmp/sf0.1_files17k] \
        [--files-big 4000]

NOT an oracle input (perf twin, like make_skew_dir / make_null_dir /
make_widerow_dir): values are byte-identical to --src, so any catalog
query may ALSO be oracle-checked against the source dir's DuckDB views
as a sanity step, but the gates always run on the driver's read-only
testdata.

Layout scheme: the three big fact tables (lineitem, events, orders)
split into --files-big files each; the five mid tables (customer, part,
supplier, documents, embeddings) into --files-big/4 each; region/nation
copy as-is. Default 4000 → ~17k files total, ~10-150 rows (~1-5 KB)
per file, mirroring a per-hour/per-key streaming sink layout. Spark's
scan coalescing (files.openCostInBytes, default 4 MB) bounds the task
explosion — the residual costs this axis measures are listing, footer
reads, open cost, and scheduler pressure.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402

BIG = ["lineitem", "events", "orders"]
MID = ["customer", "part", "supplier", "documents", "embeddings"]
DIMS = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf0.1_files17k")
    ap.add_argument("--files-big", type=int, default=4000)
    args = ap.parse_args()

    spark = get_spark(app_name="amdw-make-smallfiles-dir")
    spark.sparkContext.setLogLevel("ERROR")
    # the source events.parquet may carry TIMESTAMP(NANOS); read it the
    # same way the loader does so the twin gets a normal timestamp
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from amsterdam_map_data_wrangling_spark.sources.registry import (
        load_tables,
    )

    os.makedirs(args.dst, exist_ok=True)
    total_files = 0
    for table in DIMS + MID + BIG:
        df = load_tables(spark, args.src, [table])[table]
        n_files = (
            args.files_big
            if table in BIG
            else max(1, args.files_big // 4) if table in MID else 1
        )
        out = os.path.join(args.dst, f"{table}.parquet")
        # round-robin repartition: uniform tiny files, no key clustering
        # (a streaming sink's layout is time-ordered, not key-ordered)
        df.repartition(n_files).write.mode("overwrite").parquet(out)
        written = sum(
            1 for f in os.listdir(out) if f.endswith(".parquet")
        )
        total_files += written
        print(f"{table}: {written} files -> {out}", flush=True)
    print(f"TOTAL parquet files: {total_files}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
