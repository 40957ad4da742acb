#!/usr/bin/env python
"""Apply the r16 ingest-width guardrail to an existing SF dir: rewrite
``documents`` through ``operators/widerow.bound_doc_width`` (oversized
docs become byte-exact parts, re-keyed ``xxhash64(doc_id, part_idx)`` so
``doc_id`` stays a per-row key for the catalog), hard-link every other
table. The proof tool for "the guardrail makes the wide-row walls
disappear at the layout level" (r15 verdict "Next round" #5): run the
wide-twin soak against the bounded dir and the residual atomic-scan
floor is gone because no row is wider than the cap.

Usage:
    python scripts/make_bounded_dir.py [--src /tmp/sfwide] \
        [--dst /tmp/sfwide_bounded] [--max-doc-chars 1048576]

NOT an oracle input — perf twin, like the rest of scripts/make_*_dir.py.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from amsterdam_map_data_wrangling_spark.operators.widerow import (  # noqa: E402
    bound_doc_width,
)
from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sfwide")
    ap.add_argument("--dst", default="/tmp/sfwide_bounded")
    ap.add_argument("--max-doc-chars", type=int, default=1_048_576)
    args = ap.parse_args()

    spark = get_spark(app_name="amdw-make-bounded-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    docs = spark.read.parquet(os.path.join(args.src, "documents.parquet"))
    bounded = bound_doc_width(
        docs.select("doc_id", "text", "lang", "source"),
        "doc_id",
        "text",
        max_doc_chars=args.max_doc_chars,
        mode="chunk",
    )
    out = bounded.select(
        F.xxhash64("doc_id", "part_idx").alias("doc_id"),
        "text",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )
    dst_docs = os.path.join(args.dst, "documents.parquet")
    out.repartition(32).write.mode("overwrite").parquet(dst_docs)
    n_src, n_dst = docs.count(), spark.read.parquet(dst_docs).count()
    print(f"documents: {n_src} -> {n_dst} rows (bounded)", flush=True)

    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ]:
        s = os.path.join(args.src, f"{t}.parquet")
        d = os.path.join(args.dst, f"{t}.parquet")
        if os.path.isdir(s):
            shutil.rmtree(d, ignore_errors=True)
            shutil.copytree(s, d, copy_function=os.link)
        else:
            if os.path.exists(d):
                os.unlink(d)
            os.link(s, d)
    print(f"done -> {args.dst}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
