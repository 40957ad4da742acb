#!/usr/bin/env python
"""Synthesize a HIGH-NULL / DEGENERATE-KEY scale dir for PERF soaks
(r14 verdict ask #5b: the null_semantics_audit gate covers null
SEMANTICS; this covers null PERFORMANCE — what a 100 TB crawl with
missing user ids / constant columns does to shuffles, windows, and
joins).

Usage:
    python scripts/make_null_dir.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/sf1null] [--factor 10] [--null-frac 0.5]

NOT an oracle input. Timing comparisons run against the SAME-factor
uniform dir (scripts/make_scale_dir.py), so deltas isolate the value
distribution. (Exact byte parity is impossible here by definition —
nulls store smaller — so read ratios with that grain of salt; the
effects under test are partition-placement effects, not byte effects.)

Injected, all deterministic (md5 coin over stable id columns):

- ``events.user_id``   -> NULL on ``null_frac`` of rows: every
  PARTITION BY user_id window puts that whole slice in ONE task (the
  null group is a single key — the skew wall in disguise), and every
  inner equi-join on user_id must null-filter BEFORE the shuffle or
  hash(NULL) sends it all to one reducer (Catalyst emits the IsNotNull
  filter for inner joins — this dir verifies it actually fires).
- ``orders.o_custkey`` -> NULL on ``null_frac/2`` of rows: the join /
  group / window key of the orders family.
- ``events.event_type`` -> one constant value on ALL rows (degenerate
  group key): groupBy(event_type) collapses to a single group —
  Spark's map-side partial aggregation should keep this FLAT (32
  partials -> 1 tiny reduce), and the dir proves it measured rather
  than assumed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_scale_dir import SHIFT_COLS, _replicate  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _coin(cols: list[str], frac: float):
    h = F.abs(
        F.hash(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
        )
    )
    return (h % 1000) < int(round(frac * 1000))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1null")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--null-frac", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_spark(app_name="amdw-make-null-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    for table in TABLES:
        df = spark.read.parquet(os.path.join(args.src, f"{table}.parquet"))
        if table in SHIFT_COLS:
            df = _replicate(df, table, args.factor)
        if table == "events":
            df = df.withColumn(
                "user_id",
                F.when(_coin(["event_id"], args.null_frac), F.lit(None))
                .otherwise(F.col("user_id"))
                .cast("long"),
            ).withColumn("event_type", F.lit("click"))
        if table == "orders":
            df = df.withColumn(
                "o_custkey",
                F.when(
                    _coin(["o_orderkey"], args.null_frac / 2), F.lit(None)
                )
                .otherwise(F.col("o_custkey"))
                .cast("long"),
            )
        out = os.path.join(args.dst, f"{table}.parquet")
        files = max(1, args.factor) if table in SHIFT_COLS else 1
        df.repartition(files).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        extra = ""
        if table in ("events", "orders"):
            col = "user_id" if table == "events" else "o_custkey"
            nn = (
                spark.read.parquet(out).filter(F.col(col).isNull()).count()
            )
            extra = f" ({col} null on {nn} = {nn / n:.1%})"
        print(f"{table}: {n} rows{extra}", flush=True)


if __name__ == "__main__":
    main()
