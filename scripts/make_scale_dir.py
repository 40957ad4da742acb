#!/usr/bin/env python
"""Synthesize a scaled-up copy of a testdata SF directory for PERF soaks.

Usage:
    python scripts/make_scale_dir.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/sf1] [--factor 10]

NOT an oracle input — correctness gates always run on the driver's own
read-only testdata. This exists to exercise the catalog at a scale point
the shipped testdata doesn't reach (the "would this survive 10x/100x"
question, made empirical: VERDICT r8/r9 ask #3).

Replication scheme (replica r in 0..factor-1):
- region/nation copy as-is (fixed dimensions, like TPC-H).
- Every other table replicates with ALL int64 surrogate keys (PKs and
  FKs alike) shifted by r * 1e12 — far above any real key, so replicas
  are disjoint and every intra-replica join relationship is preserved
  exactly. int32 dimension FKs (nationkey/regionkey) stay fixed.
- documents.text: every token is prefixed with a replica tag (r0_,
  r1_, ...), so shingle/token vocabularies are DISJOINT across
  replicas: no cross-replica near-dups, duplicate DENSITY stays at the
  source level while corpus size scales — plain 10x copies would turn
  every doc into a 10-way exact duplicate and measure a pathological
  corpus instead of a bigger one.
- embeddings.embedding: element-wise +r*1e-3 perturbation (keeps ANN
  geometry non-degenerate across replicas instead of 10 exact copies
  of every vector).
- events keep their timestamps (densities grow; the window/session
  shapes stay realistic).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402

#: per-replica key offset — above any source key, below int64 overflow
#: even at factor 1000 (1e15 < 2^63).
KEY_STRIDE = 1_000_000_000_000

#: int64 surrogate key columns per table (PKs and FKs shifted alike so
#: intra-replica joins are preserved); int32 dimension FKs stay fixed.
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    rep = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(factor).select(F.col("id").alias("_r"))
        )
    )
    for c in SHIFT_COLS[table]:
        rep = rep.withColumn(c, F.col(c) + F.col("_r") * F.lit(KEY_STRIDE))
    if table == "documents":
        # tag AFTER every whitespace RUN (\s+, not the literal space:
        # tab/newline-separated tokens must get the prefix too or they
        # stay shared across replicas — r10 ADVICE) and once up front
        tag = F.concat(F.lit("r"), F.col("_r").cast("string"), F.lit("_"))
        rep = rep.withColumn(
            "text",
            F.concat(
                tag,
                F.regexp_replace("text", r"(\s+)", F.concat(F.lit("$1"), tag)),
            ),
        )
    if table == "embeddings":
        eps = F.col("_r").cast("float") * F.lit(1e-3)
        rep = rep.withColumn(
            "embedding",
            F.transform("embedding", lambda x: (x + eps).cast("float")),
        )
    return rep.drop("_r").select(*df.columns)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="amdw-make-scale-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)
    for table in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        src = os.path.join(args.src, f"{table}.parquet")
        df = spark.read.parquet(src)
        if table in SHIFT_COLS:
            df = _replicate(df, table, args.factor)
        out = os.path.join(args.dst, f"{table}.parquet")
        # repartition, NOT coalesce: the source is a single-split file, so
        # the replicated frame has 1 partition and coalesce(N) cannot
        # RAISE that — r10's scale dirs silently came out as one file /
        # one row group per table, which serializes every scan stage onto
        # one core and made the r10 sf1 numbers measure a degenerate
        # layout no real N-executor writer produces (a real sfN table is
        # written wide). Scaled tables get ~factor files; untouched dims
        # keep their source layout.
        files = max(1, args.factor) if table in SHIFT_COLS else 1
        df.repartition(files).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{table}: {n} rows -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
