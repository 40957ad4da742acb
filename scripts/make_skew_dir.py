#!/usr/bin/env python
"""Synthesize a JOIN-KEY-SKEWED scale dir for PERF soaks (r13 verdict
ask #4: the 200x embedding wall was a SKEW finding, not a volume
finding — volume soaks at uniform keys never exercise the skew-join /
hot-window-partition paths).

Usage:
    python scripts/make_skew_dir.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/sf1skew] [--factor 10] [--hot-frac 0.10]

NOT an oracle input — correctness gates always run on the driver's own
read-only testdata. Timing comparisons should run against a SAME-SIZE
uniform dir (scripts/make_scale_dir.py with the same --factor) so the
measured delta is the key distribution, not bytes.

Scheme: replicate exactly like make_scale_dir.py (disjoint surrogate
keys per replica, replica-tagged document vocab, perturbed embeddings),
then REDIRECT a deterministic ``hot_frac`` of each fact table's
foreign keys onto ONE globally hot entity (the replica-0 minimum key,
which exists in the dimension by construction):

- orders.o_custkey   -> hot customer  (selector: md5 of o_orderkey)
- lineitem.l_suppkey -> hot supplier  (selector: md5 of orderkey+line)
- events.user_id     -> hot user      (selector: md5 of event_id)

This puts ~hot_frac of ALL fact rows on a single join/group/window key
across every replica — the canonical power-law customer — while PK
relationships, row counts, and bytes stay identical to the uniform dir.
The md5 selector makes the dir reproducible bit-for-bit.

What it stresses: shuffle-hash/SMJ row explosion on the hot key (AQE
skew-join split must engage), single-reducer hot groups in groupBy, and
the one-partition window wall (running/rank windows PARTITION BY the
hot key put hot_frac of the table in one task — the known Spark
failure mode salting exists for; key_skew_profile and
salted_join_hot_customer are the catalog's own instrumentation here).
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

# reuse the uniform replicator so bytes/layout match make_scale_dir
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_scale_dir import SHIFT_COLS, _replicate  # noqa: E402

#: (fact table, fk column, dim table, dim key, selector columns)
SKEW_SPEC = [
    ("orders", "o_custkey", "customer", "c_custkey", ["o_orderkey"]),
    (
        "lineitem",
        "l_suppkey",
        "supplier",
        "s_suppkey",
        ["l_orderkey", "l_linenumber"],
    ),
    ("events", "user_id", None, None, ["event_id"]),
]


def _hot_selector(cols: list[str], hot_frac: float):
    """Deterministic per-row coin: md5 over the (stable, pre-skew) id
    columns, compared against hot_frac in per-mille."""
    h = F.abs(
        F.hash(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])))
    )
    return (h % 1000) < int(round(hot_frac * 1000))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1skew")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--hot-frac", type=float, default=0.10)
    args = ap.parse_args()

    spark = get_spark(app_name="amdw-make-skew-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    skew_by_table = {t: (fk, sel) for t, fk, _, _, sel in SKEW_SPEC}
    # hot key = replica-0 minimum of the referenced key domain (events
    # has no dim table; user_id's own minimum serves)
    hot_keys: dict[str, int] = {}
    for t, fk, dim, dk, _sel in SKEW_SPEC:
        ref_t, ref_c = (dim, dk) if dim else (t, fk)
        src = os.path.join(args.src, f"{ref_t}.parquet")
        hot_keys[t] = spark.read.parquet(src).agg(F.min(ref_c)).collect()[0][0]
        print(f"hot {t}.{fk} = {hot_keys[t]}", flush=True)

    for table in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        src = os.path.join(args.src, f"{table}.parquet")
        df = spark.read.parquet(src)
        if table in SHIFT_COLS:
            df = _replicate(df, table, args.factor)
        if table in skew_by_table:
            fk, sel = skew_by_table[table]
            df = df.withColumn(
                fk,
                F.when(
                    _hot_selector(sel, args.hot_frac),
                    F.lit(hot_keys[table]).cast("long"),
                ).otherwise(F.col(fk)),
            )
        out = os.path.join(args.dst, f"{table}.parquet")
        files = max(1, args.factor) if table in SHIFT_COLS else 1
        df.repartition(files).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        if table in skew_by_table:
            fk = skew_by_table[table][0]
            hot_n = (
                spark.read.parquet(out)
                .filter(F.col(fk) == hot_keys[table])
                .count()
            )
            print(
                f"{table}: {n} rows ({hot_n} = {hot_n / n:.1%} on hot "
                f"{fk}) -> {out}",
                flush=True,
            )
        else:
            print(f"{table}: {n} rows -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
