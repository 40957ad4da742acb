#!/usr/bin/env python
"""Stateful-streaming throughput scale probe (perf tooling, not part of
the gate surface).

Usage: python scripts/probe_streaming_scale.py [--out FILE]
       [--factors 16,160]

The r7 close recorded the family's single throughput point (1.6M
events / 160k users: SCD2 ~295k events/s, sessionizer ~500k events/s).
This probe re-bases that point on the current box and adds a 10x point
(16M events / 1.6M users) with the SAME method, so the claim the 100 TB
story rests on — per-key state is a few ints, so throughput holds as
ACTIVE-KEY CARDINALITY grows and state memory stays linear in keys —
is measured as a trend rather than asserted from one point.

Method: the sf0.1 events shard (100k rows, ~10k users) is replicated
replica-disjointly (user_id/event_id offset per replica, ts jittered
+replica seconds) into one parquet file per 8 replicas; each operator
drains the directory with trigger(availableNow=True) into a noop sink
from a cold checkpoint. Wall time includes the full micro-batch
pipeline (scan, user-key shuffle, Arrow group delivery, state store);
events/s = rows / wall. The bench canary is NOT bracketed here — run
sweeps on a quiet box and compare the two points of the SAME run (the
ratio within one run is host-consistent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402
from amsterdam_map_data_wrangling_spark.streaming.funnel import (  # noqa: E402
    streaming_funnel_flags,
)
from amsterdam_map_data_wrangling_spark.streaming.scd2 import (  # noqa: E402
    streaming_scd2_closed_intervals,
)
from amsterdam_map_data_wrangling_spark.streaming.sessionize import (  # noqa: E402
    streaming_gap_sessions,
)

SRC = "/root/testdata/sf0.1"
OPERATORS = [
    ("scd2", streaming_scd2_closed_intervals, "append"),
    ("sessionize", streaming_gap_sessions, "update"),
    ("funnel", streaming_funnel_flags, "update"),
]


def build_dir(spark, factor: int, dest: str) -> int:
    """Replica-disjoint scale-up of the sf0.1 events shard: user and
    event ids offset per replica (so key cardinality scales with the
    data — the dimension under test), ts jittered so replicas are not
    timestamp-identical."""
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    base = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    n = base.count()
    files = max(1, factor // 8)
    per_file = factor // files
    for f in range(files):
        parts = []
        for r in range(f * per_file, (f + 1) * per_file):
            # offsets precomputed in Python: an INT*INT literal product
            # (e.g. 22 * 100000000) overflows int32 under ANSI — the
            # same literal-domain trap the key-domain harness hunts
            parts.append(
                base.selectExpr(
                    f"event_id + {r * 100_000_000} AS event_id",
                    # CAST to LTZ (session is pinned UTC): the source
                    # shard can arrive NTZ, and the operators/watermarks
                    # assume TIMESTAMP — read_events_stream normalizes
                    # this for the sf dirs, the probe dirs bake it in
                    f"CAST(ts + make_interval(0,0,0,0,0,0,{r}) "
                    f"AS TIMESTAMP) AS ts",
                    f"user_id + {r * 10_000_000} AS user_id",
                    "event_type",
                    "value",
                    "props",
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        df.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(dest, f"events_{f}.parquet")
        )
    # read_events_stream globs 'events.parquet'; rename the glob target
    # by streaming the dest dir directly with a wider glob below instead
    return n * factor


def drain(spark, data_dir: str, rows: int) -> dict[str, float]:
    out: dict[str, float] = {}
    for name, fn, mode in OPERATORS:
        ck = f"/tmp/ck_probe_{name}_{int(time.monotonic() * 1e6)}"
        # each replica group is a .parquet DIRECTORY under dest
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(data_dir)
            .schema
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(data_dir)
        )
        t0 = time.monotonic()
        (
            fn(stream)
            .writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        dt = time.monotonic() - t0
        out[name] = round(rows / dt)
        shutil.rmtree(ck, ignore_errors=True)
        print(
            f"  {name}: {rows:,} events in {dt:.2f}s = "
            f"{rows / dt:,.0f} events/s",
            flush=True,
        )
    return out


def main() -> None:
    out_path = None
    factors = (16, 160)
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--out"):
            out_path = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            i += 1 if "=" in a else 2
        elif a.startswith("--factors"):
            raw = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            factors = tuple(int(x) for x in raw.split(","))
            i += 1 if "=" in a else 2
        else:
            sys.exit(f"unknown option {a!r}")
    spark = get_spark(app_name="amdw-streaming-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for factor in factors:
        dest = f"/tmp/stream_scale_{factor}x"
        rows = build_dir(spark, factor, dest)
        users = 10_000 * factor  # replica-disjoint by construction
        print(f"factor {factor}: {rows:,} events / ~{users:,} users")
        results[f"{factor}x"] = {
            "rows": rows,
            "users": users,
            "events_per_sec": drain(spark, dest, rows),
        }
    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
