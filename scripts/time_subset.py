#!/usr/bin/env python
"""Time a subset of catalog queries at an arbitrary sf_dir (perf tooling,
not part of the gate surface).

Usage: python scripts/time_subset.py SF_DIR q1 q2 ... [--passes N]

Warm pass (untimed, codegen) then N timed passes; prints min/median per
query as one JSON line. The shared graph memo is cleared once per timed
pass, matching bench.py's convention.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__  # noqa: E402,F401  (registers the full catalog)
from amsterdam_map_data_wrangling_spark.plans.dedup import (  # noqa: E402
    clear_graph_memo,
)
from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES  # noqa: E402
from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    passes = 2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--passes":  # space-separated form: --passes N
            if i + 1 >= len(argv):  # r12 ADVICE: trailing flag, no value
                sys.exit("usage: time_subset.py SF_DIR [q ...] --passes N")
            passes = int(argv[i + 1])
            i += 2
        elif a.startswith("--passes="):  # equals form: --passes=N
            passes = int(a.split("=", 1)[1])
            i += 1
        elif a.startswith("--"):  # r12 ADVICE: reject unknown flags
            sys.exit(f"unknown option {a!r}; only --passes is supported")
        else:
            args.append(a)
            i += 1
    if not args:
        sys.exit("usage: time_subset.py SF_DIR [q ...] [--passes N]")
    sf_dir, names = args[0], args[1:]
    if not names:
        names = list(QUERIES)
    spark = get_spark(app_name="amdw-subset-timer")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        clear_graph_memo()
        for name in names:
            spark.catalog.clearCache()
            t0 = time.monotonic()
            QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(round(time.monotonic() - t0, 3))
    out = {
        n: {"min": min(v), "all": v}
        for n, v in sorted(times.items(), key=lambda kv: -min(kv[1]))
    }
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
