#!/usr/bin/env python
"""Per-query build-vs-exec split profiler (perf tooling, not gate surface).

Usage: python scripts/build_exec_split.py [SF_DIR] [--passes N] [-o FILE]

For every catalog query, times `build(spark, sf_dir)` (driver-side plan
construction: py4j round-trips, Catalyst analysis, eager work triggered
by localCheckpoint / collect-bounded probes) SEPARATELY from the noop
save (executor work). bench.py times the two together; this splits them
so the driver-bound share of the bench wall is attributable per builder
(r18 finding: ~26 s of an ~89 s sf0.1 pass was build).

Same conventions as bench.py: warm pass first, memo cleared per pass,
cache cleared per query, min over passes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__  # noqa: E402,F401
from amsterdam_map_data_wrangling_spark.plans.dedup import (  # noqa: E402
    clear_graph_memo,
)
from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES  # noqa: E402
from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 2
    out_path = None
    pos: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("--passes", "-p"):
            passes = int(argv[i + 1])
            i += 2
        elif a == "-o":
            out_path = argv[i + 1]
            i += 2
        else:
            pos.append(a)
            i += 1
    if pos:
        sf_dir = pos[0]
    names = pos[1:] or list(QUERIES)

    spark = get_spark(app_name="amdw-build-split")
    spark.sparkContext.setLogLevel("ERROR")

    for n in names:  # warm (codegen + JIT)
        QUERIES[n].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    build_t: dict[str, list[float]] = {n: [] for n in names}
    exec_t: dict[str, list[float]] = {n: [] for n in names}
    # jobs run DURING build: under AQE, a lazy localCheckpoint of a
    # shuffle-bearing subtree materializes its intermediate stages at
    # toRdd time (getFinalPhysicalPlan) — i.e. "build" time contains
    # real executor work, not just py4j + Catalyst planning. This
    # counter makes the two attributable per query.
    tracker = spark.sparkContext.statusTracker()

    def _n_jobs() -> int:
        return len(tracker.getJobIdsForGroup() or [])

    build_jobs: dict[str, list[int]] = {n: [] for n in names}
    for _ in range(passes):
        clear_graph_memo()
        for n in names:
            spark.catalog.clearCache()
            j0 = _n_jobs()
            t0 = time.perf_counter()
            df = QUERIES[n].build(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _n_jobs()  # one ~0.5 ms probe between the regions
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_t[n].append(round(t1 - t0, 4))
            exec_t[n].append(round(t2 - t1, 4))
            build_jobs[n].append(j1 - j0)

    rows = [
        {
            "query": n,
            "build_min": min(build_t[n]),
            "exec_min": min(exec_t[n]),
            "build_jobs": max(build_jobs[n]),
            "build_all": build_t[n],
            "exec_all": exec_t[n],
        }
        for n in names
    ]
    rows.sort(key=lambda r: -r["build_min"])
    total_build = round(sum(r["build_min"] for r in rows), 2)
    total_exec = round(sum(r["exec_min"] for r in rows), 2)
    out = {
        "sf_dir": sf_dir,
        "passes": passes,
        "total_build_min": total_build,
        "total_exec_min": total_exec,
        "rows": rows,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    print(
        json.dumps(
            {
                "total_build_min": total_build,
                "total_exec_min": total_exec,
                "top_build": {
                    r["query"]: r["build_min"] for r in rows[:20]
                },
            }
        )
    )


if __name__ == "__main__":
    main()
