#!/usr/bin/env python
"""Concurrent-catalog contention probe (r16; r15 verdict "Next round"
#6): a real cluster never runs queries alone — the catalog shares one
scheduler, one shuffle service, one block manager. bench.py times the
150 queries SERIALLY; this probe runs the same catalog through a
thread pool at parallelism 1 / 4 / 8 inside ONE session (threaded
collects against noop sinks, Spark's documented multi-job pattern) and
records what contention does to wall clock and to individual queries.

Usage:
    python scripts/concurrent_catalog.py [SF_DIR] [--out FILE] \
        [--workers 1,4,8]

Reading the output:
- ``wall_s`` per worker count: total catalog wall. Serial (1) is the
  control; ideal contention-free scaling would approach wall_1/K until
  the box saturates (the catalog is already internally parallel per
  query, so sub-linear is EXPECTED — the number measures how far).
- ``per_query``: each query's in-flight seconds at each K (includes
  scheduler queueing — that is the point).
- ``top_inflation``: the queries whose K=max time grew most vs serial —
  the contention hot spots; shared-relation memo builders showing here
  would mean the per-key build locks (plans/dedup.py) aren't holding.
- canary bracket before/after, same convention as sweep_catalog.py —
  a probe artifact without a host-speed witness cannot be compared
  across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__  # noqa: E402,F401  (registers the full catalog)
from bench import CANARY_BASELINE_SEC, _run_canary  # noqa: E402
from amsterdam_map_data_wrangling_spark.plans.dedup import (  # noqa: E402
    clear_graph_memo,
)
from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES  # noqa: E402
from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402

WARM_DIR = "/root/testdata/sf0.1"


def _canary_ratio(samples: dict[str, float]) -> float:
    ratios = sorted(
        samples[n] / CANARY_BASELINE_SEC[n] for n in CANARY_BASELINE_SEC
    )
    return round(ratios[len(ratios) // 2], 3)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = WARM_DIR
    out_path = None
    workers = [1, 4, 8]
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_path = argv[i + 1]
            i += 2
        elif argv[i] == "--workers":
            workers = [int(w) for w in argv[i + 1].split(",")]
            i += 2
        else:
            sf_dir = argv[i]
            i += 1

    spark = get_spark(app_name="amdw-concurrent-catalog")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(QUERIES)

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 4)

    # warm pass (codegen + JVM) — serial, untimed
    print("warm pass...", file=sys.stderr, flush=True)
    clear_graph_memo()
    for n in names:
        run_one(n)

    canary_before = _run_canary(spark, WARM_DIR)
    passes: dict[str, dict] = {}
    for k in workers:
        clear_graph_memo()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        if k == 1:
            per_q = {n: run_one(n) for n in names}
        else:
            with ThreadPoolExecutor(k) as ex:
                per_q = dict(zip(names, ex.map(run_one, names)))
        wall = round(time.perf_counter() - t0, 2)
        passes[str(k)] = {"wall_s": wall, "per_query": per_q}
        print(f"workers={k}: wall {wall}s", file=sys.stderr, flush=True)
    canary_after = _run_canary(spark, WARM_DIR)

    serial = passes[str(workers[0])]["per_query"]
    kmax = str(workers[-1])
    inflation = sorted(
        (
            (round(passes[kmax]["per_query"][n] / max(serial[n], 1e-3), 2), n)
            for n in names
        ),
        reverse=True,
    )
    result = {
        "axis": "concurrent-catalog contention (r16)",
        "sf_dir": sf_dir,
        "workers": workers,
        "wall_s": {k: v["wall_s"] for k, v in passes.items()},
        "speedup_vs_serial": {
            k: round(passes[str(workers[0])]["wall_s"] / v["wall_s"], 2)
            for k, v in passes.items()
        },
        "top_inflation_at_max_workers": [
            {"query": n, "x": x} for x, n in inflation[:12]
        ],
        "canary": {
            "before": _canary_ratio(canary_before),
            "after": _canary_ratio(canary_after),
        },
        "per_pass": passes,
    }
    line = json.dumps(
        {k: result[k] for k in result if k != "per_pass"}, sort_keys=True
    )
    print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
