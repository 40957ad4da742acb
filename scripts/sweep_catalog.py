#!/usr/bin/env python
"""Full-catalog timing sweep at an arbitrary sf_dir, with the bench
canary bracketed around it (perf tooling, not part of the gate surface).

Usage: python scripts/sweep_catalog.py SF_DIR [--out FILE] [--passes N]

Size the JVM to the scale point: the default 8g driver heap dies
(GCLocker exhaustion) around the 200x dirs — run big sweeps under
``SPARK_DRIVER_MEMORY=32g``. Per-query errors are captured into the
output JSON (an erroring query at a new scale point is a FINDING, not
a reason to lose the other 149 measurements), and progress streams to
stderr so even a fatal JVM death leaves the killer query identified.

This replaces the per-round ad-hoc /tmp sweep scripts that produced
scripts/archive/sf1_times_r{11,12}.json. Round 13's forensics motivated
the canary bracket: three same-day sf1 passes measured 215 / 192.9 /
210.3 s on identical code because the host runs shuffle-heavy work
1.0-1.5x its baseline speed on MINUTE timescales — a sweep artifact
without a host-speed witness cannot be compared across rounds. The
canary (bench.py's pinned 3-query set, measured at sf0.1 before AND
after the sweep against the r12-close calibration) makes every sweep
self-explaining the same way BENCH_r{N}.json already is.

Methodology matches the archived sweeps: one untimed warm pass over the
full catalog at sf0.1 (codegen + JVM warmup), then ``--passes`` timed
passes at SF_DIR (default 1, the archive convention; min per query is
recorded when passes > 1). The shared graph memo is cleared once per
timed pass, so each pass pays the near-dup graph build exactly once,
matching bench.py.
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
from bench import CANARY_BASELINE_SEC, _run_canary  # noqa: E402
from amsterdam_map_data_wrangling_spark.plans.dedup import (  # noqa: E402
    clear_graph_memo,
)
from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES  # noqa: E402
from amsterdam_map_data_wrangling_spark.session import get_spark  # noqa: E402

WARM_DIR = "/root/testdata/sf0.1"


def _canary_ratio(samples: dict[str, list[float]]) -> float | None:
    """Median-of-samples per query vs the r12-close calibration, then
    the median ratio across the 3 canary queries (bench.py's reading).
    Calibration is only valid at the default sf0.1/local[32] config —
    the canary itself always runs at sf0.1 regardless of SF_DIR, so the
    ratio is meaningful for any sweep target."""
    ratios = []
    for name, base in CANARY_BASELINE_SEC.items():
        vals = sorted(samples.get(name, []))
        if not vals:
            return None
        med = vals[len(vals) // 2] if len(vals) % 2 else (
            vals[len(vals) // 2 - 1] + vals[len(vals) // 2]
        ) / 2
        ratios.append(med / base)
    ratios.sort()
    return round(ratios[len(ratios) // 2], 3)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir: str | None = None
    out_path: str | None = None
    passes = 1
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("--out", "--passes"):
            if i + 1 >= len(argv):
                sys.exit(f"usage error: {a} needs a value")
            if a == "--out":
                out_path = argv[i + 1]
            else:
                passes = int(argv[i + 1])
            i += 2
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
            i += 1
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
            i += 1
        elif a.startswith("--"):
            sys.exit(f"unknown option {a!r}; only --out/--passes supported")
        elif sf_dir is None:
            sf_dir = a
            i += 1
        else:
            sys.exit("usage: sweep_catalog.py SF_DIR [--out FILE] [--passes N]")
    if sf_dir is None:
        sys.exit("usage: sweep_catalog.py SF_DIR [--out FILE] [--passes N]")

    spark = get_spark(app_name="amdw-catalog-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warm pass (codegen, broadcast paths, Python workers).
    for name in QUERIES:
        try:
            QUERIES[name].build(spark, WARM_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    canary_samples: dict[str, list[float]] = {
        n: [] for n in CANARY_BASELINE_SEC
    }
    for n, v in _run_canary(spark, WARM_DIR).items():
        canary_samples[n].append(v)

    times: dict[str, list[float]] = {n: [] for n in QUERIES}
    errors: dict[str, str] = {}
    t_all = time.monotonic()
    for _ in range(passes):
        clear_graph_memo()
        for name in QUERIES:
            t0 = time.monotonic()
            try:
                QUERIES[name].build(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as exc:  # soak tool: record, keep sweeping
                # (e.g. the known r14-owed output contracts error at
                # >=~30-60x shifted key domains — an erroring query is a
                # FINDING at a new scale point, not a reason to lose the
                # other 149 measurements)
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"ERR  {name}", file=sys.stderr, flush=True)
                continue
            times[name].append(round(time.monotonic() - t0, 3))
            # progress to stderr so a fatal JVM death (lost in-process
            # state, no JSON) still identifies the killer query
            print(
                f"{times[name][-1]:8.2f}s {name}",
                file=sys.stderr,
                flush=True,
            )
    total = round(time.monotonic() - t_all, 1)
    times = {n: v for n, v in times.items() if v}

    for n, v in _run_canary(spark, WARM_DIR).items():
        canary_samples[n].append(v)

    mins = {n: min(v) for n, v in times.items()}
    res = {
        "sf_dir": sf_dir,
        "passes": passes,
        "total_s": total,
        "mean_s": round(sum(mins.values()) / len(mins), 3),
        "errors": errors,
        "times": dict(sorted(mins.items(), key=lambda kv: -kv[1])),
        "canary": {
            "samples": canary_samples,
            "baseline": CANARY_BASELINE_SEC,
            "ratio": _canary_ratio(canary_samples),
            "provenance": "bench.py CANARY_QUERIES at sf0.1, one sample "
            "before and one after the timed passes, vs the r12-close "
            "calibration medians",
        },
    }
    if passes > 1:
        res["all_passes"] = times
    line = json.dumps(res)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print(
            json.dumps(
                {
                    "total_s": total,
                    "canary_ratio": res["canary"]["ratio"],
                    "over_4s": [n for n, v in mins.items() if v > 4.0],
                    "errors": sorted(errors),
                    "out": out_path,
                }
            )
        )
    else:
        print(line)


if __name__ == "__main__":
    main()
