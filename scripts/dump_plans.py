#!/usr/bin/env python
"""Dump .explain('formatted') for named catalog queries to files
(perf tooling, not part of the gate surface).

Usage: python scripts/dump_plans.py OUT_DIR SUFFIX q1 [q2 ...]
       python scripts/dump_plans.py plans/r18 before dup_span_coverage

Writes OUT_DIR/<query>_<SUFFIX>.txt. SF dir comes from
$SPARK_GRAFT_SF_DIR (default sf0.1), matching bench.py. The shared
graph memo is cleared first so each dumped plan is the cold-build
shape (what the first consumer in a bench pass executes), not the
memoized checkpoint read.
"""

from __future__ import annotations

import os
import sys

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
    if len(sys.argv) < 4:
        sys.exit("usage: dump_plans.py OUT_DIR SUFFIX q1 [q2 ...]")
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="amdw-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        clear_graph_memo()
        df = QUERIES[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
