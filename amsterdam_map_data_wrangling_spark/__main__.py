"""CLI — the reference's invocation story, Spark-native:

    python -m amsterdam_map_data_wrangling_spark INPUT.osm OUTDIR \
        [--fmt parquet|csv] [--workload]

Shapes the OSM XML into the five tables (``pipeline.run_pipeline``;
``--fmt csv`` writes the reference's exact headered CSV layout) and,
with ``--workload``, registers the shaped views and runs the
reference's README SQL workload (``plans/osm_workload.py``), printing
each result — everything the reference script + its SQLite pass
produce, in one command.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="amsterdam_map_data_wrangling_spark")
    p.add_argument("input", help="OSM XML file")
    p.add_argument("outdir", help="output directory for the five tables")
    p.add_argument(
        "--fmt",
        choices=["parquet", "csv"],
        default="parquet",
        help="sink format (csv = the reference's headered layout)",
    )
    p.add_argument(
        "--workload",
        action="store_true",
        help="after shaping, run the reference's README SQL workload",
    )
    p.add_argument(
        "--partition-tags",
        action="store_true",
        help="write the *_tags tables partitioned by the type namespace "
        "(partition pruning for type-filtered queries; parquet only)",
    )
    args = p.parse_args(argv)

    from amsterdam_map_data_wrangling_spark.pipeline import run_pipeline
    from amsterdam_map_data_wrangling_spark.session import get_spark

    spark = get_spark(app_name="amdw-cli")
    spark.sparkContext.setLogLevel("WARN")
    tables = run_pipeline(
        spark,
        args.input,
        args.outdir,
        fmt=args.fmt,
        partition_tags_by_type=args.partition_tags and args.fmt == "parquet",
    )
    for name, df in sorted(tables.items()):
        print(f"wrote {name}: {df.count()} rows ({args.fmt}) -> {args.outdir}")
    if args.workload:
        from amsterdam_map_data_wrangling_spark.plans.osm_workload import (
            register_osm_views,
            run_workload,
        )

        register_osm_views(tables)
        for name, df in run_workload(spark).items():
            print(f"-- {name}")
            for r in df.collect()[:10]:
                print("  ", tuple(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
