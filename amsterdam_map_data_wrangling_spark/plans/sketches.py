"""Sketch aggregates: the re-aggregatable approximations that replace
exact distinct/percentile at 100 TB.

Exact COUNT(DISTINCT) shuffles every distinct value; exact percentile()
shuffles every row's value. Sketches bound both: a fixed-size summary per
group per partition, merged associatively — so the shuffle carries KiB
per group regardless of data volume, and pre-aggregated sketches can be
stored and re-merged across days/partitions without touching raw data
(the "rollup" property no exact aggregate has).

Estimates are engine-specific (Spark's HLL++/Datasketches vs DuckDB's
HLL), so these queries are rows-only at the driver gate; the accuracy
contract (≤5% relative error vs exact) is pinned by
``tests/test_sketches.py`` instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.plans.catalog import _t, query


@query(
    "sketch_users_by_type",
    None,  # estimates are engine-specific; accuracy pinned in pytest
    "Per-event-type distinct users twice over: approx_count_distinct "
    "(HLL++, fixed ~KB state per group) and an explicit Datasketches HLL "
    "built per 8-way subgroup then merged with hll_union_agg — proving "
    "the sketch is mergeable, i.e. daily partial sketches roll up without "
    "re-reading raw events. Scale: shuffle carries |types|×KB, not "
    "|distinct users|; the exact twin (topk_group_distinct) shuffles "
    "every distinct (type, user) pair.",
)
def sketch_users_by_type(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    # stage 1: one sketch per (type, subgroup) — stands in for per-day
    # / per-file partial aggregation
    partial = (
        events.withColumn("sub", (F.col("user_id") % 8).cast("int"))
        .groupBy("event_type", "sub")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    # stage 2: merge partials — the rollup no exact distinct can do
    return (
        partial.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
        )
        .join(
            events.groupBy("event_type").agg(
                F.approx_count_distinct("user_id").alias("direct_estimate")
            ),
            "event_type",
        )
        .orderBy("event_type")
    )


@query(
    "sketch_value_quantiles",
    None,  # estimates are engine-specific; accuracy pinned in pytest
    "Per-event-type approx_percentile (p50/p95/p99) — the bounded-memory "
    "quantile sketch. The exact twin (value_percentiles_by_type) is "
    "oracle-gated; this is what actually ships at 100 TB: state is "
    "O(1/accuracy) per group instead of a full sort of every value.",
)
def sketch_value_quantiles(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    pct = F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000)
    return (
        events.groupBy("event_type")
        .agg(
            F.round(pct[0], 2).alias("p50"),
            F.round(pct[1], 2).alias("p95"),
            F.round(pct[2], 2).alias("p99"),
        )
        .orderBy("event_type")
    )
