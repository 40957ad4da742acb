"""Accuracy contract for the sketch aggregates (plans/sketches.py).

The driver gate runs these rows-only (estimates are engine-specific);
here we pin what "approximate" means: every estimate within 5% relative
error of the exact value, and the merged-HLL path agrees with the
single-pass path (merge must not lose information).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.plans.sketches import (
    sketch_users_by_type,
    sketch_value_quantiles,
)
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_ORACLE


def test_hll_estimates_within_5pct_of_exact(spark):
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    exact = {
        r["event_type"]: r["exact"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    got = sketch_users_by_type(spark, SF_ORACLE).collect()
    assert {r["event_type"] for r in got} == set(exact)
    for r in got:
        e = exact[r["event_type"]]
        assert abs(r["merged_estimate"] - e) / e < 0.05, r
        assert abs(r["direct_estimate"] - e) / e < 0.05, r


def test_merged_hll_equals_single_pass_hll(spark):
    """Merging per-subgroup sketches must give the same estimate as one
    sketch over all rows — associativity is the whole point."""
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    single = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    merged = {
        r["event_type"]: r["merged_estimate"]
        for r in sketch_users_by_type(spark, SF_ORACLE).collect()
    }
    assert merged == single


def test_approx_quantiles_within_5pct_of_exact(spark):
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    exact = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in events.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    got = sketch_value_quantiles(spark, SF_ORACLE).collect()
    assert {r["event_type"] for r in got} == set(exact)
    for r in got:
        for approx, true in zip((r["p50"], r["p95"], r["p99"]), exact[r["event_type"]]):
            assert abs(approx - true) / max(abs(true), 1e-9) < 0.05, (r, true)
