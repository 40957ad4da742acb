"""Observation metrics (df.observe): production pipelines piggyback
row-count / invariant metrics on an existing action instead of paying a
second pass — the monitoring hook a 100 TB job uses to self-audit
(rows in vs rows out, null-key counts) at zero extra scan cost."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_ORACLE


def test_observe_metrics_match_direct_aggregates(spark):
    orders = load_tables(spark, SF_ORACLE, ["orders"])["orders"]
    obs = Observation("orders_audit")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "sum_cents"
        ),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_keys"),
    )
    # the downstream "real" work — one action drives both the result and
    # the metrics
    kept = observed.filter(F.col("o_orderstatus") != "P").count()
    m = obs.get
    direct = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "sum_cents"
        ),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_keys"
        ),
    ).collect()[0]
    assert m["n_rows"] == direct["n_rows"]
    assert m["sum_cents"] == direct["sum_cents"]
    assert m["null_keys"] == direct["null_keys"] == 0
    # the observation sees PRE-filter rows (it sits above the scan, not
    # the filter) — the audit is of what entered the stage
    assert kept < m["n_rows"]
