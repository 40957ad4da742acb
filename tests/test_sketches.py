"""Accuracy contract for the sketch aggregates (plans/sketches.py).

Since round 4 the queries themselves emit the contract (exact value +
``abs(approx − exact) ≤ eps`` booleans) and are hash-gated by the driver
oracle. Here we pin the stronger properties the hashable form can't
carry: mergeability (merged-HLL == single-pass HLL, exactly) and the raw
5% relative-error curve computed independently of the query plumbing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.plans.sketches import (
    sketch_users_by_type,
    sketch_value_quantiles,
)
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_ORACLE


def test_hll_contract_columns_all_true(spark):
    got = sketch_users_by_type(spark, SF_ORACLE).collect()
    assert got, "empty result"
    exact = {
        r["event_type"]: r["exact"]
        for r in load_tables(spark, SF_ORACLE, ["events"])["events"]
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    for r in got:
        assert r["exact_users"] == exact[r["event_type"]], r
        assert r["merged_within_5pct"] is True, r
        assert r["direct_within_10pct"] is True, r


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
        r["event_type"]: r["est"]
        for r in events.withColumn("sub", (F.col("user_id") % 8).cast("int"))
        .groupBy("event_type", "sub")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
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
    approx = {
        r["event_type"]: (r["a"][0], r["a"][1], r["a"][2])
        for r in events.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias("a"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t in exact:
        for a, e in zip(approx[t], exact[t]):
            assert abs(a - e) / max(abs(e), 1e-9) < 0.05, (t, a, e)


def test_quantile_contract_columns_all_true(spark):
    got = sketch_value_quantiles(spark, SF_ORACLE).collect()
    assert got, "empty result"
    for r in got:
        assert r["p50_rank_ok"] is True, r
        assert r["p95_rank_ok"] is True, r
        assert r["p99_rank_ok"] is True, r


def test_cms_overestimates_every_key_and_merges(spark):
    """Count-min guarantees: est >= true for EVERY key (not just the
    gated top-10), and the sketch of two disjoint halves, merged by
    summing counters, equals the whole-corpus sketch."""
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    d, w = 4, 256

    def sketch(df):
        h = F.md5(F.col("user_id").cast("string"))
        withb = df.select(
            *[
                (
                    F.conv(F.substring(h, i * 8 + 1, 8), 16, 10).cast("long") % w
                ).alias(f"_b{i}")
                for i in range(d)
            ]
        )
        stack = ", ".join(f"{i}, _b{i}" for i in range(d))
        return (
            withb.selectExpr(f"stack({d}, {stack}) AS (i, bucket)")
            .groupBy("i", "bucket")
            .agg(F.count("*").alias("c"))
        )

    full = {(r.i, r.bucket): r.c for r in sketch(events).collect()}
    # merge = counter-wise sum of per-half sketches
    lo = sketch(events.filter(F.col("event_id") % 2 == 0))
    hi = sketch(events.filter(F.col("event_id") % 2 == 1))
    merged = {}
    for r in lo.unionByName(hi).collect():
        merged[(r.i, r.bucket)] = merged.get((r.i, r.bucket), 0) + r.c
    assert merged == full
    # est >= true for every key
    true = {r.user_id: r.n for r in
            events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    import hashlib
    for uid, n in true.items():
        hx = hashlib.md5(str(uid).encode()).hexdigest()
        est = min(
            full[(i, int(hx[i * 8 : i * 8 + 8], 16) % w)] for i in range(d)
        )
        assert est >= n, (uid, est, n)
