"""Bucketed co-location must eliminate the join shuffle: the executed plan
of a join between two tables bucketed on the join key contains no Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.sources.bucketing import cobucket_star
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark):
    dfs = load_tables(spark, SF_SMALL, ["lineitem", "orders"])
    return cobucket_star(
        spark,
        {"b_lineitem": dfs["lineitem"], "b_orders": dfs["orders"]},
        {"b_lineitem": "l_orderkey", "b_orders": "o_orderkey"},
        num_buckets=8,
    )


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    li, o = bucketed["b_lineitem"], bucketed["b_orders"]
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderpriority", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        n = joined.count()
        shuffled = (
            load_tables(spark, SF_SMALL, ["lineitem"])["lineitem"]
            .join(
                load_tables(spark, SF_SMALL, ["orders"])["orders"],
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == shuffled
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed):
    li = bucketed["b_lineitem"]
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
