"""Bucketized range join == naive inequality join, exactly-once.

The operator under test (operators/range_join.py) replaces Spark's
BroadcastNestedLoopJoin fallback for inequality predicates with an
equi-join on bucket ids. These tests prove set-equality (with
multiplicity) against the naive O(N*M) crossJoin+filter form on real
testdata, across bucket widths that do / don't divide interval lengths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.range_join import (
    interval_overlap_join,
    point_in_interval_join,
)
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_SMALL


def _bands(spark, sf_dir):
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    return nation.select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 400.0).alias("lo"),
        (F.col("n_nationkey") * 400.0 + 700.0).alias("hi"),
    )


def _points(spark, sf_dir):
    customer = load_tables(spark, sf_dir, ["customer"])["customer"]
    return customer.select("c_custkey", "c_acctbal")


def _naive(points, intervals):
    return points.crossJoin(intervals).filter(
        (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") <= F.col("hi"))
    )


@pytest.mark.parametrize("width", [350.0, 700.0, 123.4, 5000.0])
def test_point_in_interval_matches_naive(spark, width):
    pts, ivs = _points(spark, SF_SMALL), _bands(spark, SF_SMALL)
    got = point_in_interval_join(pts, ivs, "c_acctbal", "lo", "hi", width)
    want = _naive(pts, ivs)
    key = ["c_custkey", "band_id"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


def test_point_in_interval_left_keeps_unmatched(spark):
    pts, ivs = _points(spark, SF_SMALL), _bands(spark, SF_SMALL)
    got = point_in_interval_join(pts, ivs, "c_acctbal", "lo", "hi", 350.0, how="left")
    matched = {r[0] for r in got.filter(F.col("band_id").isNotNull())
               .select("c_custkey").distinct().collect()}
    unmatched = [r[0] for r in got.filter(F.col("band_id").isNull())
                 .select("c_custkey").collect()]
    all_keys = {r[0] for r in pts.select("c_custkey").collect()}
    # negative balances fall below every band -> some unmatched rows exist,
    # each appearing exactly once with null interval columns
    assert len(unmatched) > 0
    assert len(unmatched) == len(set(unmatched))
    assert matched | set(unmatched) == all_keys
    assert matched & set(unmatched) == set()


def test_point_in_interval_no_exchange_free_lunch_plan(spark):
    """The bucketized form must plan as an equi-join (hash/sort-merge),
    never BroadcastNestedLoopJoin / CartesianProduct."""
    pts, ivs = _points(spark, SF_SMALL), _bands(spark, SF_SMALL)
    plan = point_in_interval_join(
        pts, ivs, "c_acctbal", "lo", "hi", 350.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("width", [0.5, 1.0, 3.7])
def test_interval_overlap_matches_naive(spark, width):
    rows = [(i, float(i), float(i) + 1.5) for i in range(40)]
    left = spark.createDataFrame(rows, "l_id long, l_lo double, l_hi double")
    right = spark.createDataFrame(
        [(j, j * 0.9, j * 0.9 + 2.0) for j in range(40)],
        "r_id long, r_lo double, r_hi double",
    )
    got = interval_overlap_join(left, right, "l_lo", "l_hi", "r_lo", "r_hi", width)
    want = left.crossJoin(right).filter(
        (F.col("l_lo") <= F.col("r_hi")) & (F.col("r_lo") <= F.col("l_hi"))
    )
    key = ["l_id", "r_id"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


def test_bad_args_raise(spark):
    pts, ivs = _points(spark, SF_SMALL), _bands(spark, SF_SMALL)
    with pytest.raises(ValueError):
        point_in_interval_join(pts, ivs, "c_acctbal", "lo", "hi", 0)
    with pytest.raises(ValueError):
        point_in_interval_join(pts, ivs, "c_acctbal", "lo", "hi", 10.0, how="outer")


def test_interval_overlap_exactly_once_property(spark):
    """Hypothesis sweep of the exactly-once bucket guard: random interval
    sets (negative coords, zero-width, bucket-boundary-straddling) must
    match the naive cross-join EXACTLY — no dropped pairs, no duplicate
    emission from multi-bucket overlaps. Batched: one Spark job per
    example set, 20 examples."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coords = st.integers(-50, 50)
    intervals = st.lists(
        st.tuples(coords, st.integers(0, 25)), min_size=1, max_size=15
    )

    @settings(max_examples=20, deadline=None)
    @given(ls=intervals, rs=intervals, width=st.sampled_from([1.0, 2.5, 7.0]))
    def check(ls, rs, width):
        left = spark.createDataFrame(
            [(i, float(lo), float(lo + w)) for i, (lo, w) in enumerate(ls)],
            "l_id long, l_lo double, l_hi double",
        )
        right = spark.createDataFrame(
            [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(rs)],
            "r_id long, r_lo double, r_hi double",
        )
        got = interval_overlap_join(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi", width
        )
        pairs = [(r.l_id, r.r_id) for r in got.select("l_id", "r_id").collect()]
        assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
        want = {
            (i, j)
            for i, (llo, lw) in enumerate(ls)
            for j, (rlo, rw) in enumerate(rs)
            if llo <= rlo + rw and rlo <= llo + lw
        }
        assert set(pairs) == want

    check()
