"""Cross-engine property test for the catalog's exact-cents gate
convention: ``CAST(round(x * 100) AS BIGINT)`` recovers the original
integer cents IDENTICALLY on Spark and DuckDB whenever x is an exact
2-decimal quantity (prices, balances) — the precondition every
integer-cents gate in the catalog rests on (plans/catalog.py module
docstring). The convention would NOT hold for arbitrary doubles (e.g.
0.125 * 100 == 12.5 exactly: Spark rounds HALF_UP to 13, C-library
nearbyint half-to-even to 12) — which is exactly why the docstring
restricts it to 2-decimal quantities; this test pins that the
restriction suffices across the full range the testdata uses, including
the adversarial half-cent neighborhoods."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _adversarial_cents() -> list[int]:
    # .x25 / .x75 boundaries, tiny, huge, negative
    base = [5, 25, 75, 125, 175, 999, 267_50, 535, 2675]
    out = set()
    for b in base:
        out |= {b, -b, b * 1000 + 25, b * 1000 + 75}
    out |= {0, 1, -1, 10**15 + 25}
    return sorted(out)


def _check(spark, cents: list[int]) -> None:
    xs = [c / 100.0 for c in cents]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "idx long, x double"
    )
    got_spark = [
        r["c"]
        for r in df.select(
            "idx", F.round(F.col("x") * 100).cast("bigint").alias("c")
        )
        .orderBy("idx")
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT CAST(round(? * 100) AS BIGINT)", [x]
        ).fetchone()[0]
        for x in xs
    ]
    assert got_spark == cents
    assert got_duck == cents


def test_exact_cents_roundtrip_adversarial(spark):
    _check(spark, _adversarial_cents())


def test_exact_cents_roundtrip_hypothesis(spark):
    batches: list[list[int]] = []

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(10**12), max_value=10**12),
            min_size=1,
            max_size=40,
        )
    )
    def collect(cents):
        batches.append(cents)

    collect()
    merged = sorted({c for b in batches for c in b})
    # ONE Spark job for the whole sweep (per-example jobs would take minutes)
    _check(spark, merged)
