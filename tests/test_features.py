"""winsorize vs numpy's linear-interpolation percentiles (the definition
percentile_cont / Spark percentile share)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.features import winsorize
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_ORACLE


def test_winsorize_matches_numpy_percentiles(spark):
    orders = load_tables(spark, SF_ORACLE, ["orders"])["orders"]
    out = winsorize(orders, "o_totalprice", 0.05, 0.95).select(
        "o_totalprice", "o_totalprice_w", "clip_flag"
    )
    rows = out.collect()
    vals = np.array([r["o_totalprice"] for r in rows])
    lo, hi = np.percentile(vals, [5, 95], method="linear")
    for r in rows:
        want = min(max(r["o_totalprice"], lo), hi)
        assert r["o_totalprice_w"] == pytest.approx(want, rel=1e-12)
        flag = -1 if r["o_totalprice"] < lo else (1 if r["o_totalprice"] > hi else 0)
        assert r["clip_flag"] == flag
    # ~5% clipped on each side
    n = len(rows)
    n_lo = sum(1 for r in rows if r["clip_flag"] == -1)
    n_hi = sum(1 for r in rows if r["clip_flag"] == 1)
    assert 0.03 * n < n_lo < 0.07 * n
    assert 0.03 * n < n_hi < 0.07 * n


def test_winsorize_approx_agrees_within_sketch_error(spark):
    orders = load_tables(spark, SF_ORACLE, ["orders"])["orders"]
    exact = winsorize(orders, "o_totalprice", 0.05, 0.95)
    approx = winsorize(orders, "o_totalprice", 0.05, 0.95, approx=True)
    ne = exact.filter(F.col("clip_flag") != 0).count()
    na = approx.filter(F.col("clip_flag") != 0).count()
    n = orders.count()
    # sketch cut points land within a small rank error of the exact ones
    assert abs(ne - na) < 0.01 * n
