"""resample_locf semantics on a hand-built frame: grid bounds, gap
flags, carry-forward values, and unit validation."""

from __future__ import annotations

import datetime as dt

import pytest

from amsterdam_map_data_wrangling_spark.operators.timeseries import resample_locf


def test_resample_locf_fills_gaps_with_last_observation(spark):
    T = lambda d, h=0: dt.datetime(2024, 1, d, h)
    rows = [
        # user 1: days 1, 2, 5 observed -> 3, 4 are gaps carrying day-2
        (1, T(1, 3), 10.0), (1, T(2, 4), 20.0), (1, T(2, 9), 15.0),
        (1, T(5, 1), 50.0),
        # user 2: single day -> single-row grid, no gaps
        (2, T(4, 7), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {
        (r["user_id"], r["bucket"].day): (r["v_locf"], r["n_obs"], r["is_gap"])
        for r in resample_locf(df, "user_id", "ts", "value").collect()
    }
    assert len(out) == 6  # user 1: days 1-5; user 2: day 4
    assert out[(1, 1)] == (10.0, 1, False)
    assert out[(1, 2)] == (20.0, 2, False)  # max(20, 15)
    assert out[(1, 3)] == (20.0, 0, True)   # gap carries day-2
    assert out[(1, 4)] == (20.0, 0, True)
    assert out[(1, 5)] == (50.0, 1, False)
    assert out[(2, 4)] == (7.0, 1, False)


def test_resample_locf_rejects_unknown_unit(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)],
        "user_id int, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="unit"):
        resample_locf(df, "user_id", "ts", "value", unit="fortnight")
