"""Time-series regularization: resample an irregular event stream onto a
fixed time grid with last-observation-carried-forward (LOCF) gap fill —
the standard prep step before any per-entity sequence modeling (feature
stores, survival curves, activity models) and a capability the reference
engine (a single-pass batch script) has no analog for.

Shape: one aggregation to bucket observations, one tiny per-key bounds
aggregate, a JVM-side ``explode(sequence(...))`` to generate the grid
(no Python in the row-multiplication path, same stance as
``sample_frames``), a left join back to the observations, and one
ordered window for the carry-forward. Scale: everything shuffles on the
entity key only; the grid fan-out is bounded by span/step per key, and
skewed long-lived keys can be range-split by bucketing the grid before
the window if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNITS = {"hour": "1 hour", "day": "1 day", "week": "1 week"}


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
) -> DataFrame:
    """Resample ``df`` onto a per-key ``unit`` grid spanning each key's
    [first, last] bucket, carrying the last observed value forward
    through gaps. Per-bucket observation = ``max(value)`` (a
    deterministic, accumulation-order-free representative — exactly
    reproducible on any engine). Returns one row per (key, bucket):
    ``v_locf`` (gap-filled), ``n_obs`` (0 on gap rows), ``is_gap``.

    The first bucket per key is an observation by construction, so
    ``v_locf`` is never NULL."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    obs = df.groupBy(F.col(key_col).alias("k"), bucket).agg(
        F.max(value_col).alias("v_obs"),
        F.count("*").alias("n_obs"),
    )
    bounds = obs.groupBy("k").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "k",
        F.explode(
            F.expr(f"sequence(lo, hi, interval {_UNITS[unit]})")
        ).alias("bucket"),
    )
    joined = grid.join(obs, ["k", "bucket"], "left")
    carry = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col("k").alias(key_col),
        "bucket",
        F.last("v_obs", ignorenulls=True).over(carry).alias("v_locf"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        F.col("v_obs").isNull().alias("is_gap"),
    )
