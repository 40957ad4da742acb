"""Range join: point-in-interval, bucketized so it scales.

The reference's engine (like most SQL engines) would express "which
interval does this value fall in" as an inequality join
(``p.x BETWEEN i.lo AND i.hi``). Spark executes a bare inequality join as
BroadcastNestedLoopJoin (fine when one side is tiny) or falls back to a
cartesian product — O(N·M) either way, which is fatal when both sides are
large at 100 TB.

The scale-safe plan is the classic *banded* range join:

1. pick a bucket width ``W`` (≈ the median interval length);
2. points map to one bucket: ``floor(x / W)``;
3. intervals explode to every bucket they overlap:
   ``sequence(floor(lo / W), floor(hi / W))`` — cheap when intervals are
   not much wider than ``W``;
4. equi-join on the bucket id (hash shuffle, AQE-planned, skew-splittable
   like any other equi-join);
5. residual filter ``x BETWEEN lo AND hi`` removes same-bucket misses.

Each (point, interval) match is produced exactly once: the pair meets
only in the point's single bucket. Cost is |points| + Σ ceil(len/W)
interval replicas instead of |points|·|intervals|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each row of ``points`` to every ``intervals`` row whose
    ``[lo_col, hi_col]`` (inclusive both ends) contains ``point_col``.

    Output columns = points' + intervals'. ``how`` may be ``inner`` or
    ``left`` (unmatched points kept with nulls, still exactly-once).
    ``bucket_width`` trades replication for selectivity: ~the typical
    interval length is a good default.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")

    def _bucket(c: Column) -> Column:
        return F.floor(c / F.lit(float(bucket_width))).cast("long")

    pts = points.withColumn(_BUCKET, _bucket(F.col(point_col)))
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(_bucket(F.col(lo_col)), _bucket(F.col(hi_col)))),
    )
    residual = (pts[point_col] >= ivs[lo_col]) & (pts[point_col] <= ivs[hi_col])
    joined = pts.join(ivs, (pts[_BUCKET] == ivs[_BUCKET]) & residual, how)
    return joined.drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join interval rows that overlap: ``l.lo <= r.hi AND r.lo <= l.hi``
    (closed intervals). Both sides explode to their covered buckets; the
    pair is deduplicated to exactly-once by keeping only the bucket that
    contains the overlap's start (``greatest(l.lo, r.lo)``)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def _bucket(c: Column) -> Column:
        return F.floor(c / F.lit(float(bucket_width))).cast("long")

    l = left.withColumn(
        _BUCKET,
        F.explode(F.sequence(_bucket(F.col(left_lo)), _bucket(F.col(left_hi)))),
    )
    r = right.withColumn(
        _BUCKET,
        F.explode(F.sequence(_bucket(F.col(right_lo)), _bucket(F.col(right_hi)))),
    )
    overlap = (l[left_lo] <= r[right_hi]) & (r[right_lo] <= l[left_hi])
    # exactly-once guard: emit the pair only from the overlap-start bucket
    first_bucket = _bucket(F.greatest(l[left_lo], r[right_lo]))
    joined = l.join(
        r, (l[_BUCKET] == r[_BUCKET]) & overlap & (l[_BUCKET] == first_bucket), "inner"
    )
    return joined.drop(_BUCKET)
