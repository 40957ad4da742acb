"""Skew mitigation: salted join for hot keys.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit,
planner-independent form for the pathological case — one key carrying a
double-digit percentage of a 100 TB fact table:

- the BIG side gets a uniform random salt in [0, buckets);
- the SMALL side is replicated ``buckets`` times (one copy per salt);
- the join key becomes (key, salt), spreading the hot key's rows over
  ``buckets`` tasks.

Cost: small side inflated ×buckets (fine — it is small), big side
untouched. Result is provably identical to the unsalted join: every big
row meets exactly one replica of each matching small row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on key equality, salted over ``buckets``
    partitions per key. Output columns = big's + small's (keys included),
    like a plain equi-join."""
    spark = big.sparkSession
    big_s = big.withColumn("_salt", (F.rand(seed=42) * buckets).cast("int"))
    salts = spark.range(buckets).select(F.col("id").cast("int").alias("_salt"))
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return joined.drop("_salt")
