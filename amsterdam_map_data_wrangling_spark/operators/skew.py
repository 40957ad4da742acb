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
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join ``big`` with ``small`` on key equality, salted over ``buckets``
    partitions per key. Output columns = big's + small's (keys included),
    like a plain equi-join.

    Only ``inner`` and ``left`` (big-preserving) joins are valid: the small
    side is replicated ×buckets, so a right/full/semi/anti join would emit
    every unmatched small-side replica — silently wrong results.

    ``force_sort_merge`` pins the shuffle (SortMergeJoin) strategy via a
    join hint. Salting only matters in the shuffle regime — if either side
    can broadcast there is no reducer to skew — but at test scale the
    planner would happily broadcast the "big" side and silently bypass the
    very plan the operator exists to demonstrate; production callers on a
    genuinely unbroadcastable fact table can leave the planner free."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (big side preserved), "
            f"got {how!r}: the ×{buckets} small-side replication would "
            f"duplicate unmatched small rows under {how!r}"
        )
    spark = big.sparkSession
    big_s = big.withColumn("_salt", (F.rand(seed=42) * buckets).cast("int"))
    if force_sort_merge:
        big_s = big_s.hint("merge")
    salts = spark.range(buckets).select(F.col("id").cast("int").alias("_salt"))
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return joined.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    salt_col: str,
    aggs: dict[str, str],
    buckets: int = 8,
) -> DataFrame:
    """Two-stage salted aggregation for skewed group keys: stage 1 groups
    on (key, salt) — spreading a hot key over ``buckets`` reducers — and
    stage 2 merges the partials per key.

    ``aggs`` maps output column → one of 'count' | 'sum:<col>'. The salt
    must be deterministic (here: a data column mod buckets) so the result
    is reproducible and oracle-checkable; a production pipeline can use
    any uniform function of the row.

    Spark's hash aggregation already map-side-combines, which handles
    *moderate* skew; explicit salting is for the pathological key whose
    post-combine partials still overwhelm one reducer — the two-stage
    shape caps any reducer's load at 1/buckets of the hot key. Identical
    results by associativity of count/sum."""
    salt = (F.col(salt_col) % buckets).alias("_salt")
    partials = []
    merges = []
    for out, spec in aggs.items():
        if spec == "count":
            partials.append(F.count("*").alias(f"_p_{out}"))
        else:
            partials.append(F.sum(spec.split(":", 1)[1]).alias(f"_p_{out}"))
        merges.append(F.sum(f"_p_{out}").alias(out))
    stage1 = df.groupBy(F.col(key), salt).agg(*partials)
    return stage1.groupBy(key).agg(*merges)
