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


def trailing_range_window(
    df: DataFrame,
    part_col: str,
    order_col: str,
    preceding: int,
    aggs: "dict[str, object]",
) -> DataFrame:
    """Trailing RANGE-frame window (``RANGE BETWEEN preceding PRECEDING
    AND CURRENT ROW`` over an integer ``order_col``, partitioned by
    ``part_col``) as a CHUNKED segmented scan — the skew-proof form of
    Spark's per-key window (r14, found by the 100x Zipf soak: a window
    PARTITION BY puts every row of a key in ONE task, so a hot key
    holding 10% of a 15M-row table ran 5.5x slow, and at 100 TB the
    task is 10% of the table — a non-starter).

    Shape: each row lands in chunk ``floor(order / (preceding+1))`` as
    an OWN row and is replicated into the next chunk as CONTEXT; the
    window then partitions by (key, chunk). For a row at order value d
    in chunk c (width W = preceding+1): d - preceding >= cW - (W-1) =
    (c-1)W + 1, so its entire frame lives in chunks c-1 and c — and the
    (key, chunk-c) partition holds exactly own(c) ∪ context(c-1). The
    RANGE frame selects by VALUE, so surplus context rows outside
    [d-preceding, d] contribute nothing; context rows' own (wrong)
    frames are dropped by the _ctx filter. Values are therefore
    IDENTICAL to the one-partition window for order-insensitive
    aggregates (integer SUM/COUNT/MIN/MAX — float sums would re-
    associate and are the caller's responsibility to pre-quantize,
    per the catalog's exact-cents convention).

    Cost/bound: 2x rows shuffled (own + context), max task size =
    2 x (hot key's rows per W-wide chunk) — bounded by the key's TIME
    DENSITY instead of its total row count, which is the quantity that
    stays small when a table grows by adding history. ``aggs`` maps
    output column -> callable(WindowSpec) -> Column, e.g.
    ``{"s": lambda w: F.sum("cents").over(w)}``.
    """
    from pyspark.sql import Window

    width = preceding + 1
    chunk = F.floor(F.col(order_col) / F.lit(width))
    own = df.withColumn("_chunk", chunk).withColumn("_ctx", F.lit(False))
    ctx = df.withColumn("_chunk", chunk + 1).withColumn("_ctx", F.lit(True))
    u = own.unionByName(ctx)
    w = (
        Window.partitionBy(part_col, "_chunk")
        .orderBy(order_col)
        .rangeBetween(-preceding, Window.currentRow)
    )
    out = u.select(
        *df.columns,
        "_ctx",
        *[fn(w).alias(name) for name, fn in aggs.items()],
    )
    return out.filter(~F.col("_ctx")).drop("_ctx", "_chunk")
