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


def _chunk_id(order_col: str, width: int) -> "F.Column":
    """Chunk id for an integer order column via EXACT integer division
    (r14 ADVICE: ``F.floor(col / lit(width))`` goes through
    double-precision division, which can assign a wrong chunk for
    values approaching 2^53 or quotients within half an ulp of an
    integer — silently breaking the chunked operators' value-identity
    claims). ``div`` truncates toward zero rather than flooring, which
    is harmless here: the induced intervals are contiguous, monotone in
    the order value, and every interval is at least ``width`` wide (the
    one around zero is 2*width-1), which is all the chunk proofs use —
    a width-``width`` frame still spans at most two consecutive chunks,
    and prefix/lag corrections only need monotone grouping. NULL order
    values raise loudly instead of silently mis-grouping (see the
    callers' non-null contracts)."""
    return F.when(
        F.col(order_col).isNotNull(),
        F.expr(f"{order_col} div {int(width)}"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"chunked operator: NULL in order column '{order_col}' — "
                f"the naive per-key window keeps NULL-ordered rows "
                f"(NULLS FIRST) but the chunked plan would silently drop "
                f"them at the stats join; filter or impute them first"
            )
        ).cast("long")
    )


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
    chunk = _chunk_id(order_col, width)
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


def chunked_gap_sessionize(
    df: DataFrame,
    key: str,
    us_col: str,
    tie_col: str,
    gap_us: int,
    chunk_us: int = 86_400_000_000,
) -> DataFrame:
    """Gap-based sessionization (lag + running flag sum per key) as a
    CHUNKED two-level computation — the skew-proof form of the classic
    one-partition-per-key idiom (r14 Zipf soak: the per-key window
    family is the wall a volume soak cannot see; a hot key's entire
    history lands in ONE task).

    Returns ``(key, us_col, tie_col, sess_idx)`` with ``sess_idx``
    VALUE-IDENTICAL to::

        is_new = lag(us) IS NULL OR us - lag(us) > gap_us   (per key)
        sess_idx = SUM(is_new) OVER (PARTITION BY key
                                     ORDER BY us, tie ROWS UNBOUNDED)

    Construction (all exact integers, so identity is by associativity,
    not luck):

    1. rows land in chunk ``floor(us / chunk_us)``; within
       (key, chunk) a PROVISIONAL flag uses the within-chunk lag (a
       chunk's first row flags 1 unconditionally — its true previous
       row lives in an earlier chunk), and a local running sum
       ``_lcum`` accumulates provisional flags;
    2. the per-(key, chunk) stats relation — first/last event time and
       the provisional flag total; ONE ROW PER NON-EMPTY CHUNK per key,
       so its per-key windows are bounded by the key's TIME RANGE /
       chunk_us, never by its row count — computes each chunk's TRUE
       first-row flag (prev non-empty chunk's last_us vs this chunk's
       first_us) and the exclusive prefix ``_off`` of corrected totals;
    3. rows join the stats on (key, chunk):
       ``sess_idx = _lcum - 1 + _tff + _off`` (the -1 removes the
       provisional first-row flag, _tff restores the true one).

    Unlike :func:`trailing_range_window` no context replication is
    needed (lag wants one value, carried through the stats relation),
    so the big side shuffles 1x on (key, chunk). Max task = the key's
    rows per chunk_us of event time (default: per DAY) — time-density
    bounded, like every fix in this family.

    NON-NULL contract on ``us_col`` (r14 ADVICE): the naive window
    keeps NULL-timestamped rows (NULLS FIRST) while this plan's
    (key, chunk) stats join would silently drop them — so a NULL order
    value raises at runtime (:func:`_chunk_id`) instead of diverging
    silently; filter or impute NULLs before calling.
    """
    from pyspark.sql import Window

    us, tie = F.col(us_col), F.col(tie_col)
    base = df.select(
        key,
        us_col,
        tie_col,
        _chunk_id(us_col, chunk_us).alias("_chunk"),
    )
    w = Window.partitionBy(key, "_chunk").orderBy(us_col, tie_col)
    lag_us = F.lag(us_col).over(w)
    flagged = base.select(
        key,
        us_col,
        tie_col,
        "_chunk",
        F.when(lag_us.isNull() | (us - lag_us > gap_us), 1)
        .otherwise(0)
        .alias("_pflag"),
    )
    local = flagged.select(
        key,
        us_col,
        tie_col,
        "_chunk",
        F.sum("_pflag")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_lcum"),
    )
    # one row per non-empty (key, chunk): the agg reuses the window's
    # (key, chunk) partitioning — no extra big-side shuffle
    stats = flagged.groupBy(key, "_chunk").agg(
        F.min(us_col).alias("_first_us"),
        F.max(us_col).alias("_last_us"),
        F.sum("_pflag").alias("_ptotal"),
    )
    wc = Window.partitionBy(key).orderBy("_chunk")
    prev_last = F.lag("_last_us").over(wc)
    tff = F.when(
        prev_last.isNull() | (F.col("_first_us") - prev_last > gap_us), 1
    ).otherwise(0)
    corrected = stats.select(
        key,
        "_chunk",
        tff.alias("_tff"),
        (F.col("_ptotal") - 1 + tff).alias("_ctotal"),
    )
    off = corrected.select(
        key,
        "_chunk",
        "_tff",
        F.coalesce(
            F.sum("_ctotal").over(
                wc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    # NULL-SAFE key join (r15 high-null soak): the naive window groups
    # NULL keys into one partition like any other key, but a plain
    # equi-join on the key would never match NULL and silently drop
    # that whole slice — exactly the corpus (50% missing user ids)
    # where this lever matters most. eqNullSafe keeps value identity;
    # the (key, chunk) hash still spreads the NULL key's rows across
    # chunks.
    off_r = off.withColumnRenamed(key, "_k2").withColumnRenamed(
        "_chunk", "_c2"
    )
    return local.join(
        off_r,
        F.col(key).eqNullSafe(F.col("_k2"))
        & (F.col("_chunk") == F.col("_c2")),
    ).select(
        key,
        us_col,
        tie_col,
        (F.col("_lcum") - 1 + F.col("_tff") + F.col("_off")).alias(
            "sess_idx"
        ),
    )


def chunked_lag(
    df: DataFrame,
    key: str,
    order_col: str,
    tie_col: str,
    chunk_width: int,
    out_col: str = "prev_order",
) -> DataFrame:
    """``lag(order_col) OVER (PARTITION BY key ORDER BY order_col,
    tie_col)`` as a chunked two-level computation — the skew-proof form
    of the per-key lag that feeds inter-event-gap analyses (r14 Zipf
    soak: event_gap_stats ran 8.1 s at 30%-hot vs 1.9 s uniform on the
    one-partition plan).

    Returns ``df``'s columns plus ``out_col`` = the previous row's
    ORDER VALUE in the per-key (order, tie) total order (NULL for the
    key's first row ever) — exactly what a gap computation needs.
    Within (key, chunk) the local lag is correct for every row but the
    chunk's first; that row's true predecessor is the last row of the
    key's previous NON-EMPTY chunk, whose order value is that chunk's
    MAX — carried through the tiny per-(key, chunk) stats relation
    (one row per non-empty chunk; its per-key window is bounded by the
    key's order-range / chunk_width, never by row count). Values are
    identical to the naive window by construction; the big side
    shuffles once on (key, chunk) and the stats join reuses that
    partitioning. Parked lever (like chunked_gap_sessionize): the
    measured crossover for this family sits just above 10%-on-one-key
    at factor-100 volumes — wire it per-query only where a measured
    skew point pays, with the PLANS.md ladder as the guide.

    NON-NULL contract on ``order_col`` (r14 ADVICE): the naive lag
    keeps NULL-ordered rows (NULLS FIRST) while this plan's stats join
    would silently drop them — a NULL order value raises at runtime
    (:func:`_chunk_id`); filter or impute NULLs before calling.
    """
    from pyspark.sql import Window

    base = df.withColumn("_chunk", _chunk_id(order_col, chunk_width))
    w = Window.partitionBy(key, "_chunk").orderBy(order_col, tie_col)
    local = base.withColumn("_lprev", F.lag(order_col).over(w))
    stats = base.groupBy(key, "_chunk").agg(F.max(order_col).alias("_last"))
    wc = Window.partitionBy(key).orderBy("_chunk")
    t = stats.select(
        key, "_chunk", F.lag("_last").over(wc).alias("_prev_last")
    )
    # null-safe key join — same reasoning as chunked_gap_sessionize:
    # the naive lag keeps the NULL-key slice; a plain equi-join drops it
    t_r = t.withColumnRenamed(key, "_k2").withColumnRenamed("_chunk", "_c2")
    return (
        local.join(
            t_r,
            F.col(key).eqNullSafe(F.col("_k2"))
            & (F.col("_chunk") == F.col("_c2")),
        )
        .select(
            *df.columns,
            F.coalesce(F.col("_lprev"), F.col("_prev_last")).alias(out_col),
        )
    )


def chunked_staged_funnel(
    df: DataFrame,
    key: str,
    us_col: str,
    tie_col: str,
    stage_col: str,
    stages: "tuple[str, str, str]",
    chunk_us: int = 86_400_000_000,
) -> DataFrame:
    """Ordered three-stage funnel (stage1 → stage2 → stage3, in
    (order, tie) sequence per key) as a CHUNKED state-machine
    computation — the skew-proof form of the three-chained-running-max
    idiom (r15 high-null soak: the naive plan puts a NULL-heavy or hot
    key's entire history in ONE window task — funnel_conversion
    measured 6.3x at factor 100 / 50% NULL keys).

    Returns ``(key, m1, m2, m3)`` with mK = 1 iff the key reached
    funnel stage K — VALUE-IDENTICAL to the naive chained windows::

        r1 = max(type==s1)            OVER (key ORDER us,tie ROWS UNB..CUR)
        r2 = max(type==s2 AND r1)     OVER (...)
        r3 = max(type==s3 AND r2)     OVER (...)
        mK = max(rK) per key

    Why it composes: the running flags are MONOTONE, so per key only
    the FINAL state S in {0,1,2,3} matters (mK = S>=K), and a chunk of
    the sequence acts on the entering state as a monotone transfer
    function determined by six within-chunk bits, each computable with
    the SAME chained-window shape on the bounded (key, chunk)
    partition:

    - entering 0: a1/a2/a3 = the naive chain run inside the chunk;
    - entering 1 (a stage-1 event exists strictly earlier, so every
      in-chunk stage-2 event qualifies): b2 = any stage2, b3 = any
      stage3 at-or-after the chunk's first stage2;
    - entering 2: c3 = any stage3 (all qualify);
    - entering 3: absorbing.

    The per-key merge folds the per-chunk six-bit states in chunk
    order (exact integers, one tiny row per non-empty chunk — an
    AGGREGATION, not a join, so NULL keys need no special casing).
    Rows with equal order values land in the same chunk (the chunk is
    a function of the order value), so cross-chunk ties cannot split a
    tie group. NULL order values raise loudly (:func:`_chunk_id`).

    Cost: 6 window functions over ONE bounded (key, chunk) window vs
    the naive 3 over the unbounded key window — ~2x compute at
    uniform, which is why callers flip adaptively (footer null-frac
    probe) instead of unconditionally."""
    from pyspark.sql import Window

    s1, s2, s3 = stages
    base = df.select(
        key,
        us_col,
        tie_col,
        F.col(stage_col).alias("_st"),
        _chunk_id(us_col, chunk_us).alias("_chunk"),
    )
    w = (
        Window.partitionBy(key, "_chunk")
        .orderBy(us_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is1 = (F.col("_st") == s1).cast("int")
    is2 = (F.col("_st") == s2).cast("int")
    is3 = (F.col("_st") == s3).cast("int")
    rv = F.max(is1).over(w)
    flags = base.withColumn("_rv", rv)
    flags = flags.withColumn(
        "_rc0", F.max(((F.col("_st") == s2) & (F.col("_rv") == 1)).cast("int")).over(w)
    )
    flags = flags.withColumn(
        "_rp0", F.max(((F.col("_st") == s3) & (F.col("_rc0") == 1)).cast("int")).over(w)
    )
    flags = flags.withColumn("_rc1", F.max(is2).over(w))
    flags = flags.withColumn(
        "_rp1", F.max(((F.col("_st") == s3) & (F.col("_rc1") == 1)).cast("int")).over(w)
    )
    per_chunk = flags.groupBy(key, "_chunk").agg(
        F.max("_rv").alias("a1"),
        F.max("_rc0").alias("a2"),
        F.max("_rp0").alias("a3"),
        F.max("_rc1").alias("b2"),
        F.max("_rp1").alias("b3"),
        F.max(is3).alias("c3"),
    )
    st = F.struct(
        F.col("_chunk").alias("ch"),
        F.col("a1").alias("a1"),
        F.col("a2").alias("a2"),
        F.col("a3").alias("a3"),
        F.col("b2").alias("b2"),
        F.col("b3").alias("b3"),
        F.col("c3").alias("c3"),
    )
    final = F.aggregate(
        F.array_sort(F.collect_list(st)),
        F.lit(0),
        lambda s, c: F.when(s >= 3, F.lit(3))
        .when(
            s == 2,
            F.when(c.c3 == 1, F.lit(3)).otherwise(F.lit(2)),
        )
        .when(
            s == 1,
            F.when(c.b3 == 1, F.lit(3))
            .when(c.b2 == 1, F.lit(2))
            .otherwise(F.lit(1)),
        )
        .otherwise(
            F.when(c.a3 == 1, F.lit(3))
            .when(c.a2 == 1, F.lit(2))
            .when(c.a1 == 1, F.lit(1))
            .otherwise(F.lit(0))
        ),
    )
    return per_chunk.groupBy(key).agg(final.alias("_s")).select(
        key,
        (F.col("_s") >= 1).cast("int").alias("m1"),
        (F.col("_s") >= 2).cast("int").alias("m2"),
        (F.col("_s") >= 3).cast("int").alias("m3"),
    )
