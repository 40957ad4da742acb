"""Sketch aggregates: the re-aggregatable approximations that replace
exact distinct/percentile at 100 TB.

Exact COUNT(DISTINCT) shuffles every distinct value; exact percentile()
shuffles every row's value. Sketches bound both: a fixed-size summary per
group per partition, merged associatively — so the shuffle carries KiB
per group regardless of data volume, and pre-aggregated sketches can be
stored and re-merged across days/partitions without touching raw data
(the "rollup" property no exact aggregate has).

Estimates are engine-specific (Spark's HLL++/Datasketches vs DuckDB's
HLL), so the raw estimates can never hash-match an oracle. Instead each
query emits the *accuracy contract itself* as hashable columns: the exact
value (computed by both engines) plus a boolean
``abs(approx − exact) ≤ eps`` verdict computed Spark-side, with the
oracle asserting ``TRUE``. A sketch drifting outside its error bound
flips the boolean and fails the driver's value-hash — the contract is
driver-gated, not merely pytest-pinned (``tests/test_sketches.py`` still
covers mergeability and tighter error curves).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.plans.catalog import _t, query


@query(
    "sketch_users_by_type",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_5pct,
           TRUE AS direct_within_10pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Per-event-type distinct users twice over: approx_count_distinct "
    "(HLL++, fixed ~KB state per group) and an explicit Datasketches HLL "
    "built per 8-way subgroup then merged with hll_union_agg — proving "
    "the sketch is mergeable, i.e. daily partial sketches roll up without "
    "re-reading raw events. The output is the hashable contract: exact "
    "distinct (both engines compute it) + a ≤5%-relative-error boolean "
    "per sketch, TRUE-asserted by the oracle, so estimator drift fails "
    "the driver hash. Scale: the exact column exists only to gate the "
    "contract; production rollups ship the sketch alone — shuffle carries "
    "|types|×KB, not |distinct users|.",
)
def sketch_users_by_type(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    # stage 1: one sketch per (type, subgroup) — stands in for per-day
    # / per-file partial aggregation
    # gated bounds sit WELL ABOVE the configured estimator error (ADVICE
    # r4: a bound equal to the estimator's own standard error fails
    # ~1-in-3 per group once cardinalities leave the near-exact sparse
    # range): hll_sketch_agg at lgConfigK=14 → ~0.8% rel. std err, 5%
    # bound ≈ 6σ; approx_count_distinct at rsd=0.02 → 10% bound = 5σ.
    # (rsd=0.01 would allow a 5% bound but costs ~3.4 s/run at sf0.1 —
    # HLL++ register count grows ~1/rsd²; 0.02 keeps the query ~1 s with
    # equivalent contract headroom.)
    partial = (
        events.withColumn("sub", (F.col("user_id") % 8).cast("int"))
        .groupBy("event_type", "sub")
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    )
    merged = partial.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("direct_est"),
        F.count_distinct("user_id").alias("exact_users"),
    )

    def within(est, eps):  # ≤eps relative error vs exact
        return (F.abs(F.col(est) - F.col("exact_users"))
                <= eps * F.col("exact_users"))

    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            within("merged_est", 0.05).alias("merged_within_5pct"),
            within("direct_est", 0.10).alias("direct_within_10pct"),
        )
        .orderBy("event_type")
    )


#: The quantile sketch's accuracy parameter AND the rank slack the gated
#: contract grants: GK guarantees rank error ≤ n/accuracy; +1 row because
#: approx_percentile returns an actual data point while the target rank
#: is a continuous position.
_PCT_ACCURACY = 10_000
_PCT_TARGETS = (0.5, 0.95, 0.99)


@query(
    "sketch_value_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           TRUE AS p50_rank_ok,
           TRUE AS p95_rank_ok,
           TRUE AS p99_rank_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Per-event-type approx_percentile (p50/p95/p99) — the bounded-memory "
    "quantile sketch that actually ships at 100 TB (state is O(1/accuracy) "
    "per group instead of a full sort of every value). Output is the "
    "hashable contract: exact percentiles (Spark percentile() ≡ DuckDB "
    "quantile_cont, bit-equal after round(4) — same technique as "
    "value_percentiles_by_type) plus a per-quantile RANK contract boolean "
    "the oracle asserts TRUE. The rank form is the estimator's actual "
    "guarantee: the returned element's rank interval [#(<a), #(<=a)] must "
    "cover the target quantile within n/accuracy + 1 rows. (A value-eps "
    "contract — round 4 — is data-dependent: approx_percentile SELECTS a "
    "data point, so with a sparse tail the adjacent order statistic "
    "legitimately sits far away in VALUE while being 1 row away in RANK; "
    "observed failing at sf0.001 and fixed round 5.) Scale: the rank "
    "audit is one extra broadcast join + aggregate over the same scan "
    "shape; production ships the sketch alone.",
)
def sketch_value_quantiles(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    approx = F.percentile_approx("value", list(_PCT_TARGETS), _PCT_ACCURACY)
    exact = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    agg = events.groupBy("event_type").agg(
        approx.alias("a"), exact.alias("e"), F.count("*").alias("n")
    )
    # rank audit: one more pass over events counts, per group, how many
    # values fall strictly below / at-or-below each approx result. The
    # 6-row agg is broadcast — the join adds no shuffle to the scan side.
    ranked = events.select("event_type", "value").join(
        F.broadcast(agg), "event_type"
    )
    counts = ranked.groupBy("event_type").agg(
        *[
            F.sum(
                F.when(F.col("value") < F.col("a")[i], 1).otherwise(0)
            ).alias(f"lo{i}")
            for i in range(len(_PCT_TARGETS))
        ],
        *[
            F.sum(
                F.when(F.col("value") <= F.col("a")[i], 1).otherwise(0)
            ).alias(f"hi{i}")
            for i in range(len(_PCT_TARGETS))
        ],
    )

    def rank_ok(i: int):
        # target continuous rank p*(n-1)+1 must fall inside the returned
        # element's rank interval, widened by the guaranteed rank error
        slack = F.col("n") / _PCT_ACCURACY + F.lit(1.0)
        target = F.lit(_PCT_TARGETS[i]) * (F.col("n") - 1) + 1
        return (F.col(f"lo{i}") - slack <= target) & (
            target <= F.col(f"hi{i}") + slack
        )

    return (
        agg.join(counts, "event_type")
        .select(
            "event_type",
            F.round(F.col("e")[0], 4).alias("p50"),
            F.round(F.col("e")[1], 4).alias("p95"),
            F.round(F.col("e")[2], 4).alias("p99"),
            rank_ok(0).alias("p50_rank_ok"),
            rank_ok(1).alias("p95_rank_ok"),
            rank_ok(2).alias("p99_rank_ok"),
        )
        .orderBy("event_type")
    )


@query(
    "cms_heavy_hitters",
    """
    WITH counters AS (
      SELECT i,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                             CAST(i * 8 + 1 AS INTEGER), 8))::BIGINT
               % 256 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events CROSS JOIN range(4) t(i)
      GROUP BY i, bucket
    ), topk AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY user_id
      ORDER BY true_cnt DESC, user_id ASC LIMIT 10
    ), probes AS (
      SELECT user_id, true_cnt, i,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                             CAST(i * 8 + 1 AS INTEGER), 8))::BIGINT
               % 256 AS bucket
      FROM topk CROSS JOIN range(4) t(i)
    )
    SELECT p.user_id, p.true_cnt, CAST(MIN(c.c) AS BIGINT) AS est_cnt
    FROM probes p JOIN counters c ON c.i = p.i AND c.bucket = p.bucket
    GROUP BY p.user_id, p.true_cnt
    ORDER BY p.true_cnt DESC, p.user_id ASC
    """,
    "Count-min sketch heavy hitters — the third sketch family (HLL = "
    "distincts, KLL/GK = quantiles, CMS = frequencies): a fixed d=4 × "
    "w=256 counter matrix built with the portable md5 cross-engine "
    "anchor — ONE md5 per row, its 32 hex chars split into four "
    "independent 8-char chunks, one bucket per sketch row (4× fewer "
    "hashes than hashing (key,i) pairs; measured ~25% off the query) — "
    "point-queried for "
    "the true top-10 keys as est = min over rows of the key's counter. "
    "With a FIXED seeded family the estimate is deterministic, so both "
    "engines compute IDENTICAL integers and the gate is a full value "
    "hash — stronger than the HLL/quantile contract booleans (those "
    "estimators are engine-specific; this one is the spec). est ≥ true "
    "always (collisions only add), visible in the gated pairs. Scale: "
    "the sketch is 1024 counters regardless of corpus — the groupBy IS "
    "the merge (map-side partials = per-partition sketches), daily "
    "sketches re-merge by summing counters, and the probe join "
    "broadcasts a ≤1024-row relation.",
)
def cms_heavy_hitters(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    d, w = 4, 256

    def buckets(df, key_col):
        """ONE md5 per row; sketch-row i's bucket = hex chunk i (8
        chars = 32 bits) mod w, fanned out JVM-side with stack()."""
        h = F.md5(F.col(key_col).cast("string"))
        withb = df.withColumn("_h", h).select(
            "*",
            *[
                (
                    F.conv(F.substring("_h", i * 8 + 1, 8), 16, 10).cast("long")
                    % w
                ).alias(f"_b{i}")
                for i in range(d)
            ],
        )
        stack = ", ".join(f"{i}, _b{i}" for i in range(d))
        return withb.selectExpr(
            *[c for c in df.columns], f"stack({d}, {stack}) AS (i, bucket)"
        )

    counters = (
        buckets(events.select("user_id"), "user_id")
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    topk = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(10)
    )
    probes = buckets(topk, "user_id")
    return (
        probes.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
    )
