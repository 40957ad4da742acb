"""Feature-engineering operators: outlier handling for numeric columns
feeding model training.

``winsorize`` clips a numeric column at its [lower, upper] percentiles —
the standard robust-scaling prep step. Two cut-point modes:

- exact (default here, and oracle-able against DuckDB ``quantile_cont``
  — the same cross-engine equivalence ``value_percentiles_by_type``
  already gates): ``percentile(col, p)`` — a full-accuracy aggregate;
  one pass + a tiny 1-row broadcast.
- approximate (the 100 TB path): ``approx_percentile`` with a bounded
  relative error — mergeable sketch partials, no full sort anywhere.

Either way the clamp itself is a narrow ``least(greatest(...))`` map and
the cut points travel as a broadcast 1-row relation — the whole operator
adds ONE small aggregate to the pipeline, no shuffle of the data column.

Queued for catalog registration at r07 (round-6 gate overflow at its
limit); verified by tests/test_features.py against numpy percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Return ``df`` with ``col`` clipped to its [lower, upper]
    percentile range (new column ``<col>_w``) plus a ``clip_flag``
    (-1 clipped low / 0 untouched / 1 clipped high). NULL inputs stay
    NULL in both new columns (r6 ADVICE: ``least``/``greatest`` skip
    NULLs, so an unguarded clamp would fabricate a lo-valued
    observation from a NULL)."""
    if approx:
        cuts = df.agg(
            F.approx_percentile(col, F.lit(lower), F.lit(accuracy)).alias("lo"),
            F.approx_percentile(col, F.lit(upper), F.lit(accuracy)).alias("hi"),
        )
    else:
        cuts = df.agg(
            F.percentile(col, F.lit(lower)).alias("lo"),
            F.percentile(col, F.lit(upper)).alias("hi"),
        )
    c = F.col(col)
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            f"{col}_w",
            F.when(
                c.isNotNull(),
                F.least(F.greatest(c, F.col("lo")), F.col("hi")),
            ),
        )
        .withColumn(
            "clip_flag",
            F.when(c.isNull(), F.lit(None).cast("int"))
            .when(c < F.col("lo"), F.lit(-1))
            .when(c > F.col("hi"), F.lit(1))
            .otherwise(F.lit(0)),
        )
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    wide_chars: "int | None" = None,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model with add-one smoothing — the CCNet/KenLM-style
    statistical-LM quality signal (perplexity filtering): documents of
    rare/garbled vocabulary score low, boilerplate scores high. Returns
    (id, n_tokens, mean_logprob).

    Model and scoring in one pipeline, no driver round-trip: token
    counts aggregate once (hashed terms — strings never shuffle), the
    vocabulary-sized model relation joins back to the token stream on
    the term hash, and the per-doc mean is one aggregation. ln on exact
    integer ratios, so both any oracle and a pure-Python reference
    compute identical doubles per token (the SUM is float-accumulation-
    order sensitive — gate rounded, as the tfidf family does).

    Scale: two shuffles (term-count agg; per-doc score agg) plus one
    term-key join whose build side is the vocabulary (broadcastable when
    the vocab is; here left to the planner/AQE). The 100 TB variant
    trains on a sample and scores the full corpus — same plan, smaller
    model side. Queued for catalog registration at r07.

    ``wide_chars`` (r15 wide-row soak, the axis's worst wall at 8.4x):
    everything downstream of the token relation is already row-level
    and parallel — the atomic cost is the split+md5 of a huge document
    in its reading task, run TWICE (the token relation feeds both the
    model aggregation and the scoring join). With ``wide_chars`` set,
    documents past it are token-segmented (``operators/widerow``) and
    redistributed so the md5 transform parallelizes per segment, and
    the unioned token relation is cut once with ``localCheckpoint`` so
    neither branch tokenizes twice. Token multiset per document is
    IDENTICAL (segments slice the same whitespace split), so the model,
    totals, counts, and per-token lp values are unchanged; only the
    float MEAN's partial-sum association differs, which the 6-decimal
    gate rounding absorbs by the same error budget as any hash-agg
    order change (|err| ~ 1e-9 on mean lp vs 5e-7 granularity). None
    (default) keeps the registered plan byte-identical."""

    def _hash_tok(t):
        # identity-only hash (counts + the model join; no gated output
        # carries the value) — xxhash64, not the md5 anchor the oracle
        # replays, per the shingle_hashes rule (r18 optimization round)
        return F.xxhash64(t)

    if wide_chars is None:
        toks = df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.split(F.trim(F.col(text_col)), r"\s+"), _hash_tok
                )
            ).alias("t"),
        )
    else:
        from amsterdam_map_data_wrangling_spark.operators.widerow import (
            token_segments,
        )

        is_wide = F.length(F.col(text_col)) > wide_chars
        narrow = df.filter(~is_wide).select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.split(F.trim(F.col(text_col)), r"\s+"), _hash_tok
                )
            ).alias("t"),
        )
        wide = (
            token_segments(df.filter(is_wide), id_col, text_col, 16_384)
            .repartition("id", "_seg")
            .select(
                "id",
                F.explode(F.transform("_toks", _hash_tok)).alias("t"),
            )
        )
        toks = narrow.unionByName(wide).localCheckpoint(eager=False)
    model = toks.groupBy("t").agg(F.count("*").alias("c"))
    totals = model.agg(
        F.sum("c").alias("n_total"),
        F.count("*").alias("n_vocab"),
    )
    scored = (
        toks.join(model, "t")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n_total") + F.col("n_vocab")).cast("double")
            ).alias("lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.avg("lp").alias("mean_logprob"),
    )


def robust_zscores(
    df: DataFrame, col: str, by: str | None = None, keep_stats: bool = False
) -> DataFrame:
    """Median/MAD robust z-scores (the outlier-resistant standardization:
    (x - median) / (1.4826 · MAD), consistent with σ under normality) —
    optionally per group ``by``. Returns the input plus ``<col>_rz``.

    Two aggregation passes by construction (MAD needs the median first),
    each a tiny per-group relation joined back broadcast; the data
    column itself never shuffles (``by=None`` degenerates to two 1-row
    broadcasts). Degenerate MAD = 0 (over half the group identical)
    yields NULL scores rather than ±inf — the honest answer.

    ``keep_stats=True`` keeps the per-group statistics as ``<col>_med``
    / ``<col>_mad`` columns so a caller reporting them does not re-run
    the two percentile passes (the r07 bench found the gate paying for
    FOUR percentile aggregations instead of two).

    Registered as ``robust_z_by_priority``; verified against
    numpy/scipy-convention reference in tests/test_features.py."""
    gcols = [by] if by else []
    x = F.col(col)
    if by:
        med = df.groupBy(by).agg(F.percentile(col, F.lit(0.5)).alias("_med"))
        with_med = df.join(F.broadcast(med), by)
    else:
        med = df.agg(F.percentile(col, F.lit(0.5)).alias("_med"))
        with_med = df.crossJoin(F.broadcast(med))
    if by:
        mad = with_med.groupBy(by).agg(
            F.percentile(F.abs(x - F.col("_med")), F.lit(0.5)).alias("_mad")
        )
        full = with_med.join(F.broadcast(mad), by)
    else:
        mad = with_med.agg(
            F.percentile(F.abs(x - F.col("_med")), F.lit(0.5)).alias("_mad")
        )
        full = with_med.crossJoin(F.broadcast(mad))
    rz = F.when(
        F.col("_mad") > 0,
        (x - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
    )
    out = full.withColumn(f"{col}_rz", rz)
    if keep_stats:
        return out.withColumnRenamed("_med", f"{col}_med").withColumnRenamed(
            "_mad", f"{col}_mad"
        )
    return out.drop("_med", "_mad")


def hash_rank_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: str = "spark-graft",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, selected by ranking each
    group on the portable md5 hash of (seed, id) — a deterministic,
    retry-stable uniform-without-replacement sample (rand() is per-task
    nondeterministic under retries; a hash rank is a pure function of
    the row). Complements the other two samplers: systematic
    (stratified_sample_counts) gives every-nth, mixture sampling gives
    per-source RATES; this gives an exact per-group COUNT — the "k
    examples per class" eval-set builder.

    Scale: one shuffle on the group key for the window rank. For heavy
    groups the window sorts within each group; if that bites, swap the
    rank for a threshold pre-filter (keep hash < ~k/|group| · 2^52,
    then rank the survivors) — same result, bounded sort input.

    Queued for catalog registration at r07 (row_number oracle)."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit("samp"), F.lit(seed), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    win = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rnk", F.row_number().over(win))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "spark-graft",
) -> DataFrame:
    """Weighted sampling without replacement, exactly min(k, |group|)
    rows per group — the A-ES scheme (Efraimidis & Spirakis 2006): each
    row draws u ~ U(0, 1] from the portable hash and is ranked by
    ln(u) / w (equivalent to the classic u^(1/w) key, monotone and
    overflow-free in log space); the top-k keys are a weighted sample
    without replacement. Deterministic and retry-stable like
    :func:`hash_rank_sample_per_group` (its uniform little sibling);
    rows with weight <= 0 are excluded, matching the scheme's domain.

    Scale: one shuffle on the group key for the window rank — identical
    shape to the uniform sampler. Queued for catalog registration at
    r07 (ln/division are IEEE-identical cross-engine on the exact-int
    hash inputs; gate with rounded keys like the tfidf family)."""
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit("wsamp"),
                        F.lit(seed),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(4503599627370496.0)  # (h+1)/2^52 in (0, 1]
    key = F.log(u) / F.col(weight_col)
    win = Window.partitionBy(group_col).orderBy(
        F.desc("_wkey"), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .withColumn("_rnk", F.row_number().over(win))
        .filter(F.col("_rnk") <= k)
        .drop("_wkey", "_rnk")
    )


def deterministic_shuffle(
    df: DataFrame, key_col: str, seed: str = "spark-graft"
) -> DataFrame:
    """Reproducible global shuffle for training-order export: rows sort
    by the portable md5 of (seed, key) with the key itself as the total
    tie-break — the SAME permutation on any engine, any cluster size,
    any retry (the property ``rand(seed)`` loses the moment
    partitioning changes, because Spark seeds rand per-partition).
    Re-seeding gives an independent permutation per epoch.

    Scale: a global sort = one range-partitioned shuffle (Spark samples
    key ranges, so output files come out in permutation order and a
    sequential trainer can stream them). The hash is computed from the
    key column only — the payload is never part of the sort key."""
    h = F.md5(
        F.concat_ws("|", F.lit("shuffle"), F.lit(seed), F.col(key_col).cast("string"))
    )
    return df.orderBy(h, F.col(key_col))
