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
    # ---- round 4 rotation ----
    # (a) changed or added this round: the three HUGEINT-cast oracles, the
    #     two reframed sketch contracts, fixed-k sample-Lloyd IVF, the two
    #     invariant-gated xxhash64 dedup twins, and the two new queries
    "salted_user_event_stats",
    "quality_filter_pipeline",
    "token_budget_pack",
    "token_budget_pack_sharded",
    "salted_join_hot_customer",
    "ann_ivf",
    "sketch_users_by_type",
    "sketch_value_quantiles",
    "dedup_minhash_pairs",
    "dedup_simhash_bands",
    # (b) the r02-green tail rotated out of the r03 artifact — every one of
    #     these would otherwise go two rounds unverified (VERDICT r3 #2)
    "count_global",
    "distinct_users_union",
    "custkeys_intersect",
    "custkeys_except",
    "topk_group_distinct",
    "topk_group_count",
    "topk_order_limit",
    "like_filter_count",
    "ilike_filter_count",
    "scan_filter_project",
    "pct_shares",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "above_avg_orders_per_customer",
    "text_stats",
    "term_freq_topk",
    "bigram_topk",
    "lang_id_confusion",
    # (c) every remaining events-table query: the round-4 testdata switched
    #     events.ts from TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros and the
    #     loader normalization changed with it — all ts semantics re-gated
    "json_props_stats",
    "value_percentiles_by_type",
    "tumbling_window_stats",
    "sliding_window_by_type",
    "session_window_per_user",
    "interval_join_click_error",
    "asof_last_click_before_error",
    "event_gap_stats",
    "segment_event_counts",
    # (d) similarity/dedup module neighbors of this round's edits + the
    #     heaviest previously-green plans
    "knn_cosine_brute",
    "ann_sign_lsh",
    "ann_rand_lsh",
    "embedding_near_dup_pairs",
    "embedding_norm_zscores",
    "embedding_label_stats",
    "dedup_clusters",
    "dedup_minhash_portable_pairs",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "window_function_zoo",
    "pricing_summary",
    "star_join_customers_by_region",
    # rotated out this round (r03-green verdicts stand, back in round 5):
    # the cleaning-conformance gates, doc fingerprint/quality/chunking,
    # multimodal pair, portable sig twins, exact dedup, and the r03
    # lineitem/orders window-analytics block
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
