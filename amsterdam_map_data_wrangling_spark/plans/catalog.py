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
    # -- no driver verdict in CORRECTNESS_r02 (artifact held entries 1-50;
    #    these registered 51-70): the reference's cleaning conformance gates,
    #    the four streaming batch-twins, and the later text queries --
    "normalize_phone_lengths",
    "normalize_postcode_formats",
    "split_tag_keys_agg",
    "eav_unpivot_topk",
    "table_stats",
    "json_props_stats",
    "value_percentiles_by_type",
    "salted_user_event_stats",
    "tumbling_window_stats",
    "sliding_window_by_type",
    "session_window_per_user",
    "interval_join_click_error",
    "doc_rolling_fingerprint",
    "stratified_sample_counts",
    "quality_scores",
    "quality_filter_pipeline",
    "quality_components",
    "chunk_documents",
    "token_budget_pack",
    "tfidf_top_terms",
    # -- changed or added in round 3: need fresh verdicts --
    "dedup_clusters",
    "dedup_minhash_portable_pairs",
    "knn_cosine_brute",
    "ann_ivf",
    "ann_rand_lsh",
    # -- previously green, highest re-verification value (complex plans) --
    "ann_sign_lsh",
    "embedding_near_dup_pairs",
    "embedding_norm_zscores",
    "embedding_label_stats",
    "multimodal_features",
    "frame_sample_stats",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "pricing_summary",
    "join_revenue_by_priority",
    "star_join_customers_by_region",
    "asof_last_click_before_error",
    "range_join_balance_bands",
    "eav_pivot_wide",
    "rollup_revenue",
    "cube_revenue",
    "window_function_zoo",
    "bag_set_ops",
    "event_gap_stats",
    "topn_per_group",
    "running_revenue_per_customer",
    "ordered_position_per_group",
    # -- slot 50 pinned to a hash-gated query: the next registration-order
    #    entry would be dedup_minhash_pairs, which is rows-only by design
    #    and would waste the last driver-verdict slot --
    "segment_event_counts",
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
