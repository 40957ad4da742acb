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
        features,
        multimodal,
        queries,
        similarity,
        sketches,
        sparse,
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
#:
#: Capacity math (round 7, registry N > 2x50): only 100 verdict slots
#: exist per 2 rounds, so the strict <=2-round policy saturates. The
#: sustainable tight schedule, enforced by tests/test_gate_freshness.py:
#: changed-code and new queries always front-load; a bounded tail of at
#: most (N - 100) UNCHANGED queries may age to 3 rounds (never beyond,
#: must hold a verdict from two artifacts back, parked immediately past
#: slot 50). Every new registration this round takes a front slot and
#: displaces one r05-green query into the park — N grows by 1 each
#: time, so the (N - 100) allowance grows in lockstep and the policy
#: stays satisfiable by construction. r08 recipe: front = the parked
#: r05-green tail (their verdicts turn 3 rounds old — hard ceiling) +
#: any changed-code queries, then the oldest r06-green queries.
#: Round-7-close exact fill: the park holds 26 names and
#: plans/r08_queue.py holds 24 validated pairs, so r08's front is
#: exactly 26 + 24 = 50 with ZERO slack — register all 24, park the 50
#: r06-greens (they re-gate at r09 at age 3, inside the then-current
#: N − 100 = 150 − 100 = 50 allowance, which the 24 registrations grow
#: to precisely the needed size). Do NOT add further registrations at
#: r08 beyond the queue without dropping a queue pair to r09.
#:
#: SATURATION NOTICE (decide deliberately at r08): at N = 150 the
#: schedule becomes a permanent 3-round cycle with zero slack — every
#: round's 50 slots are fully owed to the cohort hitting the age-3
#: ceiling (r09: the 50 r06-greens; r10: the 26 re-gated parks + the
#: 24 r08 registrations; r11: the 50 r09-regated; ...), so NO further
#: registration is ever possible at a 50-row artifact window.
#: Registering all 24 therefore trades all future breadth for maximum
#: now-breadth; registering K < 24 keeps (24 − K) queue pairs plus
#: (24 − K) front slots of permanent per-cycle slack. 150-at-
#: saturation is a defensible end state (rounds 9+ shift to perf and
#: depth); just make the choice knowingly, and prefer retiring a
#: weak query over exceeding the ceiling if a must-register operator
#: appears later.
_GATE_PRIORITY: list[str] = [
    # ---- round 7 rotation ----
    # (a) first-ever driver verdicts for the 5 queries that overflowed
    #     the round-6 window (pytest-oracle-green at both SFs since
    #     registration, never in any CORRECTNESS artifact — VERDICT r6
    #     deduction #1):
    "gap_sessionization",
    "variant_json_stats",
    "null_semantics_audit",
    "xml_roundtrip_stats",
    "nation_volume_shipping",
    # (b) the oracle-changed trio (r5 ADVICE integer-cents / literal-0
    #     gates landed in r6 but their fresh definitions never met the
    #     driver — r6 ADVICE #2 names exactly this hazard) and the
    #     behavior-preserving internal changes (dedup_clusters hop
    #     budget; ann_ivf seed re-sort):
    "pii_redaction_stats",
    "star_join_customers_by_region",
    "range_join_balance_bands",
    "dedup_clusters",
    "ann_ivf",
    "ann_ivf_probe2",
    # (c) new registrations this round (each displaced one r05-green
    #     name from the front into the park below): the graduated r07
    #     queue (plans/features.py, plans/sparse.py, the two new
    #     plans/dedup.py gates) plus the round-7 operator additions
    #     (decontamination, WAV-PCM + BMP content decodes, LOCF
    #     resample, BM25, PageRank, SQ8 + PQ-ADC ANN, RANGE frame)
    "sparse_cosine_pairs",
    "sparse_cosine_topk",
    "bloom_vocab_overlap",
    "decontaminate_stats",
    "winsorize_price_stats",
    "robust_z_by_priority",
    "unigram_lm_scores",
    "uniform_sample_per_group",
    "weighted_sample_per_group",
    "sorted_neighborhood_window",
    "near_dup_transitivity",
    "audio_levels",
    "image_pixel_stats",
    "resample_locf_daily",
    "bm25_search",
    "near_dup_pagerank",
    "ann_sq8_rerank",
    "ann_pq_adc",
    "trailing_window_revenue",
    "ols_price_trend_by_priority",
    "incremental_dedup_stats",
    # (d) the r05-green tail, oldest-registered first; the front holds
    #     as many as fit after (a)-(c):
    "multimodal_dims",
    "multimodal_features",
    "dedup_minhash_pairs",
    "dedup_minhash_portable_pairs",
    "dedup_simhash_bands",
    "dedup_ngram_jaccard",
    "knn_cosine_brute",
    "ann_sign_lsh",
    "ann_rand_lsh",
    "embedding_near_dup_pairs",
    "tfidf_top_terms",
    "token_budget_pack",
    "token_budget_pack_sharded",
    "quality_filter_pipeline",
    "sketch_users_by_type",
    "sketch_value_quantiles",
    "salted_join_hot_customer",
    "dedup_exact_groups",
    # ---- window boundary (slot 50) ----
    # (e) the parked r05-green tail: UNCHANGED code, r05 verdicts age to
    #     3 rounds under the bounded (N - 100) allowance, first in line
    #     for r08's front. Growth note: each new registration above
    #     moves the last front name here, keeping front == 50.
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "frame_sample_stats",
    "pricing_summary",
    "join_revenue_by_priority",
    "ordered_position_per_group",
    "topn_per_group",
    "running_revenue_per_customer",
    "rollup_revenue",
    "eav_pivot_wide",
    "window_function_zoo",
    "bag_set_ops",
    "cube_revenue",
    "embedding_label_stats",
    "embedding_norm_zscores",
    "doc_rolling_fingerprint",
    "stratified_sample_counts",
    "quality_scores",
    "quality_components",
    "chunk_documents",
    "normalize_phone_lengths",
    "normalize_postcode_formats",
    "split_tag_keys_agg",
    "eav_unpivot_topk",
    "table_stats",
    "salted_user_event_stats",
    # (f) the 50 r06-green queries are deliberately unlisted — they
    #     append in registration order behind the park, each holding a
    #     verdict exactly 1 round old.
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


def catalog_markdown() -> str:
    """Deterministic one-line-per-query index of the registry, in gate
    order — regenerate QUERIES.md with
    ``python -c "from amsterdam_map_data_wrangling_spark.plans.catalog
    import catalog_markdown; print(catalog_markdown(), end='')" >
    QUERIES.md``; tests/test_catalog_doc.py fails if the file drifts."""
    specs = _ordered()
    lines = [
        "# Query catalog (generated — do not edit by hand)",
        "",
        f"{len(specs)} registered queries, listed in gate order (the "
        f"driver's correctness artifact records the first 50). Every "
        f"query carries a DuckDB value oracle.",
        "",
        "| # | query | doc |",
        "|---|---|---|",
    ]
    for i, (name, spec) in enumerate(specs.items(), 1):
        doc = (spec.doc or "").strip().replace("\n", " ")
        first = doc.split(". ")[0].rstrip(".") + "." if doc else ""
        first = first.replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {first} |")
    return "\n".join(lines) + "\n"


def oracle_hash(sql: str) -> str:
    """Whitespace-normalized sha256 prefix of an oracle SQL string — the
    unit of the ORACLE_HASHES.json freshness ledger (r6 ADVICE #2:
    record a hash of each query's oracle so the freshness test can
    mechanically reject a stale verdict whose gate definition changed
    after the verdict was earned). Whitespace-insensitive so pure
    reformatting does not force a re-gate; any token change does."""
    import hashlib

    return hashlib.sha256(" ".join(sql.split()).encode()).hexdigest()[:16]


def oracle_hashes_snapshot() -> dict[str, str]:
    """Current {query: oracle_hash} for every oracle-gated query."""
    return {
        name: oracle_hash(spec.oracle)
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }
