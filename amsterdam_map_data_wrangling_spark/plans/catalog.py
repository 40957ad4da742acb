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
        geo,
        multimodal,
        queries,
        r08_queue,
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
#: Capacity math (150 is the saturation CEILING; N = 148 as of r18:
#: 150 − 5 retirements + 2 operator gates + 1 never-gated overflow):
#: 100 verdict slots exist per 2 rounds, so with N > 100 a bounded
#: tail of at most (N − 100) UNCHANGED queries ages to 3 rounds (never
#: beyond; must hold a verdict from two artifacts back; parked
#: immediately past slot 50) — enforced mechanically by
#: tests/test_gate_freshness.py plus the oracle-definition ledger
#: (ORACLE_HASHES.json).
#:
#: SATURATION DECISION (round 8, recorded per the r07 verdict ask and
#: SURVEY §8): register ALL 24 queue pairs — the catalog lands exactly
#: at N = 150 and the rotation becomes a permanent 3-round cycle with
#: zero registration slack. Rationale: the queue families (drift, A/B,
#: retention, spatial, basket, concentration, ...) are breadth a user
#: of this engine would actually run, and rounds 9+ pivot to perf and
#: depth work that needs no new gate slots. If a must-register operator
#: ever appears, RETIRE a weak query for its slot rather than exceed
#: the ceiling.
#:
#: RETIREMENT, exercised once at r08 (the mechanism above, made real):
#: the r7 verdict asked for a driver-gated crawl-ingestion query
#: "window permitting" — the window didn't permit, so the policy's
#: escape hatch ran instead. `ilike_filter_count` (hash-green r01-r06;
#: the lowest-marginal-evidence gate — a one-flag variant of
#: like_filter_count, ILIKE semantics still pytest-compared in
#: tests/test_retired.py) left the registry; `warc_roundtrip_stats`
#: (plans/multimodal.py — the real _parse_warc against a string-algebra
#: oracle) took a front slot; N stays exactly 150. One queue pair
#: (gap_log2_hist, whose event-gap family already holds the gated
#: event_gap_stats) waits one round as the bounded never-gated overflow
#: parked at slot 51 — the retirement freed exactly one r09 front slot
#: for it (49 r06-greens + gap_log2_hist = 50).
#:
#: Standing 3-round cycle (each round's 50 slots are owed in full to
#: the cohort whose verdicts turn 3 rounds old):
#:   r08 front = 26 r05-parks + 23 queue + warc_roundtrip_stats
#:   r09 front = (OWED: gap_log2_hist + 49 r06-greens — round 9
#:               stalled with zero commits, so the driver re-gated the
#:               r08 front verbatim; CORRECTNESS_r09 == CORRECTNESS_r08
#:               key-for-key)
#:   r10 front = the owed r09 front, one round late
#:   r11 front = the 50 r07-greens (pre-parked at r10's slots 51-100)
#:   r12 front = the r08 front again (with the spatial_radius_pairs →
#:               geo_way_lengths retirement swap)
#:   r13 front = the r10 front again
#:   r14 front = the r11 front again (with the three r14 oracle
#:               re-contracts)
#:   r15 front = the r12 front again (with the two r15 re-contracts)
#:   r16 front = the r13 front again
#:   r17 front = the r14 front again (section (v) below, with the
#:               ann_rand_lsh → bound_doc_width_roundtrip retirement
#:               swap)
#:   r18 front = the r15 front again (section (w) park), and so on.
#: The r09 stall means BOTH parked cohorts exceeded the age-3 ceiling
#: in wall-clock rounds; recovery is the fastest mathematically
#: possible (oldest cohort first, the other parked immediately behind).
#: tests/test_gate_freshness.py encodes the stalled-round recovery
#: clause: a duplicated artifact collapses to one rotation window, so
#: the ceiling is measured in distinct gate windows.
#: Changed-code queries always jump their cohort into the next front,
#: displacing an unchanged name one cycle later — the ledger test
#: catches any verdict whose oracle definition drifted.
_GATE_PRIORITY: list[str] = [
    # ---- round 18 rotation: front (slots 1-50) ----
    # (y) the r15-front cohort (the r08/r12 lineage), owed this round's
    #     window (verdicts r15, three distinct windows back after this
    #     round's gates), MINUS five retirements + PLUS five entrants:
    #
    #     FIVE RETIREMENTS (the saturation policy's escape hatch —
    #     r08/r11/r12/r17 precedent — exercised five-wide because this
    #     front owes five slots at once: three to the r17 verdict's #1
    #     changed-code ask and two to its #2/#3 new-operator-gate asks;
    #     the freshness arithmetic permits no park for displaced
    #     r15-cohort names, so the displaced five must leave the
    #     registry, each the lowest-marginal-evidence member of a
    #     family that stays value-gated):
    #       dedup_minhash_portable  (signatures are a strict
    #         sub-computation of r17-green dedup_minhash_portable_pairs)
    #       dedup_simhash_portable  (construction twin of r17-green
    #         dedup_simhash_bands)
    #       dedup_cluster_size_hist (rollup over the same shared
    #         component relation r17-green dedup_clusters gates)
    #       neardup_degree_hist     (rollup over the same pair relation
    #         r17-green near_dup_transitivity/pagerank gate)
    #       quality_components      (computed inside r17-green
    #         quality_filter_pipeline; quality_scores keeps the
    #         composite relation in this front)
    #     All five keep their full oracle compares in
    #     tests/test_retired.py. N: 150 - 5 + 2 = 147.
    #
    #     FIVE ENTRANTS:
    #       session_window_per_user / event_gap_stats /
    #       funnel_conversion — the three r16-cohort adaptive window
    #         levers whose PLAN-SELECTION INPUTS changed at r17
    #         (PROBE_MAX_FILES 64->256, 16-wide footer fan-out, unified
    #         scheme dispatch, sources/fs.py) — fronted out of cycle
    #         per the changed-code rule (r17 verdict "Next round" #1).
    #       training_shuffle_order — first driver gate for
    #         operators/packing.py:training_order_shuffle (r17 verdict
    #         #2; the curation->trainer handoff, previously pytest-only).
    #       compaction_plan_ffd — first driver gate for
    #         operators/compaction.py compaction_plan + should_compact
    #         (r17 verdict #3; recursive-CTE FFD replay, both slack
    #         branches witnessed).
    "geo_way_lengths",
    "frame_sample_stats",
    "warc_roundtrip_stats",
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
    "dataset_split_stats",
    "embedding_label_centroids",
    "minhash_recall_curve",
    "event_transition_counts",
    "scd2_state_durations",
    "cohort_retention",
    "ks_split_drift",
    "chi2_type_weekday",
    "vocab_jaccard_sources",
    "equal_freq_deciles",
    "spearman_autocorr_daily_revenue",
    "minmax_scale_bins",
    "token_diversity_by_source",
    "nearest_centroid_confusion",
    "rfm_segment_counts",
    "dq_audit_star",
    "basket_lift_pairs",
    "daily_peak_concurrency",
    "revenue_concentration",
    "ab_test_zscore",
    "embedding_label_stats",
    "embedding_norm_zscores",
    "doc_rolling_fingerprint",
    "stratified_sample_counts",
    "quality_scores",
    "chunk_documents",
    "normalize_phone_lengths",
    "normalize_postcode_formats",
    "split_tag_keys_agg",
    "eav_unpivot_topk",
    "table_stats",
    "salted_user_event_stats",
    "session_window_per_user",
    "event_gap_stats",
    "funnel_conversion",
    "training_shuffle_order",
    "compaction_plan_ffd",
    # ---- window boundary (slot 50) ----
    # (z) park: the 47 remaining r16-front queries (the r10/r13
    #     lineage cohort minus the three levers fronted above), in
    #     their r16 gate order - their verdict window is r16, two
    #     distinct windows back after this round's front gates; parked
    #     immediately past the window so they are r19's front (47
    #     slots; 3 spare slots free for r19 obligations). NO code or
    #     oracle changes touch this cohort this round.
    "dedup_keep_canonical",
    "dedup_edit_refine",
    "audio_dims",
    "video_dims",
    "count_global",
    "distinct_users_union",
    "custkeys_intersect",
    "custkeys_except",
    "topk_group_distinct",
    "topk_group_count",
    "topk_order_limit",
    "like_filter_count",
    "scan_filter_project",
    "pct_shares",
    "runtime_bloom_filter_join",
    "local_supplier_volume",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "weekly_cohort_retention",
    "key_skew_profile",
    "zorder_layout_stats",
    "asof_last_click_before_error",
    "interval_overlap_balances",
    "above_avg_orders_per_customer",
    "segment_event_counts",
    "gap_log2_hist",
    "cms_heavy_hitters",
    "text_stats",
    "term_freq_topk",
    "bigram_topk",
    "lang_id_confusion",
    "chunk_documents_udtf",
    "repetition_stats",
    "benchmark_contamination",
    "mixture_proportional_sample",
    "dup_span_coverage",
    "tumbling_window_stats",
    "sliding_window_by_type",
    "interval_join_click_error",
    "json_props_stats",
    "value_percentiles_by_type",
    "equi_depth_histogram",
    "expectations_report",
    "python_datasource_stats",
    "nested_json_shred",
    "snapshot_table_diff",
    "map_ops_surface",
    # (aa) never-gated overflow (freshness policy point 3, bounded <= 5):
    #     jpeg_pixel_stats — the r18 headline operator's driver gate
    #     (operators/jpeg.py baseline-JPEG decode, closed-form DC
    #     synthesis) — registered AFTER the r18 window was owed in full
    #     to the r15 cohort + the five entrants, so it parks here,
    #     immediately past the park, first in line for r19's front
    #     (47 r16-cohort + this = 48 of r19's 50 slots).
    "jpeg_pixel_stats",
    # (ab) the 50 r17-front queries (verdicts r17, the freshest
    #     cohort) are deliberately unlisted - they append in
    #     registration order behind the park and become r20's front:
    #     dedup_exact_groups, ..., xml_roundtrip_stats.
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
