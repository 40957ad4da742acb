"""Loader robustness: load_tables must work on ANY session — including one
that (like the driver's verify session) was built without the nanosAsLong
conf — and must fail loudly on a bad table name."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_ORACLE


def test_events_loads_without_preset_nanos_conf(spark):
    # Simulate the driver's session: conf absent/false before the load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        dfs = load_tables(spark, SF_ORACLE, ["events"])
        events = dfs["events"]
        assert dict(events.dtypes)["ts"] == "timestamp"
        assert events.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_nanos_conversion_is_exact_vs_duckdb(spark):
    """Integral ns→us division must agree with DuckDB's TIMESTAMP_NS read
    to the microsecond (float division would drift by ±1 us at 1.7e18 ns)."""
    import duckdb
    import os

    (events,) = [load_tables(spark, SF_ORACLE, ["events"])["events"]]
    s_min, s_max = events.agg(F.min("ts"), F.max("ts")).first()
    path = os.path.join(SF_ORACLE, "events.parquet")
    d_min, d_max = duckdb.sql(
        f"SELECT min(ts), max(ts) FROM read_parquet('{path}')"
    ).fetchone()
    assert s_min == d_min and s_max == d_max


def test_missing_table_raises(spark):
    with pytest.raises(FileNotFoundError, match="no_such_table"):
        load_tables(spark, SF_ORACLE, ["no_such_table"])


@pytest.mark.parametrize(
    "name", ["custkeys_except", "anti_join_inactive_customers", "scan_filter_project"]
)
def test_oracle_checked_queries_are_non_vacuous(spark, name):
    """The hash compare proves nothing on an empty result — these three
    returned 0 rows at sf0.01 in round 1; predicates now keep them non-empty."""
    assert QUERIES[name].build(spark, SF_ORACLE).count() > 0


def test_gate_priority_orders_catalog():
    """The driver's correctness artifact records the first 50 registry
    entries, so catalog order is evidence policy: the _GATE_PRIORITY names
    must lead (in order), every priority name must exist, and nothing may
    be dropped or duplicated by the reordering."""
    from amsterdam_map_data_wrangling_spark.plans import catalog

    import __spark_entry__

    ordered = list(catalog.queries())
    assert ordered[: len(catalog._GATE_PRIORITY)] == catalog._GATE_PRIORITY
    # the DRIVER reads __spark_entry__, which must expose the same ordering
    # (a local queries() shadowing the catalog's once silently undid it)
    assert list(__spark_entry__.queries()) == ordered
    assert len(ordered) == len(set(ordered)) == len(catalog.QUERIES)
    # round-7 evidence policy: the 5 never-driver-gated overflow queries,
    # the oracle-changed trio + changed-internals trio (r6 VERDICT #1/
    # ADVICE #2), and every r07 registration must sit inside the 50-slot
    # gated window. (The general freshness invariant is asserted
    # mechanically in tests/test_gate_freshness.py — this list pins only
    # the current round's specific obligations.)
    for name in (
        # first-ever verdicts
        "gap_sessionization", "variant_json_stats", "null_semantics_audit",
        "xml_roundtrip_stats", "nation_volume_shipping",
        # oracle-changed / changed-internals (fresh definitions re-gate)
        "pii_redaction_stats", "star_join_customers_by_region",
        "range_join_balance_bands", "dedup_clusters", "ann_ivf",
        "ann_ivf_probe2",
        # r07 registrations (the graduated queue + decontamination)
        "sparse_cosine_pairs", "sparse_cosine_topk", "bloom_vocab_overlap",
        "decontaminate_stats", "winsorize_price_stats",
        "robust_z_by_priority", "unigram_lm_scores",
        "uniform_sample_per_group", "weighted_sample_per_group",
        "sorted_neighborhood_window", "near_dup_transitivity",
        # r07 new operators: full PCM WAV + BMP pixel content decodes
        "audio_levels", "image_pixel_stats",
        # r07 new operators: time-grid resample + LOCF; BM25 search
        "resample_locf_daily", "bm25_search",
        # r07 new operators: bounded PageRank; SQ8-compressed ANN
        "near_dup_pagerank", "ann_sq8_rerank",
        # r07 new operators: PQ-ADC ANN; RANGE-frame trailing window
        "ann_pq_adc", "trailing_window_revenue",
        # r07 new operators: grouped OLS; incremental-ingestion dedup
        "ols_price_trend_by_priority", "incremental_dedup_stats",
    ):
        assert ordered.index(name) < 50, name
