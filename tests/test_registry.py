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
    # round-17 evidence policy: the 50 r14-front queries (the oldest
    # cohort — their last DISTINCT verdict window is r14, three windows
    # back after this round's gates) take the whole front, re-gating
    # the seven r15/r16 changed-code queries with their cohort
    # (gap_sessionization, pii_redaction_stats, unigram_lm_scores,
    # both minhash pair variants, dedup_clusters, near_dup_pagerank) —
    # with ONE retirement swap: ann_rand_lsh left the registry (its
    # oracle compare lives in tests/test_retired.py) and its slot holds
    # bound_doc_width_roundtrip, the r16 ingest-width guardrail's
    # driver gate. The r15-front cohort parks at slots 51-100 as r18's
    # front; the freshly-gated r16 cohort appends unlisted at 101-150
    # (r19's front). (The general freshness invariant is asserted
    # mechanically in tests/test_gate_freshness.py — this pins only the
    # current round's specific obligations.)
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r14 = set(json.loads((repo / "CORRECTNESS_r14.json").read_text()))
    r15 = set(json.loads((repo / "CORRECTNESS_r15.json").read_text()))
    r16 = set(json.loads((repo / "CORRECTNESS_r16.json").read_text()))
    assert set(ordered[:50]) == (r14 - {"ann_rand_lsh"}) | {
        "bound_doc_width_roundtrip"
    }, (
        "round-17 window must be the 50 r14-front queries (the oldest "
        "cohort) with the ann_rand_lsh → bound_doc_width_roundtrip "
        "retirement swap"
    )
    assert set(ordered[50:100]) == r15, (
        "the r15-front cohort must park at slots 51-100 (r18's front)"
    )
    assert set(ordered[100:]) == r16, (
        "the freshly-gated r16 cohort appends at slots 101-150"
    )
    assert "ilike_filter_count" not in ordered  # retired at r08
    assert "ann_rand_lsh" not in ordered  # retired at r17


def test_package_init_registers_every_query_module():
    """bench.py (and any `from ...plans.queries import QUERIES` user)
    relies on the package __init__'s import list for registration side
    effects; catalog._load_all is the other copy of that list. They must
    name the SAME modules — round 11 found `geo` present in _load_all but
    missing from __init__, silently shrinking bench.py's catalog to 148."""
    import ast
    import inspect

    from amsterdam_map_data_wrangling_spark import plans
    from amsterdam_map_data_wrangling_spark.plans import catalog

    def imported_names(source: str) -> set[str]:
        names: set[str] = set()
        for node in ast.walk(ast.parse(source)):
            if (
                isinstance(node, ast.ImportFrom)
                and node.module == "amsterdam_map_data_wrangling_spark.plans"
            ):
                names |= {a.name for a in node.names}
        return names

    init_mods = imported_names(inspect.getsource(plans))
    load_all_mods = imported_names(
        inspect.getsource(catalog._load_all)
    )
    assert load_all_mods <= init_mods, (
        f"plans/__init__.py is missing {load_all_mods - init_mods}"
    )
