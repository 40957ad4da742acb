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
    # round-8 evidence policy: the 26 r05-parked queries (verdicts at
    # the 3-round hard ceiling), the 23 fronted r08-queue registrations,
    # and the retirement-slotted crawl gate must sit inside the 50-slot
    # window; gap_log2_hist is the single bounded never-gated overflow
    # parked at slot 50 (0-indexed) — r09's first front name. (The
    # general freshness invariant is asserted mechanically in
    # tests/test_gate_freshness.py — this pins only the current round's
    # specific obligations.)
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r05 = set(json.loads((repo / "CORRECTNESS_r05.json").read_text()))
    r06 = set(json.loads((repo / "CORRECTNESS_r06.json").read_text()))
    r07 = set(json.loads((repo / "CORRECTNESS_r07.json").read_text()))
    parks26 = sorted(r05 - r06 - r07 - {"ilike_filter_count"})
    front = set(ordered[:50])
    for name in parks26:
        assert name in front, f"r05-park {name} missed the r08 window"
    from amsterdam_map_data_wrangling_spark.plans.r08_queue import QUEUE

    for name in QUEUE:
        if name == "gap_log2_hist":
            assert ordered.index(name) == 50  # bounded overflow, r09 front
        else:
            assert ordered.index(name) < 50, name
    assert ordered.index("warc_roundtrip_stats") < 50
    assert "ilike_filter_count" not in ordered  # retired at r08
