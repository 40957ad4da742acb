"""Retired-query coverage: a query removed from the gate registry under
the N=150 saturation policy keeps its oracle compare HERE, so retirement
sheds a verdict slot, never the semantics."""

from __future__ import annotations

from amsterdam_map_data_wrangling_spark.plans.queries import (
    ILIKE_FILTER_ORACLE,
    ilike_filter_count,
)

from .conftest import SF_ORACLE
from .oracle import compare, duckdb_con


def test_retired_ilike_filter_count_still_matches_oracle(spark):
    con = duckdb_con(SF_ORACLE)
    try:
        compare(ilike_filter_count(spark, SF_ORACLE), con, ILIKE_FILTER_ORACLE)
    finally:
        con.close()


def test_ilike_is_not_registered(spark):
    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    assert "ilike_filter_count" not in QUERIES
    assert "warc_roundtrip_stats" in QUERIES  # the slot's new occupant
