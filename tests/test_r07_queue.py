"""The r07 registration queue must stay hash-green against DuckDB at
both SFs so round 7's registration is a pure move (see
plans/r07_queue.py)."""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.plans.r07_queue import QUEUE

from .conftest import SF_ORACLE, SF_SMALL
from .oracle import compare, duckdb_con


@pytest.mark.parametrize("name", sorted(QUEUE))
@pytest.mark.parametrize("sf", [SF_ORACLE, SF_SMALL])
def test_r07_queue_pair_matches_oracle(spark, name, sf):
    build, oracle = QUEUE[name]
    con = duckdb_con(sf)
    try:
        compare(build(spark, sf), con, oracle)
    finally:
        con.close()


def test_r07_queue_is_not_registered(spark):
    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    for name in QUEUE:
        assert name not in QUERIES, (
            f"{name} registered early — the round-6 overflow budget is "
            f"full; move it through _GATE_PRIORITY at r07 instead"
        )
