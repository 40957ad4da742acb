"""The r08 registration queue must stay hash-green against DuckDB at
both SFs so round 8's registration is a pure move (see
plans/r08_queue.py)."""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.plans.r08_queue import QUEUE

from .conftest import SF_ORACLE, SF_SMALL
from .oracle import compare, duckdb_con


@pytest.mark.parametrize("name", sorted(QUEUE))
@pytest.mark.parametrize("sf", [SF_ORACLE, SF_SMALL])
def test_r08_queue_pair_matches_oracle(spark, name, sf):
    build, oracle = QUEUE[name]
    con = duckdb_con(sf)
    try:
        compare(build(spark, sf), con, oracle)
    finally:
        con.close()


def test_r08_queue_is_not_registered(spark):
    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    for name in QUEUE:
        assert name not in QUERIES, (
            f"{name} registered early — round 8's front window is owed "
            f"to the parked r05-green tail first; move it through "
            f"_GATE_PRIORITY (and the ORACLE_HASHES ledger) at r08"
        )


def test_r08_queue_plans_free_of_scale_killers(spark):
    """The catalog's plan invariants, applied to the queue BEFORE
    registration: no cartesian products, no BNLJ outside the documented
    1-row-stitch whitelist, no row-Python."""
    from amsterdam_map_data_wrangling_spark.plans.r08_queue import BNLJ_OK

    offenders: dict[str, list[str]] = {}
    for name, (build, _oracle) in QUEUE.items():
        plan = (
            build(spark, SF_ORACLE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            offenders.setdefault("CartesianProduct", []).append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders.setdefault("BroadcastNestedLoopJoin", []).append(name)
        if "BatchEvalPython" in plan:
            offenders.setdefault("row-Python", []).append(name)
    assert not offenders, f"scale-killers in queued plans: {offenders}"
