"""Every catalog query with an oracle must hash-match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES

from .conftest import SF_ORACLE
from .oracle import compare, duckdb_con

ORACLE_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle is None]


@pytest.fixture(scope="module")
def con():
    con = duckdb_con(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    df = spec.build(spark, SF_ORACLE)
    compare(df, con, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name].build(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
