"""Cross-SF robustness sweep: every oracle query must ALSO hash-match at
sf0.001 — the smallest data, where data-dependent contracts break first.

Round 5 found two latent traps this way, both green at the sf0.01 gate
and both capable of flipping on regenerated testdata: a
``round(avg(double), 2)`` landing on opposite sides of a half-cent
between engines (range_join_balance_bands — fixed with exact-cents
arithmetic), and a value-epsilon bound on ``approx_percentile`` whose
actual guarantee is RANK error (sketch_value_quantiles — fixed with a
rank-interval contract). Small n concentrates both failure modes:
rounding boundaries get fewer addends to average out, and sparse tails
put adjacent order statistics far apart in value. Keeping the sweep in
the suite makes the next such trap a red test instead of a driver
surprise after the testdata regenerates.
"""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES

SF_SMALL = "/root/testdata/sf0.001"

from .oracle import compare, duckdb_con  # noqa: E402
from .test_queries_oracle import ORACLE_QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def con_small():
    con = duckdb_con(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_at_sf0001(spark, con_small, name):
    spec = QUERIES[name]
    df = spec.build(spark, SF_SMALL)
    compare(df, con_small, spec.oracle)
