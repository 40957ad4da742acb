"""Guard test for the PREPARED r15 ``normalize_phone_lengths`` oracle
re-contract (plans/r15_prepared.py — oracle text only; the Spark side
has been decimal-widened since r10 and does not change).

Keeps the prepared oracle value-identical to the registered pair
in-domain at both gate SFs, and proves the re-contract's reason for
existing: at 100 TB-representative key domains the REGISTERED oracle
errors on the int64 multiply while the widened oracle agrees with the
(already-total) registered Spark build.
"""

from __future__ import annotations

import duckdb
import pytest

from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES
from amsterdam_map_data_wrangling_spark.plans.r15_prepared import ORACLE_V2

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_not_registered():
    import amsterdam_map_data_wrangling_spark.plans.catalog as catalog

    assert not hasattr(catalog, "r15_prepared")
    # the module must not be imported by the registry load path
    import sys

    loaded_by_registry = "amsterdam_map_data_wrangling_spark.plans.r15_prepared"
    # it IS loaded by this test, so just assert the registry never
    # gained a v2-named query
    assert loaded_by_registry in sys.modules
    assert "normalize_phone_lengths_v2" not in QUERIES


@pytest.mark.parametrize("sf_dir", SFS)
def test_prepared_oracle_identical_in_domain(spark, sf_dir):
    """V2 must reproduce the registered pair value-for-value in-domain:
    both against the registered Spark build and against the registered
    oracle text (HUGEINT renders scale-0 digits exactly like BIGINT)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    q = QUERIES["normalize_phone_lengths"]
    srows = sorted(tuple(r) for r in q.build(spark, sf_dir).collect())
    v2 = sorted(tuple(r) for r in con.sql(ORACLE_V2).fetchall())
    v1 = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
    assert srows == v2 == v1
    assert srows, "vacuous compare: 0 rows"


def test_prepared_oracle_total_at_shifted_key_domain(spark, tmp_path):
    """The harness cliff #6 scenario: keys ~9.2e14 overflow the
    registered oracle's int64 multiply (DuckDB errors), while the
    widened oracle agrees with the registered SPARK build, which has
    been total there since the r10 decimal widening."""
    n, base = 1_500, 920_000_000_000_000
    assert (base + n) * 987654321 > 2**63  # the overflow under test
    sf = tmp_path / "shifted"
    (
        spark.range(n)
        .selectExpr(f"id + {base} AS c_custkey")
        .write.mode("overwrite")
        .parquet(str(sf / "customer.parquet"))
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf}/customer.parquet/*.parquet')"
    )
    q = QUERIES["normalize_phone_lengths"]
    with pytest.raises(duckdb.OutOfRangeException):
        con.sql(q.oracle).fetchall()
    srows = sorted(tuple(r) for r in q.build(spark, str(sf)).collect())
    v2 = sorted(tuple(r) for r in con.sql(ORACLE_V2).fetchall())
    assert srows == v2 and len(srows) == n
