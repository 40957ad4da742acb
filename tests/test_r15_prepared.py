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


# ---------------------------------------------------------------------------
# running_revenue_per_customer v2 (r14 Zipf-soak window-wall prep)
# ---------------------------------------------------------------------------


def test_running_v2_not_registered():
    from amsterdam_map_data_wrangling_spark.plans.r15_prepared import (  # noqa: F401
        ORACLE_RUNNING_V2,
        running_revenue_per_customer_v2,
    )

    assert "running_revenue_per_customer_v2" not in QUERIES


@pytest.mark.parametrize("sf_dir", SFS)
def test_running_v2_matches_its_oracle_and_the_naive_window(spark, sf_dir):
    """The prepared pair must hash-green against DuckDB at both gate
    SFs, and the chunked prefix sum must be value-identical to the
    naive one-partition window computed over the SAME exact-cents
    contract (associativity of integer addition — the property the
    re-contract exists to unlock)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.plans.r15_prepared import (
        ORACLE_RUNNING_V2,
        running_revenue_per_customer_v2,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    got = sorted(
        tuple(r)
        for r in running_revenue_per_customer_v2(spark, sf_dir).collect()
    )
    want = sorted(tuple(r) for r in con.sql(ORACLE_RUNNING_V2).fetchall())
    assert got == want
    assert got, "vacuous compare: 0 rows"

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    naive = sorted(
        tuple(r)
        for r in orders.filter(F.col("o_custkey") % 20 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(cents.cast("decimal(38,0)"))
            .over(w)
            .cast("bigint")
            .alias("running_cents"),
        )
        .collect()
    )
    assert got == naive
