"""Guard test for the PREPARED r14 ``variant_json_stats`` re-contract
(plans/r14_prepared.py — not registered; see that module's docstring
for the swap recipe and why the oracle change is only legal at r14).

Keeps the prepared pair hash-green at sf0.001 and sf0.01 so the r14
front commit is mechanical, and proves the re-contract's reason for
existing: the modular-checksum output stays total (and engine-agreed)
on a key domain shifted to 100 TB-representative magnitudes, where the
registered BIGINT raw-sum contract is unrepresentable.
"""

from __future__ import annotations

import duckdb
import pytest

from amsterdam_map_data_wrangling_spark.plans.r14_prepared import (
    ORACLE_V2,
    variant_json_stats_v2,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _compare(spark, sf_dir: str, con) -> None:
    sdf = variant_json_stats_v2(spark, sf_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in con.sql(ORACLE_V2).fetchall())
    assert sdf.columns == ["tag", "n_docs", "sum_id_mod", "sum_q1",
                           "q0_present"]
    assert srows == drows
    assert srows, "vacuous compare: 0 rows"


@pytest.mark.parametrize("sf_dir", SFS)
def test_prepared_pair_hash_green_at_gate_sfs(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    _compare(spark, sf_dir, con)


def test_prepared_contract_total_at_shifted_key_domain(spark, tmp_path):
    """The point of the re-contract: keys ~9.2e14 across 20k rows push
    the RAW key sum past 2^63 (the registered contract's cast errors on
    both engines there — r12 50x soak), while the modular checksum
    stays in-range and the engines agree on it."""
    n, base = 20_000, 920_000_000_000_000
    sf = tmp_path / "shifted"
    (
        spark.range(n)
        .selectExpr(
            f"id * 7 + {base} AS o_orderkey",
            "CASE CAST(id % 3 AS INT) WHEN 0 THEN '1-URGENT' "
            "WHEN 1 THEN '3-MEDIUM' ELSE '5-LOW' END AS o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(str(sf / "orders.parquet"))
    )
    # raw sum really is out of int64 range (the scenario under test)
    assert n * (base + 7 * n) > 2**63
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    _compare(spark, str(sf), con)


@pytest.mark.parametrize("sf_dir", SFS)
def test_prepared_ols_pair_matches_registered_and_oracle(spark, sf_dir):
    """The OLS v2 pair: (a) hash-green against its own oracle, (b)
    output-identical to the REGISTERED query in-domain (the widened
    sums are exact < 2^53, so every double is the same bit pattern)."""
    from amsterdam_map_data_wrangling_spark.plans.r14_prepared import (
        ORACLE_OLS_V2,
        ols_price_trend_by_priority_v2,
    )
    from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    sdf = ols_price_trend_by_priority_v2(spark, sf_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in con.sql(ORACLE_OLS_V2).fetchall())
    assert srows == drows and srows
    registered = sorted(
        tuple(r)
        for r in QUERIES["ols_price_trend_by_priority"]
        .build(spark, sf_dir)
        .collect()
    )
    assert srows == registered, "v2 must be bit-identical in-domain"


def test_prepared_ols_total_at_shifted_value_domain(spark, tmp_path):
    """The re-contract's reason to exist: y ~ 4e9 (cents ~1e12-13 value
    domain) overflows the registered query's int64 y*y on both engines;
    the v2 pair agrees and stays total there."""
    from amsterdam_map_data_wrangling_spark.plans.r14_prepared import (
        ORACLE_OLS_V2,
        ols_price_trend_by_priority_v2,
    )

    sf = tmp_path / "shifted"
    (
        spark.range(5_000)
        .selectExpr(
            "CAST(date_add(DATE '1995-01-01', CAST(id % 2000 AS INT)) "
            "AS STRING) AS o_orderdate",
            "(3.8e11 + id * 1e7) AS o_totalprice",
            "CASE CAST(id % 2 AS INT) WHEN 0 THEN '1-URGENT' "
            "ELSE '5-LOW' END AS o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(str(sf / "orders.parquet"))
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    sdf = ols_price_trend_by_priority_v2(spark, str(sf))
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in con.sql(ORACLE_OLS_V2).fetchall())
    assert len(srows) == len(drows) == 2
    for rs, rd in zip(srows, drows):
        assert rs[0] == rd[0] and rs[1] == rd[1]
        for a, b in zip(rs[2:], rd[2:]):
            assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("sf_dir", SFS)
def test_prepared_xml_pair_hash_green(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.plans.r14_prepared import (
        ORACLE_XML_V2,
        xml_roundtrip_stats_v2,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    sdf = xml_roundtrip_stats_v2(spark, sf_dir)
    assert sdf.columns == ["key", "value", "num", "sum_id_mod"]
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in con.sql(ORACLE_XML_V2).fetchall())
    assert srows == drows and srows


def test_prepared_xml_total_at_shifted_key_domain(spark, tmp_path):
    """keys ~9.2e14 x 40k rows push the raw key-sum past 2^63 (where
    the registered contract errors on both engines — r13 100x soak);
    the checksum pair agrees and stays total."""
    n, base = 40_000, 920_000_000_000_000
    assert n * base > 2**63
    from amsterdam_map_data_wrangling_spark.plans.r14_prepared import (
        ORACLE_XML_V2,
        xml_roundtrip_stats_v2,
    )

    sf = tmp_path / "shifted"
    (
        spark.range(n)
        .selectExpr(
            f"id + {base} AS c_custkey",
            "CASE CAST(id % 2 AS INT) WHEN 0 THEN 'BUILDING' "
            "ELSE 'MACHINERY' END AS c_mktsegment",
            "CAST(id % 25 AS INT) AS c_nationkey",
        )
        .write.mode("overwrite")
        .parquet(str(sf / "customer.parquet"))
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf}/customer.parquet/*.parquet')"
    )
    sdf = xml_roundtrip_stats_v2(spark, str(sf))
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in con.sql(ORACLE_XML_V2).fetchall())
    assert srows == drows and len(srows) == 27
