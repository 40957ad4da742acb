"""Round-15 prepared oracle re-contracts (NOT registered — deliberately
absent from ``catalog._load_all`` and the package ``__init__`` import
list, so nothing here reaches the gate surface before its legal round):

1. ``normalize_phone_lengths`` — ORACLE-side HUGEINT widening of the
   synthetic digit-string derivation (r13 key-domain stress harness,
   cliff #6);
2. ``running_revenue_per_customer`` — exact-cents output contract +
   chunked two-level prefix-sum plan (r14 Zipf-soak window-wall
   finding; see the section comment below).

Background: the registered query derives per-customer digit strings
from ``c_custkey * 987654321 + 1234567890123``. The SPARK side has
carried that product in DECIMAL(38,0) since r10 (keys above ~9.3e9
overflow int64), but the in-code claim that DuckDB auto-widens the
same INT64 multiply to HUGEINT was FALSE — the r13 harness showed the
ORACLE erroring at 100 TB-representative key domains (~9.2e14). The
fix is oracle TEXT only::

    CAST(c_custkey AS HUGEINT) * 987654321 + 1234567890123

HUGEINT scale-0 values render as plain digit strings, identical to the
BIGINT cast in-domain, so the gate values (and the Spark side) are
untouched — but the oracle DEFINITION changes, which the ledger pin
(`ORACLE_HASHES.json` + tests/test_gate_freshness.py) only permits in
the round the query's own cohort fronts. ``normalize_phone_lengths``
gated at r12 (the r12 cohort), which fronts at r15.

r15 front-commit recipe (mechanical):

1. in ``plans/wrangling.py::normalize_phone_lengths``: replace the
   oracle's ``c_custkey * 987654321`` with the widened form in
   :data:`ORACLE_V2` below (Spark side unchanged);
2. in ``plans/queries.py::running_revenue_per_customer``: swap the
   build for :func:`running_revenue_per_customer_v2` and the oracle
   for :data:`ORACLE_RUNNING_V2` (output column becomes
   ``running_cents``);
3. regenerate ORACLE_HASHES.json snapshots 15/16 + QUERIES.md;
4. remove the strict xfail entry from tests/test_key_domain_stress.py;
5. delete this module and its guard test
   (tests/test_r15_prepared.py).
"""

from __future__ import annotations

#: the registered oracle with the ONE legal change: the key product is
#: carried in HUGEINT so the derivation is total at any key domain.
ORACLE_V2 = """
    WITH raw AS (
      SELECT c_custkey,
             substr(CAST(CAST(c_custkey AS HUGEINT) * 987654321
                         + 1234567890123 AS VARCHAR),
                    1, CAST(7 + c_custkey % 7 AS INT)) AS d
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN length(d) IN (11, 9) THEN '+' || d
                WHEN length(d) = 12      THEN '+' || substr(d, 1, 2) || substr(d, 4)
                WHEN length(d) IN (10, 8) THEN '+31' || substr(d, 2)
                WHEN length(d) = 13      THEN '+' || substr(d, 3)
                WHEN length(d) = 7       THEN '+31' || d
                ELSE d END AS phone
    FROM raw
    """


# ---------------------------------------------------------------------------
# running_revenue_per_customer — exact-cents contract + chunked prefix sum
# ---------------------------------------------------------------------------
# r14 Zipf-soak finding (scripts/archive/skew_soak_r14.json): the per-key
# ROWS-frame running sum puts every row of a key in ONE task — with one
# customer at 10% of a 15M-row orders table the query ran 5.2x slow, and
# at 100 TB the hot task is 10% of the table. trailing_window_revenue
# (RANGE frame, exact cents) was fixed in-round via
# operators/skew.py:trailing_range_window because its values are
# order-free; THIS query's registered contract is round(SUM(double), 2)
# — an ORDERED float accumulation whose bit-identity with DuckDB depends
# on both engines folding in the same row order, so any distributed
# restructure (which re-associates the additions) is illegal under the
# current contract. The re-contract moves the output to EXACT INTEGER
# CENTS (running_cents), which is order-free, and the plan to a chunked
# two-level prefix sum:
#
#   1. chunk-local running cents: window over (custkey, 31-day chunk);
#   2. per-key EXCLUSIVE prefix of chunk totals (tiny relation: one row
#      per (key, chunk) — the hot key contributes #chunks rows, not
#      #orders rows);
#   3. join offsets back on (key, chunk) and add.
#
# Max task = a key's orders per chunk of ORDER-BY time — bounded by time
# density, not total history. Values identical to the one-partition
# window by associativity of integer addition. Legal only at r15 (the
# query's cohort-front round) because the OUTPUT CONTRACT (and oracle)
# changes; until then the registered pair stays gated and the skew cost
# is documented in PLANS.md.

ORACLE_RUNNING_V2 = """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM orders WHERE o_custkey % 20 = 0
"""


def running_revenue_per_customer_v2(spark, sf_dir):
    """Exact-cents running revenue via chunked two-level prefix sum —
    the skew-proof form of the registered one-partition window."""
    from pyspark.sql import Window, functions as F

    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (orders,) = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    base = orders.filter(F.col("o_custkey") % 20 == 0).select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        cents.alias("cents"),
        F.floor(d / F.lit(31)).alias("_chunk"),
    )
    dec = F.col("cents").cast("decimal(38,0)")
    w_local = (
        Window.partitionBy("o_custkey", "_chunk")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.select(
        "o_custkey",
        "o_orderkey",
        "_chunk",
        F.sum(dec).over(w_local).alias("_loc"),
    )
    # one row per (key, chunk): the offsets relation is tiny and its
    # per-key window is over #chunks rows, hot-key-proof by construction
    w_off = (
        Window.partitionBy("o_custkey")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        base.groupBy("o_custkey", "_chunk")
        .agg(F.sum(dec).alias("_ctot"))
        .select(
            "o_custkey",
            "_chunk",
            F.coalesce(
                F.sum("_ctot").over(w_off), F.lit(0).cast("decimal(38,0)")
            ).alias("_off"),
        )
    )
    return (
        local.join(off, ["o_custkey", "_chunk"])
        .select(
            "o_custkey",
            "o_orderkey",
            (F.col("_loc") + F.col("_off")).cast("bigint").alias(
                "running_cents"
            ),
        )
    )
