"""Round-15 prepared oracle re-contract (NOT registered — deliberately
absent from ``catalog._load_all`` and the package ``__init__`` import
list, so nothing here reaches the gate surface before its legal round):

``normalize_phone_lengths`` — ORACLE-side HUGEINT widening of the
synthetic digit-string derivation (r13 key-domain stress harness,
cliff #6).

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
2. regenerate ORACLE_HASHES.json snapshots 15/16 + QUERIES.md;
3. remove the strict xfail entry from tests/test_key_domain_stress.py;
4. delete this module and its guard test
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
