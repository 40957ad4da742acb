"""The reference's interactive SQL workload (``Readme.md:159-246``) over
the five shaped OSM tables — the analysis layer run where the reference ran
it: on ``nodes``/``nodes_tags``/``ways``/``ways_tags``/``ways_nodes``
views, not on TPC-H stand-ins.

Every statement is ANSI SQL that runs unchanged on ``spark.sql`` and on
DuckDB (tests/test_osm_workload.py executes both over the SAME shaped
tables and compares) — with the one deliberate divergence the survey calls
out (§2.4 A5): SQLite's ``LIKE`` is case-insensitive, so the workload
spells it ``ILIKE`` explicitly.

These are not in the driver's ``queries()`` gate because the driver's sf
dirs carry no OSM tables; the pytest gate plays the same role over the
reference-derived round-trip data (22k ways / 108k tags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: name → (sql, tables it needs). Shapes per Readme.md:
#: A1 counts :159-165, A2/U1 distinct users :169-171, T2/A5 coffee
#: :178-200, A3 busiest postcode :205-221, A4 top amenities :229-245,
#: A6 shares :226.
OSM_WORKLOAD: dict[str, str] = {
    "count_nodes": "SELECT COUNT(*) AS cnt FROM nodes",
    "count_ways": "SELECT COUNT(*) AS cnt FROM ways",
    "distinct_users": """
        SELECT COUNT(DISTINCT uid) AS num_users FROM (
          SELECT uid FROM nodes UNION ALL SELECT uid FROM ways
        ) alles
    """,
    "name_listing": """
        SELECT id, value FROM nodes_tags
        WHERE key = 'name' ORDER BY id, value
    """,
    "name_ilike_count": """
        SELECT COUNT(*) AS cnt FROM nodes_tags
        WHERE key = 'name' AND value ILIKE 'coffee%'
    """,
    "busiest_postcodes": """
        SELECT value, COUNT(DISTINCT id) AS num FROM ways_tags
        WHERE key = 'postcode'
        GROUP BY value ORDER BY num DESC, value LIMIT 10
    """,
    "top_keys": """
        SELECT key, COUNT(*) AS num FROM ways_tags
        GROUP BY key ORDER BY num DESC, key LIMIT 10
    """,
    "type_shares": """
        SELECT type, COUNT(*) AS num,
               round(CAST(100.0 * COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (), 2) AS pct
        FROM ways_tags GROUP BY type ORDER BY num DESC, type
    """,
    "way_lengths": """
        SELECT id, COUNT(*) AS n_nodes, MAX(position) + 1 AS span
        FROM ways_nodes GROUP BY id ORDER BY n_nodes DESC, id LIMIT 10
    """,
}


def register_osm_views(tables: dict[str, DataFrame]) -> None:
    """Register shaped OSM DataFrames as SQL views (the engine's analog of
    the reference's CSV→SQLite import, ``Readme.md:11``)."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def run_workload(
    spark: SparkSession, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Run (lazily) each workload statement via ``spark.sql`` against the
    registered views."""
    picked = names if names is not None else list(OSM_WORKLOAD)
    return {n: spark.sql(OSM_WORKLOAD[n]) for n in picked}
