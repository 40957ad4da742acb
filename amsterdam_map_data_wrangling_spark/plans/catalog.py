"""Query-catalog registry.

Each named query is a pair: a DataFrame ``build(spark, sf_dir)`` and an
equivalent ANSI-SQL oracle string for DuckDB (``None`` → the driver runs a
weaker rows-only check; used only for genuinely non-SQL-expressible ops).

Conventions that keep the driver's hash compare honest (see
``plans/queries.py`` module docstring): identical aliases on both sides,
identical ``round()`` on float aggregates, total tie-break ordering under
every LIMIT, non-empty results at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

Build = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Build
    oracle: str | None  # None → non-SQL-expressible, driver does rows-only
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Build) -> Build:
        QUERIES[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    dfs = load_tables(spark, sf_dir, list(names))
    return [dfs[n] for n in names]


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    from amsterdam_map_data_wrangling_spark.plans import (  # noqa: F401
        dedup,
        multimodal,
        queries,
        similarity,
        sketches,
        text,
        windows,
        wrangling,
    )


def queries() -> dict[str, Build]:
    _load_all()
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
