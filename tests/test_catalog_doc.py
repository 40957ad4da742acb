"""QUERIES.md is generated from the registry — fail if it drifts."""

from __future__ import annotations

from pathlib import Path

from amsterdam_map_data_wrangling_spark.plans.catalog import catalog_markdown

REPO = Path(__file__).resolve().parent.parent


def test_queries_md_matches_registry():
    on_disk = (REPO / "QUERIES.md").read_text()
    assert on_disk == catalog_markdown(), (
        "QUERIES.md is stale — regenerate: python -c \"from "
        "amsterdam_map_data_wrangling_spark.plans.catalog import "
        "catalog_markdown; print(catalog_markdown(), end='')\" > QUERIES.md"
    )
