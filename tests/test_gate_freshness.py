"""Verdict-freshness invariant, made executable (round-4 verdict #7).

The driver's correctness artifact records only the FIRST 50 registry
entries per round (`plans/catalog.py:_GATE_PRIORITY` — the 50-slot
rotation). The standing policy is: every registered query must have a
driver verdict at most 2 rounds old. Equivalently, at the moment the next
artifact is produced, (this round's front-50) ∪ (the latest existing
artifact's keys) must cover the whole registry. This test asserts exactly
that, so an under-covering rotation goes red in pytest instead of relying
on judge vigilance.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ARTIFACT_SLOTS = 50


def _latest_artifact() -> tuple[str, set[str]]:
    arts = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no CORRECTNESS_r*.json artifact in repo root"
    latest = arts[-1]
    return latest.name, set(json.loads(latest.read_text()).keys())


def test_front_slots_plus_latest_artifact_cover_registry():
    # the driver records the first ARTIFACT_SLOTS of the ORDERED catalog
    # (catalog.queries() → _ordered()), not raw registration order
    from amsterdam_map_data_wrangling_spark.plans.catalog import queries

    name, latest = _latest_artifact()
    ordered = list(queries())
    front = ordered[:ARTIFACT_SLOTS]
    uncovered = set(ordered) - set(front) - latest
    assert not uncovered, (
        f"queries with no driver verdict within 2 rounds (not in the "
        f"current front-{ARTIFACT_SLOTS} and absent from {name}): "
        f"{sorted(uncovered)} — move them forward in _GATE_PRIORITY"
    )


def test_gate_priority_is_exact_and_typo_free():
    from amsterdam_map_data_wrangling_spark.plans.catalog import (
        _GATE_PRIORITY,
        _ordered,
    )

    ordered = _ordered()  # raises on typos by itself
    assert len(_GATE_PRIORITY) == len(set(_GATE_PRIORITY)), "duplicate entries"
    # every registered query appears exactly once in the final ordering
    assert list(ordered) == _GATE_PRIORITY + [
        n for n in ordered if n not in _GATE_PRIORITY
    ]
