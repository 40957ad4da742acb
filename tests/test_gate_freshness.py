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


#: Registry growth can exceed the window: when (stale + never-gated) >
#: ARTIFACT_SLOTS, some BRAND-NEW queries must wait one round for their
#: first verdict. That is not staleness (they have no verdict to age),
#: but it must stay bounded and they must be FIRST in line next round.
NEW_QUERY_OVERFLOW_ALLOWANCE = 5


def test_front_slots_plus_latest_artifact_cover_registry():
    # the driver records the first ARTIFACT_SLOTS of the ORDERED catalog
    # (catalog.queries() → _ordered()), not raw registration order
    from amsterdam_map_data_wrangling_spark.plans.catalog import queries

    name, latest = _latest_artifact()
    ever_gated: set[str] = set()
    for art in Path(REPO).glob("CORRECTNESS_r*.json"):
        ever_gated |= set(json.loads(art.read_text()).keys())
    ordered = list(queries())
    front = ordered[:ARTIFACT_SLOTS]
    uncovered = set(ordered) - set(front) - latest
    # stale = had a verdict once, and it is now about to exceed 2 rounds:
    # these are the real hazard and are never excused
    stale = {q for q in uncovered if q in ever_gated}
    assert not stale, (
        f"queries whose driver verdict will exceed 2 rounds (not in the "
        f"current front-{ARTIFACT_SLOTS} and absent from {name}): "
        f"{sorted(stale)} — move them forward in _GATE_PRIORITY"
    )
    # never-gated overflow: only allowed when the window is genuinely
    # full, bounded, and parked immediately after the window so their
    # first verdict lands next round
    overflow = uncovered - ever_gated
    if overflow:
        assert len(overflow) <= NEW_QUERY_OVERFLOW_ALLOWANCE, (
            f"too many never-gated queries outside the window: "
            f"{sorted(overflow)}"
        )
        # every window slot must itself be forced (absent from the
        # latest artifact): an overflow while a covered query holds a
        # slot would be an avoidable gap
        free = [q for q in front if q in latest]
        assert not free, (
            f"never-gated overflow {sorted(overflow)} while window slots "
            f"hold already-covered queries {free}"
        )
        for q in overflow:
            pos = ordered.index(q)
            assert ARTIFACT_SLOTS <= pos < ARTIFACT_SLOTS + len(overflow) + 3, (
                f"never-gated {q} parked at {pos}, not immediately after "
                f"the window"
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
