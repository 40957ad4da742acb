"""Oracle-definition ledger (r6 ADVICE #2): ORACLE_HASHES.json records,
per round, the hash of every gate's oracle SQL as it stood when that
round's CORRECTNESS artifact was earned. This file pins the CURRENT
round's snapshot to the live catalog (so any oracle edit forces a
ledger update, which the freshness test then sees); the stale-verdict
rejection itself lives in tests/test_gate_freshness.py."""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _current_round() -> int:
    rounds = [
        int(re.search(r"r(\d+)", p.name).group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
    ]
    return max(rounds) + 1


def test_ledger_current_round_matches_live_catalog():
    from amsterdam_map_data_wrangling_spark.plans.catalog import (
        oracle_hashes_snapshot,
    )

    ledger = json.loads((REPO / "ORACLE_HASHES.json").read_text())
    cur = _current_round()
    assert str(cur) in ledger, (
        f"ORACLE_HASHES.json has no round-{cur} snapshot — regenerate "
        f"with catalog.oracle_hashes_snapshot()"
    )
    live = oracle_hashes_snapshot()
    # cur is required; cur+1 is the OPTIONAL boundary pre-snapshot (the
    # imminent artifact is earned against exactly this code, so its
    # ledger entry is correct by construction — but only if it matches
    # the live catalog too)
    for r in (cur, cur + 1):
        key = str(r)
        if key not in ledger:
            continue
        stale_entries = {
            q for q in set(ledger[key]) | set(live)
            if ledger[key].get(q) != live.get(q)
        }
        assert not stale_entries, (
            f"oracle definitions drifted from the round-{key} ledger for "
            f"{sorted(stale_entries)}: update ORACLE_HASHES.json['{key}'] "
            f"via catalog.oracle_hashes_snapshot() AND make sure each "
            f"changed query is inside the front-50 gate window (a changed "
            f"oracle needs a fresh driver verdict)"
        )


def test_ledger_rounds_are_plausible():
    ledger = json.loads((REPO / "ORACLE_HASHES.json").read_text())
    rounds = sorted(int(k) for k in ledger if k.isdigit())
    cur = _current_round()
    # rounds may end at cur, or at cur+1 when the boundary pre-snapshot
    # is present (see test above); cur itself must always be recorded
    assert rounds and cur in rounds and rounds[-1] in (cur, cur + 1)
    for r in rounds:
        assert len(ledger[str(r)]) > 0
