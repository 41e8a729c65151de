"""Drift guard for the 3-scale verification sweep (the round-5 verdict's
doc-drift class: SCALE.md claimed "all 168 declared queries" while the
registry held 172, because the sweep's coverage claim lived in prose).

SWEEP.json is written only by a FULL zero-failure `verify_local.py` run;
this test pins it to the LIVE registry — add or rename a query and the
stamp mismatches until the sweep is actually re-run at every scale, so
the coverage claim can never silently go stale again. Same trick as
INVENTORY.md's guard (tests/test_registry_order.py).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from udacity_data_engineering_spark.plans.registry import all_queries

REPO = Path(__file__).resolve().parents[1]
REQUIRED_SCALES = ("sf0.001", "sf0.01", "sf0.1")


def test_sweep_stamp_matches_live_registry():
    stamp = json.loads((REPO / "SWEEP.json").read_text())
    names = sorted(all_queries())
    assert stamp["registry_count"] == len(names), (
        f"SWEEP.json records {stamp['registry_count']} queries but the "
        f"registry holds {len(names)} — re-run scripts/verify_local.py "
        f"at every scale to re-stamp"
    )
    live_hash = hashlib.sha256("\n".join(names).encode()).hexdigest()
    assert stamp["names_sha256"] == live_hash, (
        "SWEEP.json query-name hash diverges from the live registry — "
        "a query was renamed/added/removed since the last full sweep"
    )


def test_sweep_stamp_covers_all_three_scales():
    stamp = json.loads((REPO / "SWEEP.json").read_text())
    missing = [s for s in REQUIRED_SCALES if s not in stamp.get("scales", {})]
    assert not missing, (
        f"full sweep missing at scales {missing} — run "
        f"scripts/verify_local.py --sf /root/testdata/<scale> for each"
    )
    for s, rec in stamp["scales"].items():
        assert rec["failures"] == 0, f"sweep at {s} recorded failures"
