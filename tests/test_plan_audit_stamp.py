"""Drift guard for the registry-wide physical-plan audit (VERDICT r12
item 2: the 50-slot window was machine-audited every round, but the
other ~200 registered plans had never been — where the next
Exchange-SinglePartition / cartesian scale-killer would hide).

PLAN_AUDIT.json is written only by a FULL zero-hazard
``scripts/plan_audit.py --all`` run; this test pins it to the LIVE
registry so adding or renaming a query forces a re-audit before the
"registry-wide audit clean" claim can be made again — the same
stamp-vs-registry pattern as tests/test_sweep_stamp.py.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from udacity_data_engineering_spark.plans.registry import all_queries

REPO = Path(__file__).resolve().parents[1]


def test_plan_audit_stamp_matches_live_registry():
    stamp = json.loads((REPO / "PLAN_AUDIT.json").read_text())
    names = sorted(all_queries())
    assert stamp["registry_count"] == len(names), (
        f"PLAN_AUDIT.json records {stamp['registry_count']} queries but "
        f"the registry holds {len(names)} — re-run "
        f"scripts/plan_audit.py --all to re-audit and re-stamp"
    )
    live_hash = hashlib.sha256("\n".join(names).encode()).hexdigest()
    assert stamp["names_sha256"] == live_hash, (
        "PLAN_AUDIT.json query-name hash diverges from the live registry "
        "— a query was renamed/added/removed since the last full audit"
    )
    assert stamp["flagged"] == 0
    # r14: streaming queries are no longer a skipped corner — every one
    # executes under micro-batch plan capture and its last-trigger plan
    # is audited with the same hazard markers
    assert stamp["skipped_streaming"] == 0
    assert stamp["streaming_audited"] >= 10
    assert stamp["micro_batch_plans"] >= stamp["streaming_audited"]
