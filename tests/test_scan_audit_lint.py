"""The scan-audit review as a lint (VERDICT r12 item 4): the justified
multi-scan set lives as DATA in tools/scan_audit.py (JUSTIFIED_MULTI),
the sweep's last committed result lives in tools/scan_audit_flags.json
(written by `python tools/scan_audit.py --write`), and this test diffs
the two — a new double-scan query fails the suite until it is either
rewritten to one scan or reviewed into JUSTIFIED_MULTI with a reason.
No Spark here: the expensive sweep runs once per birth round; this
just pins its outcome (the conftest.assert_driver_canonicalizable
turn-lore-into-lint precedent)."""

from __future__ import annotations

import importlib.util
import json
import os

from datafusion_tpc_spark import registry

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)


def _load_scan_audit():
    # tools/ is not a package; load the module directly WITHOUT
    # executing main() (import only defines constants).
    spec = importlib.util.spec_from_file_location(
        "scan_audit", os.path.join(_TOOLS, "scan_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_flagged_multiscan_is_justified():
    """Every query the committed sweep flagged as multi-scan must
    carry a written justification — the review is enforced."""
    sa = _load_scan_audit()
    with open(sa.ARTIFACT) as f:
        art = json.load(f)
    unjustified = [
        q for q in art["flagged"] if q not in sa.JUSTIFIED_MULTI
    ]
    assert not unjustified, (
        f"multi-scan queries without a reviewed justification: "
        f"{unjustified} — rewrite to one scan, or review the plan and "
        f"add to JUSTIFIED_MULTI in tools/scan_audit.py with the reason"
    )


def test_justifications_name_real_queries():
    """Hygiene: stale entries for deleted/renamed queries must be
    pruned so the justified set stays reviewable."""
    sa = _load_scan_audit()
    registry.load_all()
    ghosts = [
        q
        for q in list(sa.JUSTIFIED_MULTI) + list(sa.KNOWN_MULTI)
        if q not in registry.QUERIES
    ]
    assert not ghosts, f"justifications for unregistered queries: {ghosts}"


def test_sweep_artifact_covers_registry():
    """Every registered query must appear in the committed sweep
    (swept = collected + plan-inspected, or a declared KNOWN_MULTI
    skip) — forces `python tools/scan_audit.py --write` after
    births, the tools/gen_coverage.py convention."""
    sa = _load_scan_audit()
    registry.load_all()
    with open(sa.ARTIFACT) as f:
        art = json.load(f)
    missing = sorted(set(registry.QUERIES) - set(art["swept"]))
    assert not missing, (
        f"queries never swept by the committed scan audit: {missing} — "
        f"run `python tools/scan_audit.py --write` (solo) and commit "
        f"the refreshed tools/scan_audit_flags.json"
    )
