"""Pins tools/edf_check.py's scheduling semantics (VERDICT r14 items
1-2): the pre-rotation state — committed DRIVER_WINDOW equal to the
latest CORRECTNESS round's keys — must NOT read as a real
infeasibility. Before this fix, running edf_check between the driver's
verification and the rotation commit seeded the forward simulation
with the just-verified window, burning the current round on
re-verification and printing a FAIL indistinguishable from a genuinely
unschedulable calendar.
"""

from __future__ import annotations

import subprocess
import sys
import os

from tools.edf_check import simulate

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _synthetic_anchors():
    """60 queries at cap 2, window 20: three 20-query blocks anchored
    r1/r2/r3 — schedulable iff each round verifies the oldest block."""
    anchors = {}
    for blk, rnd in ((0, 1), (1, 2), (2, 3)):
        for i in range(20):
            anchors[f"q{blk:02d}_{i:02d}"] = rnd
    return anchors


def test_pre_rotation_window_is_infeasible_but_edf_choice_is_not():
    """The exact r15 ambiguity in miniature: seeding round 4 with the
    just-verified anchor-3 block (the pre-rotation committed window)
    starves the anchor-1 block past its deadline — FAIL — while the
    EDF-chosen window (the anchor-1 block) is feasible. edf_check must
    therefore simulate with the EDF choice when it detects the
    pre-rotation state, not the committed window."""
    anchors = _synthetic_anchors()
    stale_window = [f"q02_{i:02d}" for i in range(20)]  # last round's keys

    ok_committed, _ = simulate(
        anchors, current=4, cap=2, first_window=stale_window, window_size=20
    )
    assert not ok_committed

    ok_edf, lines = simulate(
        anchors, current=4, cap=2, first_window=None, window_size=20
    )
    assert ok_edf
    assert all("INFEASIBLE" not in ln for ln in lines)


def test_truly_infeasible_is_fail_even_with_edf_choice():
    """Over-full calendar (3 blocks all at the same anchor, one
    window's worth of slots per round at cap 0) must FAIL under EDF
    too — pre-rotation detection must not mask real infeasibility."""
    anchors = {f"q_{i:03d}": 1 for i in range(60)}
    ok, lines = simulate(anchors, current=2, cap=0, first_window=None, window_size=20)
    assert not ok
    assert any("INFEASIBLE" in ln for ln in lines)


def test_cli_post_rotation_exits_zero_without_pre_rotation_banner():
    """Repo state in this round is post-rotation (DRIVER_WINDOW is the
    staged anchor block, not the r14 keys): the CLI must exit 0 and
    must NOT print the PRE-ROTATION banner."""
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "edf_check.py")],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PRE-ROTATION" not in proc.stdout
    assert "EDF: OK" in proc.stdout
