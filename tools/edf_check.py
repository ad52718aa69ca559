"""Driver-window forcing computation + forward EDF feasibility check.

Recomputes, from the committed CORRECTNESS_r*.json artifacts and the
test suite's _BIRTH_ROUND pins, each query's verification anchor (last
driver row, else birth round), then:

1. prints the anchor distribution and the set FORCED into the current
   round's window (anchor <= current_round - (cap + 1));
2. validates registry.DRIVER_WINDOW against it — every forced id must
   be in the window (a missing one means test_window_staleness will
   fail), and window ids must exist;
3. simulates forward rounds under earliest-deadline-first to confirm
   every deadline stays meetable at the current inventory size.

PRE-ROTATION semantics (VERDICT r14 items 1-2): when the committed
DRIVER_WINDOW is exactly the keys of the latest CORRECTNESS artifact,
the repo is in the just-verified-not-yet-rotated state — seeding the
simulation with that window would waste the current round re-verifying
fresh greens and print a FAIL that means "you haven't rotated yet",
indistinguishable from real infeasibility. In that state the current
round is simulated with the EDF-chosen window instead, and the status
line says PRE-ROTATION explicitly (exit 0 when feasible-after-rotation).

Run at every rotation (CLAUDE.md: rotation is the first commit of a
round) BEFORE choosing the free slots.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

WINDOW_SIZE = 50


def load_history(repo: str = _REPO):
    """(latest_round, {query_id: last round with a driver row},
    {query_id set of latest round}) from CORRECTNESS_r*.json."""
    last: dict[str, int] = {}
    latest_keys: set[str] = set()
    max_round = 0
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnum = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            keys = set(json.load(f))
        if rnum > max_round:
            max_round, latest_keys = rnum, keys
        for qid in keys:
            last[qid] = max(last.get(qid, 0), rnum)
    return max_round, last, latest_keys


def simulate(
    anchors: dict[str, int],
    current: int,
    cap: int,
    first_window: list[str] | None,
    rounds: int = 8,
    window_size: int = WINDOW_SIZE,
):
    """Forward EDF feasibility. first_window=None means EDF chooses
    the current round's window too (the pre-rotation / planning form).
    Returns (ok, lines)."""
    a = dict(anchors)
    lines: list[str] = []
    ok = True
    for rnd in range(current, current + rounds):
        if rnd == current and first_window is not None:
            chosen = list(first_window)
        else:
            chosen = sorted(a, key=lambda q: (a[q], q))[:window_size]
        viol = [q for q in a if q not in set(chosen) and rnd - a[q] > cap]
        if viol:
            lines.append(f"  r{rnd}: INFEASIBLE — {len(viol)} overdue outside window")
            ok = False
            break
        for q in chosen:
            a[q] = rnd
        nxt = sum(1 for q in a if a[q] <= rnd + 1 - (cap + 1))
        lines.append(f"  r{rnd}: window={len(chosen)} forced_next={nxt}")
        if rnd == current and nxt >= 45:
            # At cap 6 the staleness tripwire is silent at the round
            # boundary (the suite can be fully green with a 49-query
            # cliff one round out) — this is the loud replacement.
            lines.append(
                f"  WARNING: {nxt} ids become FORCED at r{rnd + 1} — "
                "skipping or shrinking this round's rotation makes "
                "r+1 unschedulable. Rotate the staged block NOW."
            )
    return ok, lines


def main() -> None:
    from datafusion_tpc_spark import registry

    registry.load_all()
    import tests.test_registry_order as tro

    max_round, last, latest_keys = load_history()
    current = max_round + 1
    cap = tro._MAX_STALE_ROUNDS
    anchors = {
        q: last.get(q) or tro._BIRTH_ROUND.get(q, 1) for q in registry.QUERIES
    }
    dist: dict[int, int] = {}
    for a in anchors.values():
        dist[a] = dist.get(a, 0) + 1
    print(f"inventory={len(anchors)} cap={cap} current_round=r{current}")
    print("anchor distribution:", dict(sorted(dist.items())))

    pre_rotation = set(registry.DRIVER_WINDOW) == latest_keys and latest_keys
    if pre_rotation:
        print(
            f"PRE-ROTATION STATE: DRIVER_WINDOW == CORRECTNESS_r{max_round} "
            "keys (just-verified, not yet rotated) — simulating "
            f"r{current} with the EDF-chosen window. Rotate the staged "
            "block, then re-run."
        )

    forced = sorted(q for q, a in anchors.items() if a <= current - (cap + 1))
    print(f"forced into r{current} window: {len(forced)}")
    window = set(registry.DRIVER_WINDOW)
    missing_forced = [] if pre_rotation else [q for q in forced if q not in window]
    unknown = [q for q in registry.DRIVER_WINDOW if q not in registry.QUERIES]
    free = [q for q in registry.DRIVER_WINDOW if q not in set(forced)]
    print(f"window size: {len(registry.DRIVER_WINDOW)} (free slots: {len(free)})")
    if missing_forced:
        print("FORCED IDS MISSING FROM DRIVER_WINDOW:", missing_forced)
    if unknown:
        print("WINDOW NAMES UNREGISTERED QUERIES:", unknown)

    # forward EDF simulation: committed window first (unless
    # pre-rotation, where EDF picks r_current too), then pure EDF
    first = None if pre_rotation else list(registry.DRIVER_WINDOW)
    ok, lines = simulate(anchors, current, cap, first)
    print("\n".join(lines))
    feasible = ok and not missing_forced and not unknown
    if pre_rotation:
        status = (
            "OK after rotation (PRE-ROTATION — rotate the staged block, then re-run)"
            if feasible
            else "FAIL (infeasible even with an EDF-chosen rotation)"
        )
    else:
        status = "OK" if feasible else "FAIL"
    print(f"EDF: {status}")
    sys.exit(0 if feasible else 1)


if __name__ == "__main__":
    main()
