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

from datafusion_tpc_spark import registry  # noqa: E402

WINDOW_SIZE = 50


def main() -> None:
    registry.load_all()
    import tests.test_registry_order as tro

    last: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        rnum = int(re.search(r"r(\d+)\.json$", path).group(1))
        max_round = max(max_round, rnum)
        with open(path) as f:
            for qid in json.load(f):
                last[qid] = max(last.get(qid, 0), rnum)
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

    forced = sorted(q for q, a in anchors.items() if a <= current - (cap + 1))
    print(f"forced into r{current} window: {len(forced)}")
    window = set(registry.DRIVER_WINDOW)
    missing_forced = [q for q in forced if q not in window]
    unknown = [q for q in registry.DRIVER_WINDOW if q not in registry.QUERIES]
    free = [q for q in registry.DRIVER_WINDOW if q not in set(forced)]
    print(f"window size: {len(registry.DRIVER_WINDOW)} (free slots: {len(free)})")
    if missing_forced:
        print("FORCED IDS MISSING FROM DRIVER_WINDOW:", missing_forced)
    if unknown:
        print("WINDOW NAMES UNREGISTERED QUERIES:", unknown)

    # forward EDF simulation: current window first, then pure EDF
    a = dict(anchors)
    ok = True
    for rnd in range(current, current + 8):
        if rnd == current:
            chosen = list(registry.DRIVER_WINDOW)
        else:
            chosen = sorted(a, key=lambda q: (a[q], q))[:WINDOW_SIZE]
        viol = [q for q in a if q not in set(chosen) and rnd - a[q] > cap]
        if viol:
            print(f"  r{rnd}: INFEASIBLE — {len(viol)} overdue outside window")
            ok = False
            break
        for q in chosen:
            a[q] = rnd
        nxt = sum(1 for q in a if a[q] <= rnd + 1 - (cap + 1))
        print(f"  r{rnd}: window={len(chosen)} forced_next={nxt}")
        if rnd == current and nxt >= 45:
            # At cap 6 the staleness tripwire is silent at the round
            # boundary (the suite can be fully green with a 49-query
            # cliff one round out) — this is the loud replacement.
            print(
                f"  WARNING: {nxt} ids become FORCED at r{rnd + 1} — "
                "skipping or shrinking this round's rotation makes "
                "r+1 unschedulable. Rotate the staged block NOW."
            )
    status = "OK" if ok and not missing_forced and not unknown else "FAIL"
    print(f"EDF: {status}")
    sys.exit(0 if status == "OK" else 1)


if __name__ == "__main__":
    main()
