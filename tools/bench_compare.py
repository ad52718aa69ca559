"""Compare a bench.py JSON line against BASELINE.md's per-query table.

Usage: python tools/bench_compare.py <bench_json_file> [ratio_flag]

Parses every `| q_name | <seconds> |` row of BASELINE.md (LAST
occurrence wins — the tables are append-newest-last, and per-query
re-records replace the old row in place), joins against the bench
JSON's `queries` (median) and `queries_min` channels, and prints the
queries whose MIN-of-10 exceeds `ratio_flag` × baseline (default
1.5). The min channel is the contention-free comparator (BASELINE.md
protocol notes): a median breach with a clean min is ambient load,
not a regression.
"""

from __future__ import annotations

import json
import re
import sys


def baseline_rows(path: str = "BASELINE.md") -> dict[str, float]:
    """Two table shapes exist: the round-3 master table
    `| name | 0.1 | median | runs | config |` (seconds in cell 3)
    and the append-only per-query rows `| name | median | date… |`
    (seconds in cell 2). Newest rows are appended last — last one
    wins."""
    rows: dict[str, float] = {}
    in_autogen = False
    for line in open(path):
        # the consolidated numbers-of-record table is RENDERED FROM
        # this parse (tools/gen_baseline_index.py) — it must never
        # feed back into it, or a stale copy would shadow newer
        # per-round rows appended after it
        if "AUTOGEN:numbers-of-record begin" in line:
            in_autogen = True
        if "AUTOGEN:numbers-of-record end" in line:
            in_autogen = False
            continue
        if in_autogen:
            continue
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 4 or not cells[1].startswith("q_"):
            continue
        name = cells[1]
        # Master-table detection by SHAPE (median + integer runs
        # columns), not by cells[2] == "0.1" — a per-query row whose
        # median is exactly 0.1 s would otherwise be misparsed and
        # silently dropped (review r7).
        try:
            median = float(cells[2])
        except ValueError:
            continue
        if len(cells) >= 6:
            try:
                master_median = float(cells[3])
                int(cells[4])
                median = master_median
            except ValueError:
                pass
        rows[name] = median
    return rows


def main() -> int:
    bench = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    flag = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    base = baseline_rows()
    med, mn = bench["queries"], bench.get("queries_min", {})
    missing = sorted(set(med) - set(base))
    flagged = []
    for q, b in sorted(base.items()):
        if q not in med:
            continue
        r_min = mn.get(q, med[q]) / b
        if r_min > flag:
            flagged.append((q, b, med[q], mn.get(q, med[q]), r_min))
    print(f"bench queries: {len(med)}  baseline rows: {len(base)}")
    if missing:
        print(f"no baseline row ({len(missing)}): {' '.join(missing)}")
    if not flagged:
        print(f"REGRESSIONS (min > {flag}x baseline): none")
    else:
        print(f"REGRESSIONS (min > {flag}x baseline): {len(flagged)}")
        for q, b, m, lo, r in sorted(flagged, key=lambda x: -x[4]):
            print(f"  {q}: baseline {b:.3f}  median {m:.3f}  min {lo:.3f}  ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
