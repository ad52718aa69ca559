"""Bench-tooling invariants: BASELINE.md row parsing feeds the
regression comparator, so a misparse silently un-guards a query
(review r7 — the master-table sentinel was the literal '0.1' sf cell,
which also matched any per-query row whose median is exactly 0.1 s)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from bench_compare import baseline_rows  # noqa: E402


def test_baseline_rows_shapes(tmp_path):
    md = tmp_path / "B.md"
    md.write_text(
        "| query | sf | median | runs | config |\n"
        "|---|---|---|---|---|\n"
        "| q_master | 0.1 | 0.4567 | 10 | local[32] |\n"
        "| q_perq | 0.1234 | 2026-08-14 r7 (at birth) |\n"
        "| q_tenth | 0.1 | 2026-08-14 r8 (median exactly one tenth) |\n"
        "| q_perq | 0.2222 | 2026-08-14 r9 (re-record, last wins) |\n"
    )
    rows = baseline_rows(str(md))
    assert rows["q_master"] == 0.4567  # master row: median from cell 3
    assert rows["q_tenth"] == 0.1  # per-query row with 0.1 median survives
    assert rows["q_perq"] == 0.2222  # append-newest-last: last wins


def test_baseline_rows_real_file():
    rows = baseline_rows(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "BASELINE.md")
    )
    # every registered headline-able query with a row parses to a float
    assert len(rows) > 200
    assert all(isinstance(v, float) and v > 0 for v in rows.values())
