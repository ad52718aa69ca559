"""Dump .explain("formatted") for a set of queries to plans/<tag>/.

Usage:
  python tools/dump_plans.py <tag> [suffix] [q1,q2,...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").
Default query set: bench.py's HEADLINE. Also prints a one-line shape
summary per query (Exchange count, join operators, Python eval nodes)
so a session log carries the plan-shape audit without opening files.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shape_summary(text: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", text))
    joins = sorted(
        set(
            re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                text,
            )
        )
    )
    py = sorted(
        set(
            re.findall(
                r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
                r"FlatMapGroupsInPandas)\b",
                text,
            )
        )
    )
    # count per-scan (ADVICE r16): a single substring test understated
    # pushdown on multi-scan plans where just one scan had no filters
    n_pushed_total = len(re.findall(r"PushedFilters: \[", text))
    n_pushed_nonempty = len(re.findall(r"PushedFilters: \[[^\]]", text))
    if n_pushed_total:
        pushed = f"{n_pushed_nonempty}/{n_pushed_total} scans"
    else:
        pushed = "n/a"
    return (
        f"exchanges={n_ex} joins={','.join(joins) or '-'} "
        f"python={','.join(py) or '-'} pushed_filters={pushed}"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    if len(sys.argv) > 3:
        names = [n.strip() for n in sys.argv[3].split(",") if n.strip()]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dftpc-plans")
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            text = plan_text(df)
        except Exception as exc:  # streaming/sink queries may not build a plain DF
            print(f"# {name}: SKIP ({type(exc).__name__}: {exc})", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {shape_summary(text)}")
    spark.stop()


if __name__ == "__main__":
    main()
