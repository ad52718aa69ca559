"""Bucket-count pruning curve for the hash-bucketed serving paths
(r13, VERDICT r12 item 7): the BATCH legs of q_dedup_lsh_served and
q_dedup_decontam_served degenerate on the shipped fixture because the
probe union's key count approaches the default 16 buckets
(BATCH_N x bands = 40 keys for LSH; ~30-60 window hashes for
decontam). Production bucket counts are sized to O(cluster cores) —
this tool MEASURES that claim instead of asserting it, by rebuilding
each index at increasing bucket counts and reading the executed
plan's SelectedBucketsCount for the single and batch probes.

The bucket count enters each index's source fingerprint, so every
setting builds its own catalog table / cache dir and the default
16-bucket driver-path artifacts are untouched.

Usage: python tools/bench_bucket_pruning.py   (solo — drives Spark)
Prints one markdown table; numbers of record go into BASELINE.md.
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")  # bench convention

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402

REPS = 5
BUCKET_COUNTS = (16, 64, 256)


def _measure(spark, sf_dir, qname):
    """(SelectedBucketsCount sel/total or None if elided, median s)."""
    times = []
    plan = ""
    for _ in range(REPS):
        df = registry.QUERIES[qname](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", final)
    sel = (int(m.group(1)), int(m.group(2))) if m else None
    return sel, statistics.median(times)


def main() -> None:
    registry.load_all()
    spark = get_spark()
    from datafusion_tpc_spark.operators import decontam_served, lsh_served

    legs = (
        ("lsh", lsh_served, "q_dedup_lsh_served"),
        ("lsh", lsh_served, "q_dedup_lsh_served_batch"),
        ("decontam", decontam_served, "q_dedup_decontam_served"),
        ("decontam", decontam_served, "q_dedup_decontam_served_batch"),
        # r15: the UPSERTED decontam index — same probe, but the scan
        # spans the base + merge file generations; the point is that
        # SelectedBucketsCount pruning holds across generations at
        # every bucket count (the _SRV_BUCKETS constant enters the
        # upsert fingerprint, so each setting builds fresh)
        ("decontam", decontam_served, "q_dedup_decontam_upsert"),
    )
    print("| sf | query | buckets | sel/total | pruned frac | median s |")
    print("|---|---|---|---|---|---|")
    saved = {id(m): m._SRV_BUCKETS for _, m, _ in legs}
    try:
        for sf in ("0.1",):
            sf_dir = os.path.join(
                os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"),
                f"sf{sf}",
            )
            for nb in BUCKET_COUNTS:
                for _fam, mod, qname in legs:
                    mod._SRV_BUCKETS = nb
                    sel, med = _measure(spark, sf_dir, qname)
                    if sel is None:
                        frac = "scan elided (clean probe)"
                        sels = "0 (elided)"
                    else:
                        frac = f"{1 - sel[0] / sel[1]:.3f}"
                        sels = f"{sel[0]}/{sel[1]}"
                    print(
                        f"| {sf} | {qname} | {nb} | {sels} "
                        f"| {frac} | {med:.3f} |"
                    )
    finally:
        for _, m, _ in legs:
            m._SRV_BUCKETS = saved[id(m)]


if __name__ == "__main__":
    main()
