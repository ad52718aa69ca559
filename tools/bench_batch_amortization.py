"""Batched-ANN amortization curve (r11, VERDICT r10 item 7): per-query
cost at batch=1 vs batch=10 for every search/eval family that has both
a single-query and a batched leg — the data that justifies the batch
path at serving time.

Unlike bench.py (which times the prepared plan's action only), each
repetition here times BUILD + ACTION: the eval legs do their work
eagerly at call time (the plan-build caveat family, BASELINE.md), so
call-to-result wall time is the honest amortization comparator. The
trained-IVF codebook memo (functions/ivf.py) stays warm across reps —
that IS the production serving condition (train once, serve many).

Usage: python tools/bench_batch_amortization.py
Prints one markdown table; numbers of record go into BASELINE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402

PAIRS = [
    # (single-query leg, batched leg, batch size)
    ("q_sim_topk", "q_sim_batch", 10),
    ("q_sim_ivf", "q_sim_ivf_batch", 10),
    ("q_sim_ndcg", "q_sim_ndcg_batch", 10),
    ("q_sim_anneval", "q_sim_anneval_batch", 10),
    ("q_sim_ivfeval", "q_sim_ivfeval_batch", 10),
]
REPS = 5


def timed_call(spark, sf_dir, name) -> float:
    t0 = time.perf_counter()
    df = registry.QUERIES[name](spark, sf_dir)  # eager legs work HERE
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark(app_name="dftpc-bench-amortization")
    # warm JVM + parquet pools + the shared IVF codebook memo once,
    # outside every timing window
    for single, batch, _ in PAIRS:
        timed_call(spark, sf_dir, single)
        timed_call(spark, sf_dir, batch)
    print("| family (single → batch) | single s | batch s | "
          "per-query in batch s | amortization × |")
    print("|---|---|---|---|---|")
    for single, batch, n in PAIRS:
        ts = statistics.median(
            [timed_call(spark, sf_dir, single) for _ in range(REPS)]
        )
        tb = statistics.median(
            [timed_call(spark, sf_dir, batch) for _ in range(REPS)]
        )
        per_q = tb / n
        print(
            f"| {single} → {batch} | {ts:.4f} | {tb:.4f} | "
            f"{per_q:.4f} | {ts / per_q:.1f}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
