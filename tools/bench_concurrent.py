"""Concurrent-execution benchmark — the reference's disabled
`run_concurrent` harness (reference benches/query.rs:60-76,91-115:
12 concurrent executions of one prepared plan per mode, written but
commented out of criterion_group at :229,231).

Spark analog: one prepared DataFrame, N threads triggering actions
under the FAIR scheduler pool. Prints one JSON line:
  {"metric": "concurrent_sum_median_sec", "value": ..., "queries":
   {name: median_wall_sec_for_N_concurrent}, "n_concurrent": N, "sf": X}

Recorded as a supplementary table in BASELINE.md; the driver's
BENCH_r{N}.json uses bench.py (serial protocol).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402

# The reference trio (benches/query.rs:23-27) plus one representative
# per heavy operator family from bench.py's headline set — joins,
# windows, dedup, similarity under 12-way concurrency (VERDICT r1
# next-round #9). Override with SPARK_GRAFT_BENCH_QUERIES.
QUERIES = [
    "q_scan_full",
    "q_filter_proj",
    "q_agg_avg",
    "q_agg_distinct",
    "q_join_inner",
    "q_join_broadcast",
    "q_win_rank",
    "q_topk",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
]
N_CONCURRENT = 12  # reference run_concurrent(…, 12)
RUNS = 5


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    # scheduler.mode is context-level (not runtime-settable); FIFO with
    # many small stages interleaves fine for a throughput measure —
    # FAIR matters when long stages must not starve short ones.
    spark = get_spark(app_name="dftpc-bench-concurrent")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    wanted = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = [n.strip() for n in wanted.split(",") if n.strip()] if wanted else QUERIES

    results: dict[str, float] = {}
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)  # prepared plan, reused

        def one_run() -> float:
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=N_CONCURRENT) as pool:
                list(
                    pool.map(
                        lambda _: df.write.format("noop").mode("overwrite").save(),
                        range(N_CONCURRENT),
                    )
                )
            return time.perf_counter() - t0

        one_run()  # warmup
        times = [one_run() for _ in range(RUNS)]
        results[name] = round(statistics.median(times), 4)
        print(f"# {name}: {results[name]}s for {N_CONCURRENT} concurrent", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "concurrent_sum_median_sec",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "n_concurrent": N_CONCURRENT,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
