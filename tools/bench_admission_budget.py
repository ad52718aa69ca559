"""Admission-gate evidence depth (r15, VERDICT r14 item 6 — a
zero-birth round spends its slack on measurement, not inventory):

(a) END-TO-END LATENCY BUDGET of the q_stream_admission drain. The
    r14 row recorded the honest split only as prose ("streaming
    machinery dominates at fixture scale"); this SPLITS the measured
    wall into
      - fingerprint collects (the gate's three bounded driver
        round-trips per micro-batch),
      - verdict execution (pruned index reads + joins + parquet
        append, executed at the per-batch write),
      - streaming machinery (total − the above: trigger scheduling +
        checkpoint commit — the cost a Kafka-sourced production
        deployment amortizes across a far larger batch),
    plus the post-drain verdict read the headline bench times.

(b) 12-CONCURRENT FULL DRAIN — the reference's run_concurrent shape
    (benches/query.rs:60-76) applied to the whole stream, not just
    the verdict read: 12 threads each draining an independent
    checkpointed stream through the SHARED serving indexes. This is
    the multi-tenant ingest picture: N pipelines gating concurrently
    against one index generation.

Usage: python tools/bench_admission_budget.py   (solo — drives Spark)
Prints one markdown table; numbers of record go into BASELINE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")  # bench convention

from datafusion_tpc_spark.session import get_spark  # noqa: E402
from datafusion_tpc_spark.streaming.admission import (  # noqa: E402
    run_admission_stream,
)

REPS = 5
N_CONCURRENT = 12
SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def _med(xs):
    return round(statistics.median(xs), 4)


def main() -> None:
    spark = get_spark(app_name="dftpc-bench-admission-budget")
    rows = []
    conc_rows = []
    try:
        for sf_dir in SFS:
            # warm pass: builds fixture + the three indexes (the
            # production precondition — indexes precede intake) and
            # JIT/codegen warmup, untimed
            run_admission_stream(spark, sf_dir).collect()

            totals, fps, execs, machs, reads = [], [], [], [], []
            for _ in range(REPS):
                t = {}
                t0 = time.perf_counter()
                df = run_admission_stream(spark, sf_dir, timings=t)
                drain = time.perf_counter() - t0
                t0 = time.perf_counter()
                df.collect()
                reads.append(time.perf_counter() - t0)
                totals.append(drain)
                fps.append(t.get("fingerprint_collect_s", 0.0))
                execs.append(t.get("verdict_exec_s", 0.0))
                machs.append(
                    drain
                    - t.get("fingerprint_collect_s", 0.0)
                    - t.get("verdict_exec_s", 0.0)
                )
            rows.append(
                (
                    sf_dir.rsplit("sf", 1)[-1],
                    _med(totals),
                    _med(fps),
                    _med(execs),
                    _med(machs),
                    _med(reads),
                    t.get("n_batches", 0),
                )
            )

            # (b) 12-concurrent full drains over the shared indexes
            def one_drain():
                t0 = time.perf_counter()
                run_admission_stream(spark, sf_dir).collect()
                return time.perf_counter() - t0

            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=N_CONCURRENT) as ex:
                per = list(ex.map(lambda _: one_drain(), range(N_CONCURRENT)))
            wall = time.perf_counter() - t0
            conc_rows.append(
                (sf_dir.rsplit("sf", 1)[-1], round(wall, 4), _med(per))
            )

        print(
            "\n| sf | drain total s | fingerprint collects s | "
            "verdict exec s | stream machinery s | verdict read s | batches |"
        )
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print("| " + " | ".join(str(x) for x in r) + " |")
        print(
            f"\n| sf | {N_CONCURRENT}-concurrent full-drain wall s | "
            "median per-drain s |"
        )
        print("|---|---|---|")
        for r in conc_rows:
            print("| " + " | ".join(str(x) for x in r) + " |")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
