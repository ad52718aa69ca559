"""IVF served-path pruning curve (r12, VERDICT r11 item 7): the
fraction of index FILES the partition-pruned serving scan actually
reads, per scale point, for the single-query and batched legs — the
data that separates the scan-size win from the pruning win.

At sf0.1 the 10-query x nprobe=2 BATCH probe union can cover all
IVF_K=8 cells (the BASELINE r11 caveat: pruning degenerates on the
tiny fixture for the batch leg), while the SINGLE-query leg always
reads nprobe/|cells| of the files — which is what the pruned-fraction
gate (tests/test_r12_ops.py::test_ivf_served_pruned_fraction_measured)
pins. At production scale k_cells grows ~sqrt(corpus), so the batch
union covers |union(probes)| << k_cells and the batch leg prunes too.

Usage: python tools/bench_served_pruning.py
Prints one markdown table; numbers of record go into BASELINE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")  # bench convention:
# timings of record read the layout-optimized copies (CLAUDE.md)

from pyspark.sql import functions as F  # noqa: E402

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402

REPS = 5


def main() -> None:
    registry.load_all()
    spark = get_spark()
    from datafusion_tpc_spark.functions.ivf import BATCH_N, IVF_NPROBE
    from datafusion_tpc_spark.operators import ivf_served

    print(
        "| sf | leg | cells probed/total | files read/total | "
        "pruned frac | median s |"
    )
    print("|---|---|---|---|---|---|")
    for sf in ("0.01", "0.1"):
        sf_dir = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), f"sf{sf}")
        path, _ = ivf_served._ivf_index(spark, sf_dir)
        idx = spark.read.parquet(path)
        total_files = (
            idx.select(F.col("_metadata.file_path").alias("f"))
            .distinct()
            .count()
        )
        cells_total = idx.select("cell").distinct().count()
        for leg, qname in (
            ("single", "q_sim_ivf_served"),
            (f"batch {BATCH_N}", "q_sim_ivf_served_batch"),
        ):
            if leg == "single":
                cand = ivf_served.ivf_served_candidates(spark, sf_dir)
                probed = sorted(
                    int(r["cell"])
                    for r in cand.select("cell").distinct().collect()
                )
            else:
                # the batch scan's probed-cell union, recomputed the
                # way the query itself computes it (review r12: the
                # earlier read of the RESULT's cell column undercounts
                # — a probed cell whose candidates miss every qid's
                # top-K is absent from the output, overstating the
                # pruned fraction in the numbers of record)
                from datafusion_tpc_spark.catalog import load_table
                from datafusion_tpc_spark.functions.ivf import (
                    BATCH_N,
                    IVF_NPROBE,
                    _norm_expr,
                    batch_cell_ranks,
                )

                cents = spark.createDataFrame(
                    ivf_served._ivf_index(spark, sf_dir)[1],
                    "cid int, e array<double>",
                )
                qb = (
                    load_table(spark, sf_dir, "embeddings")
                    .filter(F.col("vec_id") < BATCH_N)
                    .select(
                        F.col("vec_id").alias("qid"),
                        F.col("embedding")
                        .cast("array<double>")
                        .alias("qemb"),
                    )
                    .withColumn("qe", F.expr(_norm_expr("qemb")))
                )
                probed = sorted(
                    {
                        int(r["cell"])
                        for r in batch_cell_ranks(
                            qb.select("qid", "qe"), cents
                        )
                        .filter(F.col("rnk") <= IVF_NPROBE)
                        .select("cell")
                        .distinct()
                        .collect()
                    }
                )
            read_files = (
                spark.read.parquet(path)
                .filter(F.col("cell").isin(probed))
                .select(F.col("_metadata.file_path").alias("f"))
                .distinct()
                .count()
            )
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                registry.QUERIES[qname](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            med = statistics.median(times)
            note = "" if len(probed) <= IVF_NPROBE else " (union)"
            print(
                f"| {sf} | {leg}{note} | {len(probed)}/{cells_total} "
                f"| {read_files}/{total_files} "
                f"| {1 - read_files / total_files:.3f} | {med:.3f} |"
            )


if __name__ == "__main__":
    main()
