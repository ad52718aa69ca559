"""IN-list vs SortMergeJoin crossover for the decontam dedupe-on-
ingest merge (r15 — the _DCS_INLIST_MAX=10⁴ threshold in
operators/decontam_served.py was set by reasoning, not measurement;
this MEASURES it so the number of record is empirical).

For synthetic ingest batches of growing distinct-hash counts, time
_merge_ingest_batch against a freshly built REAL base index (the
sf0.1 train-span build) in both physical forms:

  - inlist:  forced small-batch path (bounded collect → VALUES
             literal frame → isin() bucket-pruned point read → LEFT
             ANTI on literals). Its honest cost includes the VALUES
             SQL construction and the n-literal isin plan — that IS
             the mechanism.
  - smj:     forced at-scale path (batch stays distributed, LEFT ANTI
             as a SortMergeJoin against the bucketed index).

The synthetic batch is spark.range-derived (deterministic h values in
the h60 domain, disjoint from real hashes with probability ~1), NOT
values_df — so the SMJ leg is measured as it would run in production,
from an ingest DataFrame. Each timing gets a fresh copy of the base
index (the merge appends).

Usage: python tools/bench_merge_crossover.py   (solo — drives Spark)
Prints one markdown table; numbers of record go into BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")  # bench convention

from pyspark.sql import functions as F  # noqa: E402

from datafusion_tpc_spark.session import get_spark  # noqa: E402

REPS = 3
SF_DIR = "/root/testdata/sf0.1"
# Small sizes included so every BASELINE.md r15 crossover row is
# reproducible by the tool as committed (ADVICE r15 — the 50-500 rows
# of record originally came from an ad-hoc run with a modified list).
BATCH_SIZES = (50, 100, 200, 500, 1_000, 5_000, 10_000, 50_000, 100_000)
_BASE = "/tmp/merge_crossover"


def _synthetic_batch(spark, n: int):
    """n distinct deterministic longs in the h60 domain (Knuth
    multiplicative spread of range ids, masked to 60 bits)."""
    return spark.range(n).select(
        ((F.col("id") * F.lit(2654435761)) % F.lit(1 << 60)).alias("h")
    )


def _fresh_base(spark, name: str, path: str):
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.functions.digest import (
        SPLIT_TRAIN_LT,
        h60,
        split_bucket,
    )
    from datafusion_tpc_spark.operators.decontam_served import (
        _SRV_BUCKETS,
        _WIN_EXPR,
    )

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(path, ignore_errors=True)
    (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(split_bucket() < SPLIT_TRAIN_LT)
        .select(F.explode(F.expr(_WIN_EXPR)).alias("s"))
        .select(h60(F.col("s")).alias("h"))
        .distinct()
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(_SRV_BUCKETS, "h")
        .sortBy("h")
        .saveAsTable(name)
    )


def main() -> None:
    from datafusion_tpc_spark.operators.decontam_served import (
        _merge_ingest_batch,
    )

    spark = get_spark(app_name="dftpc-bench-merge-crossover")
    print("| batch hashes | inlist median s | smj median s | faster |")
    print("|---|---|---|---|")
    try:
        # warm the corpus read + codegen once
        _fresh_base(spark, "mc_warm", f"{_BASE}/warm")
        for n in BATCH_SIZES:
            meds = {}
            for form, inlist_max in (("inlist", 10**9), ("smj", 0)):
                times = []
                for rep in range(REPS):
                    name = f"mc_{form}_{n}_{rep}"
                    path = f"{_BASE}/{name}"
                    _fresh_base(spark, name, path)
                    batch = _synthetic_batch(spark, n)
                    t0 = time.perf_counter()
                    _merge_ingest_batch(
                        spark, name, path, batch, inlist_max=inlist_max
                    )
                    times.append(time.perf_counter() - t0)
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                    shutil.rmtree(path, ignore_errors=True)
                meds[form] = statistics.median(times)
            faster = "smj" if meds["smj"] < meds["inlist"] else "inlist"
            print(
                f"| {n} | {meds['inlist']:.3f} | {meds['smj']:.3f} "
                f"| {faster} |"
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS mc_warm")
        shutil.rmtree(_BASE, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
