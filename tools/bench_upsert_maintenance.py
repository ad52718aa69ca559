"""Maintenance-cost-vs-corpus-size curve for the three incremental
serving-index upsert legs (r14, VERDICT r13 item 4 follow-through):
the upsert queries CLAIM per-batch maintenance cost independent of
corpus size (the batch's own minhash/encode/windowing plus a bounded
append — no rebuild, no corpus scan). This tool MEASURES that claim:
for each index family it times, at sf0.001 / sf0.01 / sf0.1,

  (a) ``maintain``: the incremental step alone — the ingest batch's
      projection/merge + bucketed-or-partitioned append onto a
      prebuilt base generation (fresh throwaway base per rep, append
      timed separately), and
  (b) ``rebuild``: the full-corpus index write (what a system without
      the maintenance leg pays per batch).

Corpus axis: sf0.01 -> sf0.1 grows documents 500 -> 5,000 (10x) and
embeddings 500 -> 2,000 (4x) while the ingest batch stays fixed by
definition (doc_id < 10 / vec_id < 10 / doc_id < 50) — the
discriminating signal is (b) growing with the corpus while (a) stays
flat at the batch's own cost. sf0.001 is omitted: its documents/
embeddings tables are row-identical in size to sf0.01 (TESTDATA
quirk), so it adds no corpus-axis signal. All writes go to /tmp
throwaway tables; the driver-path artifacts are untouched.

Usage: python tools/bench_upsert_maintenance.py   (solo — drives Spark)
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

REPS = 5
SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def _median(xs):
    return round(statistics.median(xs), 4)


def _lsh_legs(spark, sf_dir):
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.operators.lsh_served import (
        _SRV_BUCKETS,
        BATCH_N,
        _band_projection,
        _ingest_projection,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def write_bands(df, name, path, mode):
        (
            df.write.mode(mode)
            .option("path", path)
            .bucketBy(_SRV_BUCKETS, "bkey")
            .sortBy("bkey")
            .saveAsTable(name)
        )

    def rebuild(name, path):
        write_bands(_band_projection(docs), name, path, "overwrite")

    def base(name, path):
        write_bands(
            _band_projection(docs.filter(F.col("doc_id") >= BATCH_N)),
            name,
            path,
            "overwrite",
        )

    def maintain(name, path):
        write_bands(_ingest_projection(spark, sf_dir), name, path, "append")

    return base, maintain, rebuild


def _ivf_legs(spark, sf_dir):
    from datafusion_tpc_spark.operators.ivf_served import (
        _ingest_assignment,
        _ingest_base,
        _ivf_index,
    )
    from datafusion_tpc_spark.functions.ivf import _NORM_E, assign_cells
    from datafusion_tpc_spark.catalog import load_table

    _, codebook = _ivf_index(spark, sf_dir)  # persisted quantizer (setup)

    def write_cells(df, path, mode):
        df.write.mode(mode).partitionBy("cell").parquet(path)

    def rebuild(name, path):
        raw = load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        v = raw.select("vec_id", "label", "emb", F.expr(_NORM_E).alias("e"))
        write_cells(assign_cells(v, codebook), path, "overwrite")

    def base(name, path):
        write_cells(_ingest_base(spark, sf_dir, codebook), path, "overwrite")

    def maintain(name, path):
        write_cells(_ingest_assignment(spark, sf_dir, codebook), path, "append")

    return base, maintain, rebuild


def _decontam_legs(spark, sf_dir):
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.functions.digest import SPLIT_TRAIN_LT, h60, split_bucket
    from datafusion_tpc_spark.operators.decontam_served import (
        _SRV_BUCKETS,
        _WIN_EXPR,
        DCS_INGEST_LT,
        _ingest_hashes,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def train_h(pred):
        return (
            docs.filter(pred)
            .filter(split_bucket() < SPLIT_TRAIN_LT)
            .select(F.explode(F.expr(_WIN_EXPR)).alias("s"))
            .select(h60(F.col("s")).alias("h"))
            .distinct()
        )

    def write_h(df, name, path, mode):
        (
            df.write.mode(mode)
            .option("path", path)
            .bucketBy(_SRV_BUCKETS, "h")
            .sortBy("h")
            .saveAsTable(name)
        )

    def rebuild(name, path):
        write_h(train_h(F.lit(True)), name, path, "overwrite")

    def base(name, path):
        write_h(train_h(F.col("doc_id") >= DCS_INGEST_LT), name, path, "overwrite")

    def maintain(name, path):
        # the full merge, product code verbatim (r15: was an inline
        # copy; _merge_ingest_batch defaults to the IN-list form at
        # this batch size — bounded collect + bucket-pruned existing
        # read + anti-join + bucketed append)
        from datafusion_tpc_spark.operators.decontam_served import (
            _merge_ingest_batch,
        )

        _merge_ingest_batch(spark, name, path, _ingest_hashes(spark, sf_dir))

    return base, maintain, rebuild


def _decontam_smj_legs(spark, sf_dir):
    """The decontam maintain step FORCED onto the SortMergeJoin merge
    form (inlist_max=0) — r15: the crossover measurement showed the
    IN-list form's VALUES/isin plan cost (~0.9 ms/hash) is what made
    the r14 table read 'merge > tiny rebuild'; this row shows the
    maintenance step itself with that overhead removed."""
    base, _maintain, rebuild = _decontam_legs(spark, sf_dir)
    from datafusion_tpc_spark.operators.decontam_served import (
        _ingest_hashes,
        _merge_ingest_batch,
    )

    def maintain(name, path):
        _merge_ingest_batch(
            spark, name, path, _ingest_hashes(spark, sf_dir), inlist_max=0
        )

    return base, maintain, rebuild


FAMILIES = {
    "lsh": _lsh_legs,
    "ivf": _ivf_legs,
    "decontam": _decontam_legs,
    "decontam_smj": _decontam_smj_legs,
}


def main() -> None:
    spark = get_spark(app_name="bench-upsert-maintenance")
    print("| sf | index | maintain median s | rebuild median s |")
    print("|---|---|---|---|")
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[1]
        for fam, mk in FAMILIES.items():
            base, maintain, rebuild = mk(spark, sf_dir)
            m_times, r_times = [], []
            for rep in range(REPS):
                name = f"upm_{fam}_{sf.replace('.', '_')}_{rep}"
                path = f"/tmp/upm/{name}"
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                shutil.rmtree(path, ignore_errors=True)
                base(name, path)  # setup, untimed
                t0 = time.perf_counter()
                maintain(name, path)
                m_times.append(time.perf_counter() - t0)
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                shutil.rmtree(path, ignore_errors=True)
                t0 = time.perf_counter()
                rebuild(name, path)
                r_times.append(time.perf_counter() - t0)
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                shutil.rmtree(path, ignore_errors=True)
            print(f"| {sf} | {fam} | {_median(m_times)} | {_median(r_times)} |")
    shutil.rmtree("/tmp/upm", ignore_errors=True)


if __name__ == "__main__":
    main()
