"""Interleaved old-vs-new A/B for the r17 rewrites (q_dedup_prefix
single-doc-exchange form, q_agg_freq Arrow-side MG merge). Builds the
r16 pipelines INLINE (verbatim copies of the pre-r17 bodies) and the
current registry forms, then alternates noop-sink timed runs so
ambient drift hits both arms equally (the r16 A/B protocol).

Usage: python tools/ab_r17.py [prefix|freq|decontam] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_OPT_CACHE", "1")

from pyspark.sql import Window, functions as F  # noqa: E402

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.catalog import cpu_width, load_table  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_prefix(spark, sf_dir):
    """Verbatim r16 q_dedup_prefix body (pre single-exchange rewrite),
    minus the cache rotation bookkeeping (the cache itself is kept)."""
    from datafusion_tpc_spark.functions.shingles import shingle_table
    from datafusion_tpc_spark.operators.prefix_join import _vocab_sids, _T

    sh = shingle_table(spark, sf_dir)
    try:
        docs_small = (
            os.path.getsize(os.path.join(sf_dir, "documents.parquet")) < 1 << 30
        )
    except OSError:
        docs_small = False
    vocab = _vocab_sids(sh)
    if docs_small:
        vocab = F.broadcast(vocab)
    sh_ids = sh.join(vocab, "s").select("doc_id", "sid", "df").cache()
    counts = sh_ids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        sh_ids.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("sid").asc()
                )
            ),
        )
        .join(counts, "doc_id")
        .filter(F.col("rn") <= F.expr("n DIV 2") + 1)
        .select("doc_id", "sid", "n")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.greatest(F.col("a.n"), F.col("b.n"))
                <= 2 * F.least(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .repartition(cpu_width(spark), "doc_a", "doc_b")
    )
    sets = sh_ids.groupBy("doc_id").agg(F.collect_list("sid").alias("ss"))
    if docs_small:
        sets = F.broadcast(sets)
    sets_a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ss").alias("ss_a"),
        F.size("ss").alias("na"),
    )
    sets_b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ss").alias("ss_b"),
        F.size("ss").alias("nb"),
    )
    n_common = F.size(F.array_intersect("ss_a", "ss_b"))
    jac = n_common / (F.col("na") + F.col("nb") - n_common)
    out = (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .filter(jac >= _T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    return out, sh_ids


def _old_mg_partition(batches):
    """Verbatim r16 _mg_partition (dict merge via to_pylist)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    counters: dict[str, int] = {}
    for rb in batches:
        toks = pc.list_flatten(pc.split_pattern(rb.column("text"), " "))
        vc = toks.value_counts()
        for token, cnt in zip(
            vc.field("values").to_pylist(), vc.field("counts").to_pylist()
        ):
            counters[token] = counters.get(token, 0) + cnt
            if len(counters) > 30:
                dec = min(counters.values())
                counters = {
                    t: c - dec for t, c in counters.items() if c - dec > 0
                }
    yield pa.RecordBatch.from_pydict(
        {
            "token": list(counters),
            "residual": [int(v) for v in counters.values()],
        },
        schema=pa.schema([("token", pa.string()), ("residual", pa.int64())]),
    )


def old_freq(spark, sf_dir):
    from datafusion_tpc_spark.operators.sketches import _K

    docs = load_table(spark, sf_dir, "documents").select("text")
    candidates = (
        docs.repartition(cpu_width(spark))
        .mapInArrow(_old_mg_partition, "token string, residual long")
        .select("token")
        .distinct()
    )
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    total = docs.agg(
        F.sum(F.greatest(F.size(F.split(F.col("text"), " ")), F.lit(0)))
        .cast("bigint")
        .alias("n")
    )
    return (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") * _K > F.col("n"))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") * 1.0 / F.col("n"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc_nulls_last(), F.col("token").asc_nulls_last())
    )


def run_once(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(spark, build_old, build_new, runs: int, warmups: int = 2):
    old_times, new_times = [], []
    cleanup = None
    old_df, cleanup = build_old(spark)
    new_df = build_new(spark)
    for _ in range(warmups):
        run_once(old_df)
        run_once(new_df)
    for i in range(runs):
        old_times.append(run_once(old_df))
        new_times.append(run_once(new_df))
    if cleanup is not None:
        cleanup.unpersist()
    return old_times, new_times


def report(tag, old_times, new_times):
    om, on = statistics.median(old_times), min(old_times)
    nm, nn = statistics.median(new_times), min(new_times)
    print(f"{tag}: OLD median {om:.4f} min {on:.4f} | NEW median {nm:.4f} min {nn:.4f}")
    print(f"{tag}: speedup median {om / nm:.3f}x min {on / nn:.3f}x")
    print(f"{tag}: old runs {[round(t, 4) for t in old_times]}")
    print(f"{tag}: new runs {[round(t, 4) for t in new_times]}")


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "prefix"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    registry.load_all()
    spark = get_spark(app_name=f"ab-r17-{what}")
    # session warmup
    warm = load_table(spark, SF_DIR, "lineitem")
    warm.write.format("noop").mode("overwrite").save()

    if what == "prefix":
        def b_old(s):
            return old_prefix(s, SF_DIR)

        def b_new(s):
            return registry.QUERIES["q_dedup_prefix"](s, SF_DIR)

        old_t, new_t = ab(spark, b_old, b_new, runs)
        report("q_dedup_prefix", old_t, new_t)
        # result equivalence on the full sf0.1 fixture
        o, cleanup = old_prefix(spark, SF_DIR)
        n = registry.QUERIES["q_dedup_prefix"](spark, SF_DIR)
        diff = o.exceptAll(n).count() + n.exceptAll(o).count()
        cleanup.unpersist()
        print(f"q_dedup_prefix: exceptAll symmetric diff = {diff}")
    elif what == "decontam":
        # A/B the REAL maintenance leg (the shipped small-batch path:
        # the sf0.1 ingest batch is ~hundreds of distinct hashes, far
        # under _DCS_INLIST_MAX): r16's unconditional persist-before-
        # probe vs the r17 SMJ-branch-conditional form. Fresh scratch
        # base per rep (the merge appends); both arms merge the SAME
        # _ingest_hashes batch.
        import shutil

        from datafusion_tpc_spark.operators.decontam_served import (
            _ingest_hashes,
            _merge_ingest_batch,
            _DCS_INLIST_MAX,
        )
        from datafusion_tpc_spark.catalog import load_table as _lt
        from datafusion_tpc_spark.functions.digest import (
            SPLIT_TRAIN_LT,
            h60,
            split_bucket,
        )
        from datafusion_tpc_spark.operators.decontam_served import (
            _SRV_BUCKETS,
            _WIN_EXPR,
            DCS_INGEST_LT,
        )

        def fresh_base(name, path):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(path, ignore_errors=True)
            (
                _lt(spark, SF_DIR, "documents")
                .filter(F.col("doc_id") >= DCS_INGEST_LT)
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

        def old_merge(name, path, batch):
            # verbatim r16 shape: unconditional persist across the probe
            batch = batch.persist()
            try:
                probe_rows = batch.limit(_DCS_INLIST_MAX + 1).collect()
                assert len(probe_rows) <= _DCS_INLIST_MAX
                hs = sorted(int(r["h"]) for r in probe_rows)
                from datafusion_tpc_spark.functions.literals import values_df

                batch_df = values_df(spark, [(h,) for h in hs], "h long")
                existing = spark.table(name).filter(F.col("h").isin(hs))
                new_rows = batch_df.join(existing, "h", "left_anti")
                (
                    new_rows.write.mode("append")
                    .option("path", path)
                    .bucketBy(_SRV_BUCKETS, "h")
                    .sortBy("h")
                    .saveAsTable(name)
                )
            finally:
                batch.unpersist()

        name, path = "ab_r17_dcs", "/tmp/ab_r17_dcs"
        old_t, new_t = [], []
        try:
            for i in range(runs):
                for arm, times in (("old", old_t), ("new", new_t)):
                    fresh_base(name, path)
                    batch = _ingest_hashes(spark, SF_DIR)
                    t0 = time.perf_counter()
                    if arm == "old":
                        old_merge(name, path, batch)
                    else:
                        _merge_ingest_batch(spark, name, path, batch)
                    times.append(time.perf_counter() - t0)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(path, ignore_errors=True)
        report("decontam_merge(small-branch)", old_t, new_t)
    elif what == "freq":
        def b_old(s):
            return old_freq(s, SF_DIR), None

        def b_new(s):
            return registry.QUERIES["q_agg_freq"](s, SF_DIR)

        old_t, new_t = ab(spark, lambda s: (old_freq(s, SF_DIR), None), b_new, runs)
        report("q_agg_freq", old_t, new_t)
        o = old_freq(spark, SF_DIR)
        n = registry.QUERIES["q_agg_freq"](spark, SF_DIR)
        diff = o.exceptAll(n).count() + n.exceptAll(o).count()
        print(f"q_agg_freq: exceptAll symmetric diff = {diff}")
    spark.stop()


if __name__ == "__main__":
    main()
