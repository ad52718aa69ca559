"""Near-duplicate SERVING from a materialized LSH band index — the
dedup analog of operators/ivf_served.py (reference has no serving or
write path at all: src/object_store/file.rs:215-228 is todo!()).

The batch pipeline (q_dedup_minhash) recomputes shingles → minhash
signatures → banded buckets for the WHOLE corpus on every run. A
production ingest instead materializes the band table ONCE —
(doc_id, band, bkey) written `bucketBy(N, bkey)` — and answers "which
corpus docs are near-dup candidates of THIS document?" as a
bucket-pruned point lookup: compute the probe's 4 band keys (one doc,
in-engine), collect them as bounded literals, and read only the
buckets those keys hash to (`SelectedBucketsCount` ≤ 4 of N in the
scan — plan-gated). Zero corpus-side shingle/minhash lineage in the
serving plan.

At 100 TB: the band table is 4 rows × ~24 bytes per doc regardless of
document size (payload text never enters the index), the bucket count
is sized to O(cluster cores), and each incoming doc costs one local
minhash + a ≤4-bucket read — this is how streaming dedup admission
control actually runs, and composes with q_dedup_incr's digest store
for the exact-dup tier.
"""

from __future__ import annotations

import hashlib
import os
import threading

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import (
    load_table,
    prune_stale_cache_dirs,
    sanitized_sf_tag,
)
from datafusion_tpc_spark.functions.literals import values_df
from datafusion_tpc_spark.functions.shingles import SHINGLES_DUCK
from datafusion_tpc_spark.registry import query

# Same hash family / banding as q_dedup_minhash (operators/dedup.py) —
# the index must find exactly the candidates the batch pipeline finds;
# row-identity is pinned in tests/test_r12_ops.py.
from datafusion_tpc_spark.operators.dedup import (  # noqa: E402
    _BAND_SELECTS,
    _BANDS,
    _K,
    _MIN_EXPRS,
    band_projection as _band_projection,  # the ONE banding impl
)

PROBE_DOC = 8  # fixture doc with LSH candidates at sf0.01 AND sf0.1
BATCH_N = 10   # batched-admission probe set: doc_id < BATCH_N (the
               # functions/ivf.py BATCH_N convention)
_SRV_BUCKETS = 16
_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    ".cache",
    "lsh_served",
)
_LSH_LOCK = threading.Lock()


def _lsh_index(spark, sf_dir: str) -> str:
    """Ensure the bucketed band table exists for this source
    fingerprint; return its catalog name. Same once-per-(session, sf,
    fingerprint) build/race/staleness story as operators/bucketing.py
    (lock around exists-check+build, per-PID dir, per-prefix prune)."""
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    fp = hashlib.md5(
        f"{st.st_mtime_ns}:{st.st_size}:{_K}:{_BANDS}:{_SRV_BUCKETS}".encode()
    ).hexdigest()[:12]
    tag = sanitized_sf_tag(sf_dir)
    name = f"lsh_bands_{tag}_{fp}"
    with _LSH_LOCK:
        if not spark.catalog.tableExists(name):
            dir_key = f"{tag}_lsh-{fp}-{os.getpid()}"
            path = os.path.join(_CACHE_ROOT, dir_key, "bands")
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            (
                _band_projection(docs)
                .write.mode("overwrite")
                .option("path", path)
                .bucketBy(_SRV_BUCKETS, "bkey")
                .sortBy("bkey")
                .saveAsTable(name)
            )
            prune_stale_cache_dirs(_CACHE_ROOT, dir_key)
    return name


_LSH_SERVED_ORACLE = f"""
    WITH sh AS ({SHINGLES_DUCK}),
    sig AS (SELECT doc_id, {_MIN_EXPRS} FROM sh GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}
    ),
    probe AS (
      SELECT band, bkey FROM bands WHERE doc_id = {PROBE_DOC}
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_bands
    FROM bands b JOIN probe p ON b.band = p.band AND b.bkey = p.bkey
    WHERE b.doc_id <> {PROBE_DOC}
    GROUP BY b.doc_id
    ORDER BY n_shared_bands DESC NULLS LAST, doc_id ASC NULLS LAST
"""


def _serve_probe(spark, sf_dir, name):
    """The single-probe serving body shared by q_dedup_lsh_served and
    q_dedup_lsh_upsert — parameterized only by the index table name
    (the two queries differ in how the index was MAINTAINED, never in
    how it is read)."""
    probe = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == PROBE_DOC)  # pushed-down point read
        .select("doc_id", "text")
    )
    probe_rows = _band_projection(probe).collect()  # ≤ _BANDS rows
    keys = sorted({r["bkey"] for r in probe_rows})
    pair_lits = sorted(f"{r['band']}:{r['bkey']}" for r in probe_rows)
    bt = spark.table(name)
    return (
        bt.filter(F.col("bkey").isin(keys))  # bucket-pruning literal
        .filter(
            F.concat_ws(
                ":", F.col("band").cast("string"), F.col("bkey")
            ).isin(pair_lits)
        )
        .filter(F.col("doc_id") != PROBE_DOC)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_bands"))
        .orderBy(
            F.col("n_shared_bands").desc_nulls_last(),
            F.col("doc_id").asc_nulls_last(),
        )
    )


@query("q_dedup_lsh_served", oracle=_LSH_SERVED_ORACLE)
def q_dedup_lsh_served(spark, sf_dir):
    """Near-dup candidates of one document served from the
    MATERIALIZED band index: compute the probe doc's 4 (band, bkey)
    pairs in-engine from a pushed-down point read of documents,
    collect them (bounded: exactly _BANDS rows — the ivf_served
    probe-list precedent), and read the bucketed band table pruned to
    the buckets those keys hash to. The serving plan scans ONLY the
    index (`SelectedBucketsCount` ≤ 4 of {_SRV_BUCKETS} — plan-gated)
    with zero corpus shingle/minhash lineage; candidates are exactly
    q_dedup_minhash's pairs containing the probe (pinned in
    tests/test_r12_ops.py). Oracle recomputes the banding in SQL (the
    layout is a physical change only)."""
    return _serve_probe(spark, sf_dir, _lsh_index(spark, sf_dir))


_LSH_SERVED_BATCH_ORACLE = f"""
    WITH sh AS ({SHINGLES_DUCK}),
    sig AS (SELECT doc_id, {_MIN_EXPRS} FROM sh GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}
    ),
    probe AS (
      SELECT doc_id AS qid, band, bkey FROM bands
      WHERE doc_id < {BATCH_N}
    )
    SELECT p.qid, b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_bands
    FROM bands b JOIN probe p
      ON b.band = p.band AND b.bkey = p.bkey AND b.doc_id <> p.qid
    GROUP BY p.qid, b.doc_id
    ORDER BY qid ASC NULLS LAST, n_shared_bands DESC NULLS LAST,
             doc_id ASC NULLS LAST
"""


@query("q_dedup_lsh_served_batch", oracle=_LSH_SERVED_BATCH_ORACLE)
def q_dedup_lsh_served_batch(spark, sf_dir):
    """Batched near-dup admission from the materialized band index:
    ONE bucket-pruned index read serves a {BATCH_N}-document probe
    batch — the composition the single-probe path and
    q_sim_ivf_served_batch point at. The batch's band keys come from
    one pushed-down doc_id < {BATCH_N} read (collected: bounded at
    |batch| x _BANDS rows, the ivf_served_batch probe-list
    precedent); the scan prunes to the UNION of the keys' buckets
    (SelectedBucketsCount — on the tiny fixture the 40-key union can
    cover all {_SRV_BUCKETS} buckets, the same honest degeneration as
    the ivf batch leg; at production bucket counts sized to
    O(cluster cores) the union stays a small fraction), and the
    broadcast (qid, band, bkey) probe table fans candidates out per
    probe. Zero corpus mining lineage in the serving plan
    (plan-gated); per-probe candidate sets are row-identical to
    running the single-probe path per doc (pinned in
    tests/test_r12_ops.py)."""
    name = _lsh_index(spark, sf_dir)
    probes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BATCH_N)  # pushed-down batch read
        .select("doc_id", "text")
    )
    probe_rows = _band_projection(probes).collect()  # ≤ BATCH_N·_BANDS
    keys = sorted({r["bkey"] for r in probe_rows})
    # VALUES literal, not createDataFrame: the RDD-backed probe frame
    # costs ~0.2-0.4 s of scheduling per action (functions/literals.py)
    probe_df = values_df(
        spark,
        [(r["doc_id"], r["band"], r["bkey"]) for r in probe_rows],
        "qid long, band int, bkey string",
    )
    bt = spark.table(name)
    return (
        bt.filter(F.col("bkey").isin(keys))  # bucket-pruning literal
        .join(
            F.broadcast(probe_df),
            (bt.band == probe_df.band)
            & (bt.bkey == probe_df.bkey)
            & (bt.doc_id != probe_df.qid),
        )
        .groupBy("qid", bt.doc_id)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_bands"))
        .orderBy(
            F.col("qid").asc_nulls_last(),
            F.col("n_shared_bands").desc_nulls_last(),
            F.col("doc_id").asc_nulls_last(),
        )
    )


def _ingest_projection(spark, sf_dir):
    """The incremental maintenance WRITE's source: band rows of the
    ingest batch only, from ONE pushed-down doc_id < BATCH_N read —
    |batch| x _BANDS rows, never a corpus recompute. Split out so
    tests/test_r13_ops.py can gate the pushed filter on the write
    plan itself."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BATCH_N)
        .select("doc_id", "text")
    )
    return _band_projection(docs)


def _upserted_index(spark, sf_dir: str) -> str:
    """The INCREMENTALLY MAINTAINED band index: base table built from
    the pre-existing corpus (doc_id >= BATCH_N) once, then the ingest
    batch's band rows APPENDED — Spark's bucketed saveAsTable append
    writes per-bucket files alongside the base set and
    SelectedBucketsCount pruning spans both generations. Same
    lock/fingerprint/per-PID-dir story as _lsh_index (one lock on
    purpose: the two indexes share the band computation and a cold
    start may build both)."""
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    fp = hashlib.md5(
        f"up:{st.st_mtime_ns}:{st.st_size}:{_K}:{_BANDS}:"
        f"{_SRV_BUCKETS}:{BATCH_N}".encode()
    ).hexdigest()[:12]
    tag = sanitized_sf_tag(sf_dir)
    name = f"lsh_upsert_{tag}_{fp}"
    with _LSH_LOCK:
        if not spark.catalog.tableExists(name):
            dir_key = f"{tag}_lshup-{fp}-{os.getpid()}"
            path = os.path.join(_CACHE_ROOT, dir_key, "bands")
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            base = _band_projection(
                docs.filter(F.col("doc_id") >= BATCH_N)
            )
            (
                base.write.mode("overwrite")
                .option("path", path)
                .bucketBy(_SRV_BUCKETS, "bkey")
                .sortBy("bkey")
                .saveAsTable(name)
            )
            # the incremental ingest: |batch| x _BANDS rows appended,
            # bucketed identically — the maintenance cost is the
            # batch's own minhash, independent of corpus size
            try:
                (
                    _ingest_projection(spark, sf_dir)
                    .write.mode("append")
                    .option("path", path)
                    .bucketBy(_SRV_BUCKETS, "bkey")
                    .sortBy("bkey")
                    .saveAsTable(name)
                )
            except BaseException:
                # Two-step publish guard (the decontam_served r15
                # pattern): the base saveAsTable above has already
                # registered the table, so a failed ingest append
                # must not leave the batch-less index servable —
                # near-dup candidates would silently undercount.
                # Best-effort DROP (ADVICE r15): if the session/JVM
                # is the thing that failed, the cleanup itself raises
                # — the ORIGINAL exception must still propagate.
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                except BaseException:
                    pass
                raise
            prune_stale_cache_dirs(_CACHE_ROOT, dir_key)
    return name


@query("q_dedup_lsh_upsert", oracle=_LSH_SERVED_ORACLE)
def q_dedup_lsh_upsert(spark, sf_dir):
    """Near-dup admission served from the INCREMENTALLY MAINTAINED
    band index — the maintenance path the materialize-once serving
    queries point at: the corpus index is built before the ingest
    batch exists (doc_id >= {BATCH_N}), the batch's band rows are
    APPENDED (one pushed-down batch read -> |batch| x _BANDS rows,
    plan-gated in tests/test_r13_ops.py — no corpus recompute), and
    the probe (itself part of the batch) is served from the upserted
    table with the same bucket-pruned plan as q_dedup_lsh_served.
    Candidates must be IDENTICAL to serving from the full-corpus
    rebuild (pinned) — incremental maintenance is a physical change
    only, so the oracle is _LSH_SERVED_ORACLE unchanged.

    At 100 TB this is the production ingest loop: per-batch index
    maintenance costs the batch's own minhash plus a bucketed append
    (no rebuild, no corpus scan), and the r13 bucket-count curve
    (BASELINE.md) gives the bucket sizing the append inherits."""
    return _serve_probe(spark, sf_dir, _upserted_index(spark, sf_dir))
