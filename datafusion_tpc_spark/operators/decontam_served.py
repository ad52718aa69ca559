"""Span-level decontamination SERVING from a materialized train-split
span-hash index — the third serving path, completing the trilogy with
operators/ivf_served.py (ANN) and operators/lsh_served.py (near-dup
admission). Reference has no serving or write path at all
(src/object_store/file.rs:215-228 is todo!()).

The batch audit (q_dedup_decontam, operators/dedup.py) recomputes the
strided L=32/S=16 windows of the WHOLE corpus on every run to answer
"how contaminated is each test doc". The production question at eval
time is the point form: "is THIS benchmark/eval document leaked into
the train split, and how much?" — asked per incoming doc, long after
the train corpus was indexed. So materialize the train side ONCE —
the DISTINCT h60 of every train-split window, one 8-byte hash per
row, written `bucketBy(N, h)` — and serve each probe as: window THIS
doc in-engine (one pushed-down point read), collect its bounded
per-hash counts, and read only the index buckets those hashes land in
(`SelectedBucketsCount` pruned — plan-gated). Zero corpus windowing
lineage in the serving plan.

At 100 TB: the index is ≤ |train chars|/S distinct 8-byte hashes —
payload text never enters it — and each probe costs one local window
pass + a pruned bucket read bounded by the PROBE's window count, not
the corpus size. This is how eval-set decontamination actually runs
as admission control (the GPT-3/PaLM n-gram overlap check, served),
and composes with q_dedup_lsh_served (near-dup tier) and
q_dedup_incr (exact tier) into the full ingest gate.
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
from datafusion_tpc_spark.functions.digest import (
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
    _h60_duck,
    h60,
    split_bucket,
    split_bucket_duck,
)
from datafusion_tpc_spark.functions.literals import values_df
from datafusion_tpc_spark.registry import query

# Same strided windowing / split convention as q_dedup_decontam
# (operators/dedup.py) — the served answer must match the batch
# audit's row for the probe doc exactly; pinned in
# tests/test_r13_ops.py.
from datafusion_tpc_spark.operators.dedup import (  # noqa: E402
    _SUB_L,
    _SUB_S,
    _WIN_EXPR,
    _WINS_DUCK,
)

PROBE_DOC = 0  # test-split (bucket 98) at sf0.001/0.01/0.1, with
               # 7/8/≥1 windows — short enough that its distinct-hash
               # IN-list prunes buckets even on the tiny fixture
BATCH_LT = 40  # batched probe set: test-split docs with doc_id <
               # BATCH_LT — [0, 9, 17] at every shipped sf
_SRV_BUCKETS = 16
_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    ".cache",
    "decontam_served",
)
_DCS_LOCK = threading.Lock()


def _index_fingerprint(sf_dir: str) -> str:
    """Source+recipe fingerprint for the train-span index. Exposed as
    a helper (ADVICE r13) so tests targeting the catalog table derive
    its name from HERE instead of re-deriving the recipe inline — a
    recipe change must not silently retarget them at a stale name."""
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return hashlib.md5(
        f"{st.st_mtime_ns}:{st.st_size}:{_SUB_L}:{_SUB_S}:"
        f"{SPLIT_TRAIN_LT}:{_SRV_BUCKETS}".encode()
    ).hexdigest()[:12]


def _index_table_name(sf_dir: str) -> str:
    return f"train_spans_{sanitized_sf_tag(sf_dir)}_{_index_fingerprint(sf_dir)}"


def _train_span_index(spark, sf_dir: str) -> str:
    """Ensure the bucketed train-span-hash table exists for this
    source fingerprint; return its catalog name. Same once-per-
    (session, sf, fingerprint) build/race/staleness story as
    operators/lsh_served.py (lock around exists-check+build, per-PID
    dir, per-prefix prune)."""
    fp = _index_fingerprint(sf_dir)
    tag = sanitized_sf_tag(sf_dir)
    name = f"train_spans_{tag}_{fp}"
    with _DCS_LOCK:
        if not spark.catalog.tableExists(name):
            dir_key = f"{tag}_dcs-{fp}-{os.getpid()}"
            path = os.path.join(_CACHE_ROOT, dir_key, "spans")
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            train_h = (
                docs.filter(split_bucket() < SPLIT_TRAIN_LT)
                .select(F.explode(F.expr(_WIN_EXPR)).alias("s"))
                .select(h60(F.col("s")).alias("h"))
                .distinct()
            )
            (
                train_h.write.mode("overwrite")
                .option("path", path)
                .bucketBy(_SRV_BUCKETS, "h")
                .sortBy("h")
                .saveAsTable(name)
            )
            prune_stale_cache_dirs(_CACHE_ROOT, dir_key)
    return name


def _probe_hash_counts(spark, sf_dir, pred):
    """Collect the bounded (doc_id, h, cnt) window-hash counts of the
    probe docs selected by ``pred`` — one pushed-down read of
    documents, window+hash in the scan projection, ≤ |probe chars|/S
    rows collected (the ivf_served/lsh_served bounded-probe-list
    precedent). Only TEST-split docs qualify (the batch audit's
    bucket >= SPLIT_VAL_LT convention)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(pred)
        .filter(split_bucket() >= SPLIT_VAL_LT)
        .select("doc_id", F.explode(F.expr(_WIN_EXPR)).alias("s"))
        .select("doc_id", h60(F.col("s")).alias("h"))
        .groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )


def _served(spark, sf_dir, pred, index_name: str | None = None):
    """Shared serving plan: probe hash counts (bounded collect) →
    one bucket-pruned index read filtered to the probes' distinct
    hashes → broadcast probe-count join → per-doc contamination
    rollup. Probe docs with zero contaminated windows still get a
    row (n_contam 0) via the literal base frame — the index join
    only ever ADDS counts. ``index_name`` parameterizes WHICH
    train-span table serves (default: the materialize-once index;
    q_dedup_decontam_upsert passes the incrementally maintained one
    — the two differ in maintenance, never in the read)."""
    rows = _probe_hash_counts(spark, sf_dir, pred)
    n_win = {}
    for r in rows:
        n_win[r["doc_id"]] = n_win.get(r["doc_id"], 0) + r["cnt"]
    if not rows:
        # no windowed probe docs: empty result with the full schema
        return values_df(
            spark,
            [(-1, 0, 0, 0.0)],
            "doc_id long, n_windows long, n_contam long,"
            " contam_frac double",
        ).filter(F.col("doc_id") >= 0)
    hs = sorted({r["h"] for r in rows})
    # VALUES literals, not createDataFrame: the RDD-backed literal
    # frames were 3x the serving read (functions/literals.py, r13)
    base = values_df(
        spark, sorted(n_win.items()), "doc_id long, n_windows long"
    )
    probe_df = values_df(
        spark,
        [(r["doc_id"], r["h"], r["cnt"]) for r in rows],
        "doc_id long, h long, cnt long",
    )
    idx = spark.table(index_name or _train_span_index(spark, sf_dir))
    contam = (
        idx.filter(F.col("h").isin(hs))  # bucket-pruning literal
        .join(F.broadcast(probe_df), "h")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("nc"))
    )
    return (
        base.join(contam, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_windows").cast("bigint").alias("n_windows"),
            F.coalesce(F.col("nc"), F.lit(0)).cast("bigint").alias(
                "n_contam"
            ),
            F.round(
                F.coalesce(F.col("nc"), F.lit(0))
                * 1.0
                / F.col("n_windows"),
                6,
            ).alias("contam_frac"),
        )
        .orderBy(F.col("doc_id").asc_nulls_last())
    )


_DCS_WINS = f"""
    w0 AS ({_WINS_DUCK}),
    wins AS (
      SELECT doc_id, {_h60_duck("s")} AS h,
             {split_bucket_duck()} AS bucket
      FROM w0
    ),
    train_h AS (SELECT DISTINCT h FROM wins
                WHERE bucket < {SPLIT_TRAIN_LT})"""


_DCS_SERVED_ORACLE = f"""
    WITH {_DCS_WINS},
    test_w AS (SELECT doc_id, h FROM wins
               WHERE doc_id = {PROBE_DOC} AND bucket >= {SPLIT_VAL_LT})
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(t.h) AS BIGINT) AS n_contam,
           ROUND(COUNT(t.h) * 1.0 / COUNT(*), 6) AS contam_frac
    FROM test_w w LEFT JOIN train_h t USING (h)
    GROUP BY w.doc_id
    ORDER BY doc_id ASC NULLS LAST
"""


@query("q_dedup_decontam_served", oracle=_DCS_SERVED_ORACLE)
def q_dedup_decontam_served(spark, sf_dir):
    """Contamination of ONE eval document served from the
    MATERIALIZED train-span index: window the probe doc in-engine
    from a pushed-down point read of documents, collect its bounded
    per-hash counts (≤ |probe chars|/{_SUB_S} rows), and read the
    bucketed DISTINCT-train-hash table pruned to the buckets those
    hashes land in (`SelectedBucketsCount` ≤ |probe hashes| of
    {_SRV_BUCKETS} — plan-gated). The serving plan scans ONLY the
    index with zero corpus windowing lineage; the answer is
    row-identical to q_dedup_decontam's row for the probe doc
    (pinned in tests/test_r13_ops.py). Oracle recomputes the train
    index in SQL (the materialization is a physical change only)."""
    return _served(spark, sf_dir, F.col("doc_id") == PROBE_DOC)


_DCS_BATCH_ORACLE = f"""
    WITH {_DCS_WINS},
    test_w AS (SELECT doc_id, h FROM wins
               WHERE doc_id < {BATCH_LT} AND bucket >= {SPLIT_VAL_LT})
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(t.h) AS BIGINT) AS n_contam,
           ROUND(COUNT(t.h) * 1.0 / COUNT(*), 6) AS contam_frac
    FROM test_w w LEFT JOIN train_h t USING (h)
    GROUP BY w.doc_id
    ORDER BY doc_id ASC NULLS LAST
"""


@query("q_dedup_decontam_served_batch", oracle=_DCS_BATCH_ORACLE)
def q_dedup_decontam_served_batch(spark, sf_dir):
    """Batched eval-set decontamination from the materialized
    train-span index: ONE bucket-pruned index read serves every
    test-split doc in the incoming batch (doc_id < {BATCH_LT} —
    [0, 9, 17] on the shipped fixtures), the composition the
    single-probe path points at. The batch's window hashes come from
    one pushed-down read (collected: bounded at |batch chars| /
    {_SUB_S} rows); the scan prunes to the UNION of their buckets —
    on the tiny fixture the ~30-hash union can cover all
    {_SRV_BUCKETS} buckets (the same honest degeneration as the
    ivf/lsh batch legs; production bucket counts are sized to
    O(cluster cores), see tools/bench_served_pruning.py) — and the
    broadcast (doc_id, h, cnt) probe table fans matches back per
    doc. Per-doc rows are identical to the single-probe path and to
    q_dedup_decontam's batch-audit rows (pinned in
    tests/test_r13_ops.py)."""
    return _served(spark, sf_dir, F.col("doc_id") < BATCH_LT)


DCS_INGEST_LT = 50  # incremental train batch: train-split docs with
                    # doc_id < DCS_INGEST_LT (~45 docs × ~18 windows
                    # at every shipped sf — the batch is fixed-size
                    # by definition, independent of corpus size)


def _ingest_hashes(spark, sf_dir):
    """The incremental maintenance WRITE's source: DISTINCT window
    hashes of the ingest batch's train-split docs only, from ONE
    pushed-down doc_id < DCS_INGEST_LT read — bounded at
    |batch chars|/{S} rows, never a corpus recompute. Split out so
    tests/test_r14_ops.py can gate the pushed filter on the write
    plan itself."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < DCS_INGEST_LT)  # pushed-down batch read
        .filter(split_bucket() < SPLIT_TRAIN_LT)
        .select(F.explode(F.expr(_WIN_EXPR)).alias("s"))
        .select(h60(F.col("s")).alias("h"))
        .distinct()
    )


# Beyond this many batch hashes the merge switches from the IN-list
# literal plan to the distributed SortMergeJoin form below. The trade,
# MEASURED by tools/bench_merge_crossover.py (BASELINE.md r15): the
# IN-list path costs ~0.9 ms per hash of driver/plan work (collect +
# VALUES parse + isin), linear all the way to 89 s at 10⁵, while its
# only advantage is the bucket-PRUNED existing-hash read vs the SMJ's
# one full index scan. On the shipped fixture the index scan is ~free,
# so SMJ wins at EVERY size; at a production-scale index the pruned
# read is the win, and 10⁴ (≈9 s of plan cost) is the point where the
# avoided index scan must be worth seconds to justify the literals.
_DCS_INLIST_MAX = 10_000


def _merge_ingest_batch(
    spark, name: str, path: str, batch, inlist_max: int = _DCS_INLIST_MAX
) -> None:
    """Dedupe-on-ingest merge of a distinct-hash ingest batch into the
    bucketed span index ``name`` — two physical forms, one result:

    - ≤ ``inlist_max`` hashes: bounded collect (|batch chars|/S, same
      bound as the serving probe collect), bucket-pruned existing-hash
      point read (SelectedBucketsCount-gated like the serving plan),
      LEFT ANTI against the literals, bucketed append.
    - > ``inlist_max``: the at-scale form (VERDICT r14 item 5, was
      prose-only) — the batch never touches the driver; LEFT ANTI as
      a SortMergeJoin against the index, whose bucketBy/sortBy('h')
      layout makes its side of the join shuffle-AND-sort-free (one
      index scan per batch, only the batch side shuffles).

    Both append only hashes absent from the index, preserving the
    DISTINCT-h invariant the serving rollup's SUM depends on. The
    branch probe is a single limit(inlist_max+1) collect — bounded by
    construction, and its rows ARE the IN-list on the small branch,
    so that path runs exactly one batch action and the probe/merge
    rows cannot diverge even under a nondeterministic source. The
    persist is SMJ-branch-conditional (VERDICT r16 item 1): the r15
    unconditional persist-before-probe eagerly wrote the windowed
    batch through the memory store on the common small-batch branch
    too, where `batch` is never touched again after the probe — pure
    overhead that the driver's r16 channel measured as a regression.
    Now the common path pays only its bounded collect, and the
    at-scale branch caches the batch before its one anti-join write
    so the SMJ never re-runs the ingest windowing lineage."""
    probe_rows = batch.limit(inlist_max + 1).collect()
    if len(probe_rows) <= inlist_max:
        hs = sorted(int(r["h"]) for r in probe_rows)
        if not hs:  # an empty ingest batch (degenerate corpus with
            # no low-id train docs) has nothing to merge — and
            # values_df has no empty form
            return
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
        return
    batch = batch.persist()
    try:
        # hint('merge') pins the SMJ so the planner cannot broadcast
        # the (by-definition large here) batch side
        new_rows = batch.hint("merge").join(
            spark.table(name).select("h"), "h", "left_anti"
        )
        (
            new_rows.write.mode("append")
            .option("path", path)
            .bucketBy(_SRV_BUCKETS, "h")
            .sortBy("h")
            .saveAsTable(name)
        )
    finally:
        batch.unpersist()


def _upserted_span_index(spark, sf_dir: str) -> str:
    """The INCREMENTALLY MAINTAINED train-span index: base table
    built from the pre-existing train corpus (doc_id >=
    DCS_INGEST_LT) once, then the ingest batch's NEW hashes APPENDED
    — bucketed saveAsTable append writes per-bucket files alongside
    the base generation and SelectedBucketsCount pruning spans both
    (the lsh_upsert precedent on the band index).

    The index's semantics are DISTINCT h, so a blind append would
    double-count any batch hash already present (the serving rollup
    SUMs matched probe counts). The merge is therefore
    dedupe-on-ingest — see _merge_ingest_batch for the two physical
    forms (IN-list point read vs at-scale SortMergeJoin) and the
    bound on each. Maintenance cost is the batch's own windowing +
    one pruned point read + a |new hashes|-row append — independent
    of corpus size."""
    fp = hashlib.md5(
        f"up:{_index_fingerprint(sf_dir)}:{DCS_INGEST_LT}".encode()
    ).hexdigest()[:12]
    tag = sanitized_sf_tag(sf_dir)
    name = f"train_spans_up_{tag}_{fp}"
    with _DCS_LOCK:
        if not spark.catalog.tableExists(name):
            dir_key = f"{tag}_dcsup-{fp}-{os.getpid()}"
            path = os.path.join(_CACHE_ROOT, dir_key, "spans")
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            base_h = (
                docs.filter(F.col("doc_id") >= DCS_INGEST_LT)
                .filter(split_bucket() < SPLIT_TRAIN_LT)
                .select(F.explode(F.expr(_WIN_EXPR)).alias("s"))
                .select(h60(F.col("s")).alias("h"))
                .distinct()
            )
            (
                base_h.write.mode("overwrite")
                .option("path", path)
                .bucketBy(_SRV_BUCKETS, "h")
                .sortBy("h")
                .saveAsTable(name)
            )
            try:
                _merge_ingest_batch(
                    spark, name, path, _ingest_hashes(spark, sf_dir)
                )
            except BaseException:
                # Two-step publish guard (ADVICE r14): the base
                # saveAsTable above has already registered the table,
                # so a failed merge must not leave the UNMERGED index
                # servable — every later tableExists() call in the
                # session would silently undercount contamination.
                # Best-effort DROP (ADVICE r15): if the session/JVM is
                # the thing that failed, the cleanup itself raises —
                # the ORIGINAL exception must still propagate.
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                except BaseException:
                    pass
                raise
            prune_stale_cache_dirs(_CACHE_ROOT, dir_key)
    return name


@query("q_dedup_decontam_upsert", oracle=_DCS_SERVED_ORACLE)
def q_dedup_decontam_upsert(spark, sf_dir):
    """Eval-doc contamination served from the INCREMENTALLY
    MAINTAINED train-span index — the maintenance leg of the
    q_dedup_decontam_served production story (VERDICT r13 item 4,
    symmetrizing the serving trilogy): the bucketed hash index is
    built before the ingest batch exists (train docs with doc_id >=
    DCS_INGEST_LT), the batch's distinct window hashes are MERGED in
    (one pushed-down batch read, dedupe-on-ingest via a bucket-pruned
    anti-join — no corpus rescan, plan-gated in
    tests/test_r14_ops.py), and the probe is served from the upserted
    table with the same bucket-pruned plan as
    q_dedup_decontam_served. The answer must be IDENTICAL to serving
    from the full-corpus rebuild (pinned; the final table carries no
    duplicate h by construction) — incremental maintenance is a
    physical change only, so the oracle is _DCS_SERVED_ORACLE
    unchanged.

    At 100 TB this is the train-ingest loop of eval-integrity
    admission control: each accepted train batch maintains the index
    at the cost of its own windowing plus a point read, and the
    serving tier never sees a rebuild."""
    return _served(
        spark,
        sf_dir,
        F.col("doc_id") == PROBE_DOC,
        index_name=_upserted_span_index(spark, sf_dir),
    )
