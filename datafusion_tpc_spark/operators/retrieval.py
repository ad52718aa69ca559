"""Retrieval-layer operators (r6) — rank fusion, hard-negative
mining, and a distributed power-iteration PCA: the query-time and
training-time halves of an embedding retrieval stack, extending the
similarity family (operators/similarity.py) the way a training-data
pipeline consumes it. North-star extension (SURVEY.md §7/M5) — no
reference counterpart (the reference is a scheduling harness around
DataFusion, src/main.rs; its SQL surface has no vector ops at all).

Shared fixture convention: `documents.doc_id` and `embeddings.vec_id`
are parallel 0..499 ids — doc k's embedding is vec k (the same link
q_mm_* uses for payloads). Query item = id 0.

Scale notes are per-query; the common rule: rankings are computed as
bounded top-K candidate lists (WindowGroupLimit / TakeOrdered shapes),
never corpus-wide sorts, and every cross-engine float comparison goes
through the repo's ROUND conventions (CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import cosine
from datafusion_tpc_spark.registry import query

_RRF_K = 60  # the standard reciprocal-rank-fusion constant
_RRF_TOPC = 100  # candidates kept per ranking before fusion
_RRF_OUT = 10


@query(
    "q_sim_rrf",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
    ),
    dense AS (
      SELECT e.vec_id AS id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cs
      FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    dr AS (
      SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cs DESC, id ASC) AS INT) AS ra
      FROM dense
    ),
    qt AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS t
      FROM documents WHERE doc_id = 0
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id <> 0
    ),
    lex AS (
      SELECT toks.doc_id AS id, CAST(COUNT(DISTINCT tok) AS BIGINT) AS ov
      FROM toks JOIN qt ON toks.tok = qt.t
      GROUP BY toks.doc_id
    ),
    lr AS (
      SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY ov DESC, id ASC) AS INT) AS rb
      FROM lex
    ),
    da AS (SELECT * FROM dr WHERE ra <= {_RRF_TOPC}),
    lb AS (SELECT * FROM lr WHERE rb <= {_RRF_TOPC}),
    fused AS (
      SELECT COALESCE(da.id, lb.id) AS id, da.ra, lb.rb,
             ROUND(COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + da.ra), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + lb.rb), 0),
                   6) AS rrf
      FROM da FULL JOIN lb ON da.id = lb.id
    )
    SELECT id, ra, rb, rrf FROM fused
    ORDER BY rrf DESC NULLS LAST, id ASC NULLS LAST
    LIMIT {_RRF_OUT}
    """,
)
def q_sim_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of two retrievers — the standard way a
    RAG/training-data stack combines a dense (embedding cosine) and a
    lexical (token overlap) ranking without score calibration:
    rrf(d) = Σ_lists 1/(60 + rank_list(d)) over the top-100 candidates
    of each list, absent→0.

    Plan shape: the dense scoring is the q_sim_topk plan (broadcast
    1-row query vector, rounded score); each candidate list is cut to
    top-100 with orderBy+limit — TakeOrderedAndProject, i.e. map-side
    top-K per partition then a K-row merge, never a global sort
    (WindowGroupLimit does NOT fire on partition-less windows, so a
    global rank-then-filter would sort everything in one partition —
    measured and avoided here); row_number then ranks the 100-row
    list, which is identical to the global rank because the list is
    the ordered prefix. Fusion is a FULL OUTER join of two ≤100-row
    lists (full outer can't broadcast in Spark — the sort-merge
    exchange moves ≤200 rows). 100 TB: candidate generation is the
    ANN index (q_sim_ann / q_sim_ivf); fusion cost never grows past
    |lists|·K rows, which is the point of RRF.

    Ranks are computed on ROUNDED scores with id tie-breaks, so the
    candidate sets and ranks are deterministic cross-engine."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qe = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qe"))
    dense = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qe))
        .select(
            F.col("vec_id").alias("id"),
            F.round(cosine(F.col("emb"), F.col("qe")), 6).alias("cs"),
        )
    )
    dr = (
        dense.orderBy(F.col("cs").desc(), F.col("id").asc())
        .limit(_RRF_TOPC)
        .select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.col("cs").desc(), F.col("id").asc()))
            .cast("int")
            .alias("ra"),
        )
    )

    docs = load_table(spark, sf_dir, "documents")
    qt = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
    )
    toks = docs.filter(F.col("doc_id") != 0).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    lex = (
        toks.join(F.broadcast(qt), toks.tok == qt.t)
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").cast("bigint").alias("ov"))
    )
    lb = (
        lex.orderBy(F.col("ov").desc(), F.col("doc_id").asc())
        .limit(_RRF_TOPC)
        .select(
            F.col("doc_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.col("ov").desc(), F.col("doc_id").asc()))
            .cast("int")
            .alias("rb"),
        )
    )

    one = F.lit(1.0)
    fused = (
        dr.join(lb, "id", "full_outer")
        .select(
            "id",
            "ra",
            "rb",
            F.round(
                F.coalesce(one / (_RRF_K + F.col("ra")), F.lit(0.0))
                + F.coalesce(one / (_RRF_K + F.col("rb")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(
        F.col("rrf").desc_nulls_last(), F.col("id").asc_nulls_last()
    ).limit(_RRF_OUT)


_HN_QUERIES = 5  # vec_id 0..4 act as query anchors
_HN_K = 3


@query(
    "q_sim_hardneg",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < {_HN_QUERIES}
    ),
    cand AS (
      SELECT q.qid, e.vec_id AS nid, e.label AS nlabel,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cs
      FROM embeddings e, q
      WHERE e.label <> q.qlabel
    ),
    r AS (
      SELECT qid, nid, nlabel, cs,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cs DESC, nid ASC) AS INT) AS rk
      FROM cand
    )
    SELECT qid, nid, nlabel, cs, rk FROM r WHERE rk <= {_HN_K}
    ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST
    """,
)
def q_sim_hardneg(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each anchor
    (vec_id 0..4), the top-3 most-similar vectors with a DIFFERENT
    label — the "looks right, is wrong" examples that make embedding
    models learn. The anchor set broadcasts (5 rows); the theta join
    e.label <> q.qlabel fans each corpus vector out to ≤5 anchors;
    per-anchor rank compiles to WindowGroupLimit (map-side top-3 per
    anchor before the rank shuffle).

    100 TB: anchors are a training batch (10³-ish) — the broadcast
    stays small; the corpus side is one scan, and per-anchor state is
    K rows. The production twin replaces the exact scan with ANN
    candidates (q_sim_ann) + this exact re-rank — the re-rank stage is
    THIS plan. Rounded scores + nid tie-break keep the top-3 sets
    deterministic cross-engine."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qe"),
    )
    cand = (
        e.join(F.broadcast(q), e.label != q.qlabel)
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            F.round(cosine(F.col("emb"), F.col("qe")), 6).alias("cs"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cs").desc(), F.col("nid").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _HN_K)
        .orderBy(F.col("qid").asc_nulls_last(), F.col("rk").asc_nulls_last())
    )


# ---- distributed power-iteration PCA ---------------------------------

_PCA_DIM = 64
_PCA_V0 = 0.125  # 1/sqrt(64): deterministic unit init, all components


def _pca_iter_sql(x: str, v: str, d: str, w: str, n: str, vout: str) -> str:
    """One unrolled power-iteration round in oracle SQL over the long
    format: d=X·v per row, w=Xᵀd per dimension, v'=w/‖w‖ — with the
    kmeans/IPF re-ROUND-each-iteration discipline (verify SKILL:
    hash-agg sums are order-nondeterministic at ~1e-12 relative, so
    state is re-rounded far above that after every aggregate)."""
    return f"""
    {d} AS (
      SELECT {x}.vec_id, ROUND(SUM({x}.x * {v}.v), 6) AS d
      FROM {x} JOIN {v} USING (pos) GROUP BY {x}.vec_id
    ),
    {w} AS (
      SELECT {x}.pos, ROUND(SUM({x}.x * {d}.d), 4) AS w
      FROM {x} JOIN {d} USING (vec_id) GROUP BY {x}.pos
    ),
    {n} AS (SELECT ROUND(SQRT(SUM(w * w)), 6) AS n FROM {w}),
    {vout} AS (SELECT pos, ROUND(w / (SELECT n FROM {n}), 8) AS v FROM {w})
    """


@query(
    "q_sim_pca",
    oracle=f"""
    WITH x AS (
      SELECT vec_id,
             CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    v0 AS (
      SELECT CAST(unnest(range(1, {_PCA_DIM} + 1)) AS INT) AS pos,
             CAST({_PCA_V0} AS DOUBLE) AS v
    ),
    {_pca_iter_sql('x', 'v0', 'd1', 'w1', 'n1', 'v1')},
    {_pca_iter_sql('x', 'v1', 'd2', 'w2', 'n2', 'v2')}
    SELECT v2.pos, ROUND(v2.v, 6) AS loading,
           (SELECT ROUND(n, 2) FROM n2) AS eigval_est
    FROM v2
    ORDER BY pos ASC NULLS LAST
    """,
)
def q_sim_pca(spark, sf_dir):
    """Distributed PCA top component via TWO unrolled power-iteration
    rounds on the (uncentered) second-moment operator: d = X·v (one
    dot per vector), w = Xᵀd (one weighted column sum per dimension),
    v' = w/‖w‖ — the Krylov building block every distributed PCA /
    truncated-SVD implementation reduces to.

    Plan shape per iteration: the corpus stays in LONG format
    (vec_id, pos, x) — posexplode once, reused by both halves; X·v
    joins a broadcast 64-row v and hash-aggregates per vec_id
    (|corpus| keys, map-side combined); Xᵀd joins the |corpus|-row d
    back (co-partitioned on vec_id) and aggregates per pos (64 keys).
    Nothing is ever collected to the driver; state between iterations
    is one 64-row DataFrame. 100 TB: iterations scale as two
    corpus-key shuffles each — the structure Spark MLlib's RowMatrix
    power methods use; more components = block power iteration with
    v as a 64×k matrix, same plan.

    Cross-engine exactness: every aggregate is a hash-agg SUM whose
    fold order differs between engines (~1e-12 relative), so the
    state is re-ROUNDed after each aggregate (d→6dp, w→4dp absolute
    on O(10²) values, v→8dp) — the kmeans/IPF discipline; rounding
    floors sit ≥4 orders of magnitude above the noise. Output is the
    long-format component (pos, loading) + the Rayleigh-norm estimate
    of the top eigenvalue. (The fixture's embeddings are nearly
    isotropic, so two rounds pin the MECHANISM — monotone Rayleigh
    ascent, λmax bound, unit output, exact oracle — not convergence
    to a particular eigenvector; see
    tests/test_extensions.py::test_pca_power_iteration_invariants.)"""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).cast("int").alias("pos"), "x")

    spark_v = spark.range(1, _PCA_DIM + 1).select(
        F.col("id").cast("int").alias("pos"), F.lit(_PCA_V0).alias("v")
    )
    for _ in range(2):
        d = (
            x.join(F.broadcast(spark_v), "pos")
            .groupBy("vec_id")
            .agg(F.round(F.sum(F.col("x") * F.col("v")), 6).alias("d"))
        )
        w = (
            x.join(d, "vec_id")
            .groupBy("pos")
            .agg(F.round(F.sum(F.col("x") * F.col("d")), 4).alias("w"))
        )
        n = w.agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 6).alias("n"))
        spark_v = w.crossJoin(F.broadcast(n)).select(
            "pos", F.round(F.col("w") / F.col("n"), 8).alias("v")
        )
        last_n = n
    return (
        spark_v.crossJoin(F.broadcast(last_n))
        .select(
            "pos",
            F.round(F.col("v"), 6).alias("loading"),
            F.round(F.col("n"), 2).alias("eigval_est"),
        )
        .orderBy(F.col("pos").asc_nulls_last())
    )


# ---- batched top-k retrieval (round 8) --------------------------------

_BATCH_N = 10  # query batch: vec_ids 0..9
_BATCH_K = 5   # hits kept per query


@query(
    "q_sim_batch",
    oracle=f"""
    WITH qb AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
      WHERE vec_id < {_BATCH_N}
    ),
    scored AS (
      SELECT qb.qid, e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qb.qe), 6)
               AS cos_sim
      FROM embeddings e JOIN qb ON e.vec_id <> qb.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY cos_sim DESC NULLS LAST, vec_id ASC NULLS LAST)
               AS INT) AS rank
      FROM scored QUALIFY rank <= {_BATCH_K}
    )
    SELECT qid, rank, vec_id, cos_sim FROM ranked
    ORDER BY qid ASC NULLS LAST, rank ASC NULLS LAST
    """,
)
def q_sim_batch(spark, sf_dir):
    """Batched brute-force retrieval: cosine top-5 for a 10-query
    batch in ONE plan — the many-queries scale path every single-query
    operator's docstring (q_sim_topk, q_sim_ndcg) promises, made real.
    Serving and eval harnesses never issue one query at a time; this
    is the shape that amortizes the corpus scan across the batch.

    Plan (the q_pipe_domain_cap WindowGroupLimit shape, plan-gated in
    tests/test_plans.py): broadcast the 10-row query batch, score
    corpus × batch in the scan projection, then rank ≤ 5 per qid via
    row_number + filter — Spark's WindowGroupLimit pushes the rank
    bound to a map-side per-partition top-k BEFORE the qid exchange,
    so the shuffle carries ≤ k·|batch| rows per partition, not the
    corpus×batch cross product. At 100 TB with a 10k-query batch the
    same plan holds: one corpus scan, broadcast batch (or a
    block-partitioned batch join past broadcast size), k·|batch|
    shuffle rows per partition. Ordering is the q_sim_topk
    convention (ROUND(6) score, vec_id tie-break) on both engines."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qb = e.filter(F.col("vec_id") < _BATCH_N).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qe")
    )
    scored = (
        e.join(F.broadcast(qb), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("emb"), F.col("qe")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col("vec_id").asc_nulls_last()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BATCH_K)
        .select("qid", "rank", "vec_id", "cos_sim")
        .orderBy(F.col("qid").asc_nulls_last(), F.col("rank").asc_nulls_last())
    )
