"""Ranking-quality evaluation (round 7) — nDCG@k / precision@k / MRR
over the cosine retrieval ranking, using the embeddings table's REAL
class labels as the relevance signal (relevant = shares the query
vector's label): the eval harness every retrieval/RAG stack runs
after building an index, and the missing third leg of the retrieval
family — generation (q_sim_topk/q_sim_ann), fusion & re-ranking
(q_sim_rrf/q_sim_mmr), training-pair mining (q_sim_hardneg), and now
measurement.

Beyond-reference surface (the reference engine — thinkharderdev/
datafusion-tpc — has no retrieval layer; its write path and query set
are benches/query.rs:24-26 only).

Determinism: the ranking is the q_sim_topk convention — cosine
ROUNDed to 6dp BEFORE ordering, vec_id ascending tie-break — so both
engines pick identical top-k sets in identical order. log2 is
transcendental, so each rank's DCG contribution is ROUNDed to 6dp
individually; the cumulative columns are running-frame window SUMs
over those identical inputs, which fold sequentially on both engines
(CUSUM pattern) and therefore stay bit-identical.

100 TB: candidate generation is the only stage that touches the
corpus (broadcast 1-row query vector + per-partition TakeOrdered
heaps — the q_sim_topk plan, no shuffle of the embedding table); the
metric computation itself runs on the k retrieved rows. Batch-eval
over thousands of queries replaces the broadcast with a block
cross-join of the query batch, keeping per-partition top-k state
k·|queries| — the classic eval-harness sharding.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.literals import values_df
from datafusion_tpc_spark.functions.digest import cosine
from datafusion_tpc_spark.registry import query

_QID = 0  # query vector (q_sim_topk convention)
_K = 10   # evaluated ranking depth


@query(
    "q_sim_ndcg",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe, label AS qlabel
               FROM embeddings WHERE vec_id = {_QID}),
    scored AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6)
               AS sim,
             CAST(e.label = q.qlabel AS INT) AS rel
      FROM embeddings e, q WHERE e.vec_id <> {_QID}
    ),
    top AS (
      SELECT * FROM scored
      ORDER BY sim DESC NULLS LAST, vec_id ASC
      LIMIT {_K}
    ),
    ranked AS (
      SELECT vec_id, sim, rel,
             ROW_NUMBER() OVER (ORDER BY sim DESC NULLS LAST, vec_id ASC)
               AS rank,
             SUM(rel) OVER () AS nrel
      FROM top
    ),
    contrib AS (
      SELECT rank, vec_id, sim, rel,
             ROUND(rel / log2(rank + 1.0), 6) AS dcg_c,
             ROUND(CASE WHEN rank <= nrel THEN 1.0 / log2(rank + 1.0)
                        ELSE 0 END, 6) AS idcg_c
      FROM ranked
    )
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, sim, rel,
           ROUND(SUM(dcg_c) OVER cum, 6) AS dcg_at,
           ROUND(CASE WHEN SUM(idcg_c) OVER cum = 0 THEN 0
                      ELSE SUM(dcg_c) OVER cum / SUM(idcg_c) OVER cum
                 END, 6) AS ndcg_at,
           ROUND(SUM(rel) OVER cum * 1.0 / rank, 6) AS prec_at,
           ROUND(MAX(rel * 1.0 / rank) OVER cum, 6) AS rr_at
    FROM contrib
    WINDOW cum AS (ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY rank ASC NULLS LAST
    """,
)
def q_sim_ndcg(spark, sf_dir):
    """Per-rank retrieval-quality table for the cosine top-10 of query
    vector 0: rank, vec_id, rounded sim, binary relevance (same class
    label as the query), cumulative DCG, nDCG@rank (ideal = the
    retrieved relevance multiset re-sorted — all hits first),
    precision@rank, and the running reciprocal-rank (1/first-hit-rank,
    i.e. MRR for this query once the prefix contains a hit; 0 before).

    idcg is derived from the window total of rel: with binary gains
    the ideal ordering puts all nrel hits at ranks 1..nrel, so the
    ideal contribution at rank r is 1/log2(r+1) iff r ≤ nrel — no
    second sort needed. See module docstring for rounding discipline
    and the batch-eval scale path."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )
    qv = e.filter(F.col("vec_id") == _QID).select(
        F.col("emb").alias("qe"), F.col("label").alias("qlabel")
    )
    scored = (
        e.filter(F.col("vec_id") != _QID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine(F.col("emb"), F.col("qe")), 6).alias("sim"),
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    top = scored.orderBy(
        F.col("sim").desc_nulls_last(), F.col("vec_id").asc()
    ).limit(_K)
    w_rank = Window.orderBy(F.col("sim").desc_nulls_last(), F.col("vec_id").asc())
    ranked = top.select(
        "vec_id",
        "sim",
        "rel",
        F.row_number().over(w_rank).alias("rank"),
    ).withColumn("nrel", F.sum("rel").over(Window.partitionBy()))
    contrib = ranked.select(
        "rank",
        "vec_id",
        "sim",
        "rel",
        F.round(F.col("rel") / F.log2(F.col("rank") + 1.0), 6).alias("dcg_c"),
        F.round(
            F.when(
                F.col("rank") <= F.col("nrel"),
                F.lit(1.0) / F.log2(F.col("rank") + 1.0),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("idcg_c"),
    )
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return contrib.select(
        F.col("rank").cast("bigint").alias("rank"),
        "vec_id",
        "sim",
        "rel",
        F.round(F.sum("dcg_c").over(cum), 6).alias("dcg_at"),
        F.round(
            F.when(F.sum("idcg_c").over(cum) == 0, F.lit(0.0)).otherwise(
                F.sum("dcg_c").over(cum) / F.sum("idcg_c").over(cum)
            ),
            6,
        ).alias("ndcg_at"),
        F.round(F.sum("rel").over(cum) * 1.0 / F.col("rank"), 6).alias("prec_at"),
        F.round(F.max(F.col("rel") * 1.0 / F.col("rank")).over(cum), 6).alias(
            "rr_at"
        ),
    ).orderBy(F.col("rank").asc_nulls_last())


# ---- ANN recall eval (round 8) ---------------------------------------

_ANN_PLANES = 4  # must equal similarity._N_PLANES (asserted at call)
_K_ANN = 10  # recall depth


def _batch_exact_duck(rel: str, emb: str) -> str:
    """`qx` + `exact` CTEs: the brute-force cosine top-10 per batch
    qid — the SQL twin of _batch_exact_topk, shared by all three
    batched-eval oracles so a tie-break or rounding change cannot be
    fixed in one copy and missed in another (review r10). `rel` must
    expose (vec_id, {emb})."""
    return f"""
    qx AS (SELECT vec_id AS qid, {emb} AS qemb FROM {rel}
           WHERE vec_id < {_BATCH_N}),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT qx.qid, r.vec_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY qx.qid
                 ORDER BY ROUND(list_cosine_similarity(r.{emb}, qx.qemb), 6)
                            DESC NULLS LAST,
                          r.vec_id ASC NULLS LAST) AS INT) AS rank
        FROM {rel} r JOIN qx ON r.vec_id <> qx.qid)
      WHERE rank <= {_K_ANN}
    )"""


def _probe_flips_duck() -> str:
    # moved to the registration-free functions/signlsh.py in late r10
    # (shared with q_sim_ann's oracle in operators/similarity.py)
    from datafusion_tpc_spark.functions.signlsh import (
        N_PLANES,
        probe_flips_duck,
    )

    assert N_PLANES == _ANN_PLANES
    return probe_flips_duck()


def _bucket_duck() -> str:
    # moved to the registration-free functions/signlsh.py in late r10
    # (shared with q_sim_ann's oracle in operators/similarity.py);
    # see that module for the bit-identical-fold argument.
    from datafusion_tpc_spark.functions.signlsh import N_PLANES, bucket_duck

    assert N_PLANES == _ANN_PLANES
    return bucket_duck()


@query(
    "q_sim_anneval",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, {_bucket_duck()} AS bucket FROM embeddings
    ),
    qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = {_QID}),
    probes AS (
      SELECT DISTINCT pb FROM (
        SELECT unnest({_probe_flips_duck()}) AS pb
        FROM qb)
    ),
    cand AS (
      SELECT b.vec_id FROM b JOIN probes ON b.bucket = probes.pb
      WHERE b.vec_id <> {_QID}
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
          WHERE vec_id = {_QID}),
    exact AS (
      SELECT e.vec_id FROM embeddings e, q WHERE e.vec_id <> {_QID}
      ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6)
                 DESC NULLS LAST,
               e.vec_id ASC NULLS LAST
      LIMIT {_K_ANN}
    ),
    m AS (SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
      (SELECT CAST(COUNT(*) AS BIGINT)
       FROM exact e JOIN cand c ON e.vec_id = c.vec_id) AS tp,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
       WHERE vec_id <> {_QID}) AS n_corpus)
    SELECT n_exact, n_cand, tp,
           ROUND(tp * 1.0 / n_exact, 6) AS recall_at_k,
           ROUND(n_cand * 1.0 / n_corpus, 6) AS cand_frac
    FROM m
    """,
)
def q_sim_anneval(spark, sf_dir):
    """Measured recall for the sign-LSH ANN probe (VERDICT r7 item 6
    — the q_dedup_eval pattern applied to the last approximate family
    without a measurement leg): exact side = the brute-force cosine
    top-10 (q_sim_topk convention: ROUND-6 score, vec_id tie-break),
    candidate side = q_sim_ann's bucket probe (query bucket + all
    1-bit flips) BEFORE ranking/limit. One row: recall@10 of the
    candidate set plus its size and corpus fraction — the
    recall-vs-cost tradeoff number that justifies (or re-tunes)
    n_planes before indexing a corpus.

    EXACT-oracled, unlike q_sim_ann itself (†): both sides are
    deterministic — the oracle recomputes the sign buckets with the
    identical md5-derived weights and an identical-op-order
    sequential fold (see _bucket_duck), so bucket ids match
    bit-for-bit. Counts materialize eagerly under try/finally (the
    q_dedup_eval discipline — no cached blocks outlive the call).

    The candidate side IS q_sim_ann's input: _ann_candidates is the
    exact DataFrame the production search ranks (the _ivf_candidates
    sharing pattern), so a future probe-policy change cannot leave
    this eval silently measuring a different candidate set.

    100 TB: bucket assignment is one narrow scan (literal weight
    arrays, no shuffle); the candidate filter is a 5-row broadcast
    bucket join; the exact side is a TakeOrdered top-10. The eval is
    corpus-linear and runs wherever the index build runs."""
    from datafusion_tpc_spark.operators.similarity import (  # lazy:
        _N_PLANES,  # keeps similarity's registrations out of this
        _QUERY_VEC_ID,  # module's load_all position
        _ann_candidates,
        q_sim_topk,
    )

    assert _N_PLANES == _ANN_PLANES and _QUERY_VEC_ID == _QID
    cand = _ann_candidates(spark, sf_dir).select("vec_id").cache()
    try:
        # bounded driver scalars: the exact side is 10 vec_ids (the
        # MMR-pool precedent), so tp is a 10-element IN filter over
        # the cached candidate set — no second brute-force pass.
        exact_ids = [
            r["vec_id"]
            for r in q_sim_topk(spark, sf_dir)
            # ADVICE r8: a re-limit on top of q_sim_topk's internal
            # orderBy+limit(20) preserves sorted order only as
            # current-Spark behavior, not an API contract — re-apply
            # the ordering so the top-10 selection is explicit.
            .orderBy(
                F.col("cos_sim").desc_nulls_last(),
                F.col("vec_id").asc_nulls_last(),
            )
            .limit(_K_ANN)
            .select("vec_id")
            .collect()
        ]
        n_exact = len(exact_ids)
        n_cand = cand.count()
        tp = cand.filter(F.col("vec_id").isin(exact_ids)).count()
    finally:
        cand.unpersist()
    e = load_table(spark, sf_dir, "embeddings")
    n_corpus = e.filter(F.col("vec_id") != _QID).count()
    m = values_df(
        spark,
        [(n_exact, n_cand, tp, n_corpus)],
        "n_exact bigint, n_cand bigint, tp bigint, n_corpus bigint",
    )
    return m.select(
        "n_exact",
        "n_cand",
        "tp",
        F.round(F.col("tp") * 1.0 / F.col("n_exact"), 6).alias("recall_at_k"),
        F.round(F.col("n_cand") * 1.0 / F.col("n_corpus"), 6).alias("cand_frac"),
    )


def _ivfeval_oracle() -> str:
    from datafusion_tpc_spark.functions.ivf import ivf_duck_cte

    return f"""
    WITH {ivf_duck_cte()},
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
          WHERE vec_id = {_QID}),
    exact AS (
      SELECT e.vec_id FROM embeddings e, q WHERE e.vec_id <> {_QID}
      ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6)
                 DESC NULLS LAST,
               e.vec_id ASC NULLS LAST
      LIMIT {_K_ANN}
    ),
    m AS (SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
      (SELECT CAST(COUNT(*) AS BIGINT)
       FROM exact e JOIN cand c ON e.vec_id = c.vec_id) AS tp,
      (SELECT CAST(COUNT(DISTINCT cell) AS BIGINT) FROM cand) AS n_cells,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
       WHERE vec_id <> {_QID}) AS n_corpus)
    SELECT n_exact, n_cand, tp, n_cells,
           ROUND(tp * 1.0 / n_exact, 6) AS recall_at_k,
           ROUND(n_cand * 1.0 / n_corpus, 6) AS cand_frac
    FROM m
    """


@query("q_sim_ivfeval", oracle=_ivfeval_oracle())
def q_sim_ivfeval(spark, sf_dir):
    """Measured recall for the IVF probe (r8 — completes the
    measurement leg for the LAST approximate family: LSH banding has
    q_dedup_eval, sign-LSH ANN has q_sim_anneval, IVF gets this):
    exact side = brute-force cosine top-10 (q_sim_topk convention),
    candidate side = the nprobe=2 cell stream from _ivf_candidates —
    the same DataFrame q_sim_ivf ranks, so the number measures the
    production probe, not a reimplementation. One row: recall@10,
    candidate-set size, corpus fraction, cells probed.

    EXACT-oracled since r10 (VERDICT r9 item 3 — graduated † → EXACT
    the way q_sim_anneval did in r8): the coarse quantizer is now the
    distributed h60-seeded Lloyd choreography of functions/ivf.py,
    and the oracle retrains it in SQL (ivf_duck_cte), so candidate
    membership, cell count, and both ratios must match bit-for-bit.

    100 TB: candidate generation is the broadcast-argmin scan of
    q_sim_ivf (no shuffle of the embedding table); the eval adds two
    count aggregates and a 10-element IN filter."""
    from datafusion_tpc_spark.operators.similarity import (  # lazy —
        _QUERY_VEC_ID,  # keeps similarity's registrations out of this
        _ivf_candidates,  # module's load_all position
        q_sim_topk,
    )

    assert _QUERY_VEC_ID == _QID
    cand = _ivf_candidates(spark, sf_dir).cache()
    try:
        exact_ids = [
            r["vec_id"]
            for r in q_sim_topk(spark, sf_dir)
            # ADVICE r8: a re-limit on top of q_sim_topk's internal
            # orderBy+limit(20) preserves sorted order only as
            # current-Spark behavior, not an API contract — re-apply
            # the ordering so the top-10 selection is explicit.
            .orderBy(
                F.col("cos_sim").desc_nulls_last(),
                F.col("vec_id").asc_nulls_last(),
            )
            .limit(_K_ANN)
            .select("vec_id")
            .collect()
        ]
        n_exact = len(exact_ids)
        n_cand = cand.count()
        tp = cand.filter(F.col("vec_id").isin(exact_ids)).count()
        n_cells = cand.select("cell").distinct().count()
    finally:
        cand.unpersist()
    e = load_table(spark, sf_dir, "embeddings")
    n_corpus = e.filter(F.col("vec_id") != _QID).count()
    m = values_df(
        spark,
        [(n_exact, n_cand, tp, n_cells, n_corpus)],
        "n_exact bigint, n_cand bigint, tp bigint, n_cells bigint, n_corpus bigint",
    )
    return m.select(
        "n_exact",
        "n_cand",
        "tp",
        "n_cells",
        F.round(F.col("tp") * 1.0 / F.col("n_exact"), 6).alias("recall_at_k"),
        F.round(F.col("n_cand") * 1.0 / F.col("n_corpus"), 6).alias("cand_frac"),
    )


# ---- batched eval legs (round 10, VERDICT r9 item 4) -------------------

_BATCH_N = 10  # qids 0..9 (the q_sim_batch convention, retrieval.py)


@query(
    "q_sim_ndcg_batch",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    qb AS (
      SELECT vec_id AS qid, label AS qlabel, emb AS qe FROM e
      WHERE vec_id < {_BATCH_N}
    ),
    scored AS (
      SELECT qb.qid, e.vec_id,
             ROUND(list_cosine_similarity(e.emb, qb.qe), 6) AS sim,
             CAST(e.label = qb.qlabel AS INT) AS rel
      FROM e JOIN qb ON e.vec_id <> qb.qid
    ),
    top AS (
      SELECT qid, vec_id, sim, rel,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY sim DESC NULLS LAST, vec_id ASC NULLS LAST)
               AS INT) AS rank
      FROM scored QUALIFY rank <= {_K}
    ),
    ranked AS (
      SELECT qid, rel, rank, SUM(rel) OVER (PARTITION BY qid) AS nrel
      FROM top
    ),
    contrib AS (
      SELECT qid, rel, rank,
             CAST(ROUND(ROUND(rel / log2(rank + 1.0), 6) * 1e6, 0)
                  AS BIGINT) AS c_u,
             CAST(CASE WHEN rank <= nrel
                       THEN ROUND(ROUND(1.0 / log2(rank + 1.0), 6) * 1e6, 0)
                       ELSE 0 END AS BIGINT) AS i_u
      FROM ranked
    ),
    perq AS (
      SELECT CAST(qid AS INT) AS qid,
             CAST(SUM(rel) AS BIGINT) AS n_rel,
             CAST(SUM(c_u) AS BIGINT) AS dcg_u,
             CAST(SUM(i_u) AS BIGINT) AS idcg_u,
             ROUND(SUM(rel) * 1.0 / {_K}, 6) AS prec10,
             ROUND(MAX(rel * 1.0 / rank), 6) AS rr10
      FROM contrib GROUP BY qid
    ),
    perq2 AS (
      SELECT qid, n_rel,
             ROUND(CASE WHEN idcg_u = 0 THEN 0
                        ELSE dcg_u * 1.0 / idcg_u END, 6) AS ndcg10,
             prec10, rr10
      FROM perq
    )
    SELECT qid, n_rel, ndcg10, prec10, rr10 FROM perq2
    UNION ALL
    SELECT CAST(-1 AS INT) AS qid,
           CAST(SUM(n_rel) AS BIGINT) AS n_rel,
           ROUND(CAST(SUM(CAST(ROUND(ndcg10 * 1e6, 0) AS BIGINT)) AS DOUBLE)
                 / {_BATCH_N}e6, 6) AS ndcg10,
           ROUND(CAST(SUM(CAST(ROUND(prec10 * 1e6, 0) AS BIGINT)) AS DOUBLE)
                 / {_BATCH_N}e6, 6) AS prec10,
           ROUND(CAST(SUM(CAST(ROUND(rr10 * 1e6, 0) AS BIGINT)) AS DOUBLE)
                 / {_BATCH_N}e6, 6) AS rr10
    FROM perq2
    """,
)
def q_sim_ndcg_batch(spark, sf_dir):
    """Batched retrieval-quality eval (VERDICT r9 item 4 — one
    query's recall is noise; ten is a measurement): nDCG@10,
    precision@10, reciprocal rank and relevant-count for EACH of the
    10 batch queries (qids 0-9, the q_sim_batch convention), plus a
    macro-average row (qid = -1) over the batch. Relevance = shares
    the query vector's class label (the q_sim_ndcg convention).

    Plan: the q_sim_batch shape — broadcast the 10-row query batch,
    score corpus × batch in the scan projection, rank ≤ 10 per qid
    via row_number + filter (WindowGroupLimit truncates map-side
    BEFORE the qid exchange — plan-gated in tests/test_plans.py),
    then a 100-row metric aggregation. At 100 TB with a 10k-query
    batch the same plan holds: one corpus scan, k·|batch| shuffle
    rows per partition.

    Determinism: per-rank DCG contributions are ROUND-6ed after the
    transcendental log2 (the q_sim_ndcg discipline), then summed as
    1e-6 micro-unit BIGINTs — so the per-qid sums and the macro
    averages are exact integer arithmetic, immune to float-sum order
    (the late-r7 integer-sum discipline), with ONE division + ROUND
    at display."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )
    qb = e.filter(F.col("vec_id") < _BATCH_N).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qe"),
    )
    scored = e.join(F.broadcast(qb), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("emb"), F.col("qe")), 6).alias("sim"),
        (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc_nulls_last(), F.col("vec_id").asc_nulls_last()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select("qid", "rel", "rank")
    )
    ranked = top.withColumn(
        "nrel", F.sum("rel").over(Window.partitionBy("qid"))
    )
    contrib = ranked.select(
        "qid",
        "rel",
        "rank",
        F.round(F.round(F.col("rel") / F.log2(F.col("rank") + 1.0), 6) * 1e6)
        .cast("bigint")
        .alias("c_u"),
        F.when(
            F.col("rank") <= F.col("nrel"),
            F.round(
                F.round(F.lit(1.0) / F.log2(F.col("rank") + 1.0), 6) * 1e6
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("i_u"),
    )
    perq = contrib.groupBy(F.col("qid").cast("int").alias("qid")).agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum("c_u").cast("bigint").alias("dcg_u"),
        F.sum("i_u").cast("bigint").alias("idcg_u"),
        F.round(F.sum("rel") * 1.0 / _K, 6).alias("prec10"),
        F.round(F.max(F.col("rel") * 1.0 / F.col("rank")), 6).alias("rr10"),
    )
    perq2 = perq.select(
        "qid",
        "n_rel",
        F.round(
            F.when(F.col("idcg_u") == 0, F.lit(0.0)).otherwise(
                F.col("dcg_u") * 1.0 / F.col("idcg_u")
            ),
            6,
        ).alias("ndcg10"),
        "prec10",
        "rr10",
    )

    def _macro(col):
        return F.round(
            F.sum(F.round(F.col(col) * 1e6).cast("bigint")).cast("double")
            / (_BATCH_N * 1e6),
            6,
        ).alias(col)

    macro = perq2.agg(
        F.sum("n_rel").cast("bigint").alias("n_rel"),
        _macro("ndcg10"),
        _macro("prec10"),
        _macro("rr10"),
    ).select(
        F.lit(-1).cast("int").alias("qid"), "n_rel", "ndcg10", "prec10", "rr10"
    )
    return perq2.unionAll(macro)


@query(
    "q_sim_anneval_batch",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, {_bucket_duck()} AS bucket FROM embeddings
    ),
    qb AS (
      SELECT vec_id AS qid, bucket AS qbucket FROM b
      WHERE vec_id < {_BATCH_N}
    ),
    probes AS (
      SELECT DISTINCT qid, pb FROM (
        SELECT qid, unnest({_probe_flips_duck()}) AS pb
        FROM qb)
    ),
    cand AS (
      SELECT p.qid, b.vec_id FROM b JOIN probes p ON b.bucket = p.pb
      WHERE b.vec_id <> p.qid
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_batch_exact_duck("e", "emb")},
    perq AS (
      SELECT CAST(q.qid AS INT) AS qid,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM exact x
              WHERE x.qid = q.qid) AS n_exact,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand c
              WHERE c.qid = q.qid) AS n_cand,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM exact x JOIN cand c
                ON x.qid = c.qid AND x.vec_id = c.vec_id
              WHERE x.qid = q.qid) AS tp
      FROM qb q
    )
    SELECT qid, n_exact, n_cand, tp,
           ROUND(tp * 1.0 / n_exact, 6) AS recall10
    FROM perq
    UNION ALL
    SELECT CAST(-1 AS INT) AS qid,
           CAST(SUM(n_exact) AS BIGINT) AS n_exact,
           CAST(SUM(n_cand) AS BIGINT) AS n_cand,
           CAST(SUM(tp) AS BIGINT) AS tp,
           ROUND(SUM(tp) * 1.0 / SUM(n_exact), 6) AS recall10
    FROM perq
    """,
)
def q_sim_anneval_batch(spark, sf_dir):
    """Batched sign-LSH recall eval (VERDICT r9 item 4): for EACH of
    the 10 batch queries, the candidate-set size and recall@10 of the
    1-bit multi-probe bucket policy (q_sim_ann's probe: own bucket +
    all 1-bit flips), plus a micro-averaged row (qid = -1) — recall
    pooled as Σtp/Σn_exact, an exact integer ratio (no
    rounded-average-of-rounded-values drift).

    Plan: bucket assignment is ONE narrow scan (literal md5-derived
    weights — the q_sim_ann path); the probe filter is a 50-row
    broadcast join; the exact side is the q_sim_batch
    WindowGroupLimit shape (plan-gated). At 100 TB with a 10k-query
    batch: one scan for buckets, one for the exact legs, k·|batch|
    shuffle rows — the eval runs wherever the index build runs."""
    from datafusion_tpc_spark.operators.similarity import (  # lazy —
        _N_PLANES,  # keeps similarity's registrations out of this
        _sign_bucket,  # module's load_all position
    )

    assert _N_PLANES == _ANN_PLANES
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    dim = e.select(F.size("emb")).first()[0]
    b = e.select(
        "vec_id", "emb", _sign_bucket(F.col("emb"), dim=dim).alias("bucket")
    )
    qb = b.filter(F.col("vec_id") < _BATCH_N).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    probes = qb.select(
        "qid",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(_ANN_PLANES)
                ],
            )
        ).alias("pb"),
    ).distinct()
    cand = (
        b.join(F.broadcast(probes), F.col("bucket") == F.col("pb"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )
    exact = _batch_exact_topk(spark, sf_dir)
    return _batch_recall_table(qb, exact, cand)


def _batch_exact_topk(spark, sf_dir):
    """(qid, vec_id): the brute-force cosine top-10 per batch qid —
    the exact leg shared by the batched recall evals
    (q_sim_anneval_batch / q_sim_ivfeval_batch). The q_sim_batch
    WindowGroupLimit shape: broadcast the 10-row batch, score in the
    scan projection, per-qid rank ≤ 10 truncates map-side."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qb = e.filter(F.col("vec_id") < _BATCH_N).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc_nulls_last(), F.col("vec_id").asc_nulls_last()
    )
    return (
        e.join(F.broadcast(qb), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("emb"), F.col("qemb")), 6).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K_ANN)
        .select("qid", "vec_id")
    )


def _batch_recall_table(qids, exact, cand):
    """perq rows (qid, n_exact, n_cand, tp, recall10) + the
    micro-averaged qid = -1 row, from (qid, vec_id)-shaped exact and
    candidate sets — the shared assembly of the batched recall
    evals. Micro-average = Σtp/Σn_exact, an exact integer ratio."""
    n_exact = exact.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    n_cand = cand.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    )
    tp = (
        exact.join(cand, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tp"))
    )
    perq = (
        qids.select(F.col("qid").cast("int").alias("qid"))
        .join(n_exact, "qid", "left")
        .join(n_cand, "qid", "left")
        .join(tp, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_exact", F.lit(0)).cast("bigint").alias("n_exact"),
            F.coalesce("n_cand", F.lit(0)).cast("bigint").alias("n_cand"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
        .withColumn(
            "recall10", F.round(F.col("tp") * 1.0 / F.col("n_exact"), 6)
        )
    )
    macro = perq.agg(
        F.sum("n_exact").cast("bigint").alias("n_exact"),
        F.sum("n_cand").cast("bigint").alias("n_cand"),
        F.sum("tp").cast("bigint").alias("tp"),
        F.round(F.sum("tp") * 1.0 / F.sum("n_exact"), 6).alias("recall10"),
    ).select(F.lit(-1).cast("int").alias("qid"), "n_exact", "n_cand", "tp", "recall10")
    return perq.unionAll(macro)


def _ivfeval_batch_oracle() -> str:
    from datafusion_tpc_spark.functions.ivf import ivf_batch_duck_cte

    return f"""
    WITH {ivf_batch_duck_cte()},
    {_batch_exact_duck("raw", "emb")},
    perq AS (
      SELECT CAST(q.qid AS INT) AS qid,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM exact x
              WHERE x.qid = q.qid) AS n_exact,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand c
              WHERE c.qid = q.qid) AS n_cand,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM exact x JOIN cand c
                ON x.qid = c.qid AND x.vec_id = c.vec_id
              WHERE x.qid = q.qid) AS tp
      FROM qb q
    )
    SELECT qid, n_exact, n_cand, tp,
           ROUND(tp * 1.0 / n_exact, 6) AS recall10
    FROM perq
    UNION ALL
    SELECT CAST(-1 AS INT) AS qid,
           CAST(SUM(n_exact) AS BIGINT) AS n_exact,
           CAST(SUM(n_cand) AS BIGINT) AS n_cand,
           CAST(SUM(tp) AS BIGINT) AS tp,
           ROUND(SUM(tp) * 1.0 / SUM(n_exact), 6) AS recall10
    FROM perq
    """


@query("q_sim_ivfeval_batch", oracle=_ivfeval_batch_oracle())
def q_sim_ivfeval_batch(spark, sf_dir):
    """Batched IVF recall eval: for EACH of the 10 batch queries, the
    candidate-set size and recall@10 of the nprobe=2 probe, plus the
    micro-averaged row (qid = -1, Σtp/Σn_exact) — completes the
    batched measurement story (q_sim_ndcg_batch = ranking quality,
    q_sim_anneval_batch = sign-LSH recall, THIS = IVF recall), so the
    recall-vs-cost comparison between the two index families is one
    query pair over the same batch.

    The candidate stream IS q_sim_ivf_batch's input
    (functions/ivf.py::ivf_batch_candidates — the _ivf_candidates
    sharing pattern), so a probe-policy change cannot leave this eval
    measuring a different candidate set. EXACT-oracled: the oracle
    retrains the quantizer in SQL and replays the batch probe
    (ivf_batch_duck_cte).

    100 TB: one broadcast-argmin assignment scan + one exact-leg scan
    (both the q_sim_batch WindowGroupLimit shape); the metric
    assembly runs on ≤ |batch|·(k + nprobe·cell) rows."""
    from datafusion_tpc_spark.functions.ivf import (
        BATCH_N,
        ivf_batch_candidates,
    )

    assert BATCH_N == _BATCH_N
    cand = ivf_batch_candidates(spark, sf_dir).select("qid", "vec_id")
    exact = _batch_exact_topk(spark, sf_dir)
    # The row universe is the BATCH DEFINITION (vec_id < N), exactly
    # like the oracle's `FROM qb q` — deriving it from
    # exact.distinct() would drop a qid whose exact leg is empty
    # (sparse future fixture) where the oracle emits a zero row, and
    # it instantiates the exact lineage one extra time (review r10).
    qids = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _BATCH_N)
        .select(F.col("vec_id").alias("qid"))
    )
    return _batch_recall_table(qids, exact, cand)


_NPROBE_MAX = 4  # sweep axis 1..4 of the 8 cells


def _ivf_sweep_oracle() -> str:
    from datafusion_tpc_spark.functions.ivf import ivf_batch_duck_cte

    return f"""
    WITH {ivf_batch_duck_cte()},
    ranked AS (
      SELECT qid, CAST(cid AS INT) AS cell,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY enc ASC)
               AS INT) AS rnk
      FROM pd
    ),
    vc AS (
      SELECT r.qid, a.vec_id, r.rnk
      FROM asn a JOIN ranked r ON a.cell = r.cell
      WHERE a.vec_id <> r.qid
    ),
    {_batch_exact_duck("raw", "emb")},
    hits AS (
      SELECT x.qid, v.rnk FROM exact x
      JOIN vc v ON v.qid = x.qid AND v.vec_id = x.vec_id
    ),
    sweep AS (
      SELECT CAST(unnest(range(1, {_NPROBE_MAX} + 1)) AS INT) AS nprobe
    ),
    m AS (
      SELECT s.nprobe,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM vc v
              WHERE v.rnk <= s.nprobe) AS n_cand,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hits h
              WHERE h.rnk <= s.nprobe) AS tp,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM vc) AS n_pairs
      FROM sweep s
    )
    SELECT nprobe, n_exact, n_cand, tp,
           ROUND(tp * 1.0 / n_exact, 6) AS recall10,
           ROUND(n_cand * 1.0 / n_pairs, 6) AS cand_frac
    FROM m
    """


@query("q_sim_ivf_sweep", oracle=_ivf_sweep_oracle())
def q_sim_ivf_sweep(spark, sf_dir):
    """Recall-vs-nprobe tuning curve for the IVF index: for nprobe =
    1..4, the pooled (over the 10-query batch) candidate count,
    recall@10 and candidate fraction — the measurement an index
    operator reads to pick nprobe BEFORE committing a serving config
    (the PR-curve analog for ANN; q_dq_prcurve's role for
    classifiers).

    One assignment pass serves the WHOLE sweep: every (qid, cell)
    pair is ranked once (functions/ivf.py::batch_cell_ranks — whose
    rnk <= IVF_NPROBE prefix IS the production probe of
    q_sim_ivf_batch, so sweep point 2 measures exactly the shipped
    config), each (qid, vec) candidate pair inherits its cell's rank,
    and every sweep point is a cumulative integer count over that one
    table — no per-nprobe re-probing. Recall is pooled Σtp/Σn_exact
    (exact integer ratio, the q_sim_anneval_batch micro-average
    discipline).

    100 TB: one broadcast-argmin assignment scan + one exact-leg scan
    (both q_sim_batch shapes); the sweep itself aggregates a
    |batch|·corpus-fraction candidate-rank table by integer rank —
    adding sweep points costs nothing but rows in a 4-row literal."""
    from datafusion_tpc_spark.functions.ivf import (
        BATCH_N,
        batch_cell_ranks,
        ivf_model,
    )

    assert BATCH_N == _BATCH_N
    raw, v, cents, assigned = ivf_model(spark, sf_dir)
    qb = v.filter(F.col("vec_id") < _BATCH_N).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    ranks = batch_cell_ranks(qb, cents)
    vc = (
        assigned.join(F.broadcast(ranks), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "rnk")
    )
    exact = _batch_exact_topk(spark, sf_dir)
    # ONE consumer of the candidate-rank table: flag hits via the
    # broadcast 100-row exact set, then a single groupBy(rnk) carries
    # both series (candidate count + hit count) — a second consumer
    # would re-instantiate the assignment-scan lineage in the plan
    # (measured 2.33 s vs 1.2 s at sf0.1).
    vch = vc.join(
        F.broadcast(exact.withColumn("is_hit", F.lit(1))),
        ["qid", "vec_id"],
        "left",
    )
    by_rnk = (
        vch.groupBy("rnk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.coalesce(F.col("is_hit"), F.lit(0)))
            .cast("bigint")
            .alias("h"),
        )
        .withColumn("n_pairs", F.sum("c").over(Window.partitionBy()))
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    sweep = values_df(
        spark, [(p,) for p in range(1, _NPROBE_MAX + 1)], "nprobe int"
    )
    return (
        sweep.join(F.broadcast(by_rnk), F.col("rnk") <= F.col("nprobe"), "left")
        .groupBy("nprobe")
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_cand"),
            F.coalesce(F.sum("h"), F.lit(0)).cast("bigint").alias("tp"),
            F.max("n_pairs").alias("n_pairs"),
        )
        .crossJoin(F.broadcast(n_exact))
        .select(
            "nprobe",
            "n_exact",
            "n_cand",
            "tp",
            F.round(F.col("tp") * 1.0 / F.col("n_exact"), 6).alias("recall10"),
            F.round(F.col("n_cand") * 1.0 / F.col("n_pairs"), 6).alias(
                "cand_frac"
            ),
        )
    )
