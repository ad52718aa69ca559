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
