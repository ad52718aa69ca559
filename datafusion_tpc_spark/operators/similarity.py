"""Similarity search over embeddings — north-star extension (SURVEY.md
§7/M5, no reference counterpart).

Three search paths over the `embeddings` fixture (array<float>
64-dim):
- brute-force cosine top-k (exact baseline, exact DuckDB oracle),
- sign-LSH bucketed ANN (EXACT-oracled since late r10 — buckets,
  probes and ranking are deterministic; recall stays property-tested
  in tests/test_extensions.py),
- IVF probe-cell ANN (EXACT-oracled since r10 — the coarse quantizer
  is the distributed SQL-derivable choreography of functions/ivf.py),
plus q_sim_centroid, the distributed cluster-update build block.

Scale notes (100 TB): brute-force top-k against ONE query vector is a
single scan + TakeOrderedAndProject — actually fine at any scale
(no shuffle, k rows to the driver). The quadratic case is all-pairs /
many-queries; that's what the LSH buckets are for: hash each vector to
a 16-bit sign signature (vs 16 fixed md5-derived pseudo-random
hyperplanes), shuffle once on the bucket key, and search within
buckets (+ optional multi-probe on neighboring buckets). Bucket-count
scales with data, per-bucket work stays bounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import cosine
from datafusion_tpc_spark.registry import query

_QUERY_VEC_ID = 0
_K = 20


@query(
    "q_sim_topk",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> {_QUERY_VEC_ID}
    ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) DESC NULLS LAST,
             e.vec_id ASC NULLS LAST
    LIMIT {_K}
    """,
)
def q_sim_topk(spark, sf_dir):
    """Brute-force cosine top-k for one query vector (vec_id=0).
    The query vector is broadcast-cross-joined (1 row — no shuffle of
    the fact side); ordering is on the ROUNDED score + vec_id so the
    top-k set is deterministic across engines despite float noise."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    qv = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(F.col("emb").alias("qe"))
    return (
        e.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .withColumn("cos_sim", F.round(cosine(F.col("emb"), F.col("qe")), 6))
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.col("cos_sim").desc_nulls_last(), F.col("vec_id").asc_nulls_last())
        .limit(_K)
    )


_N_PLANES = 4  # 2^4 buckets — sized for the fixture; at 100 TB scale
#                n_planes grows with log2(corpus) to keep buckets bounded


def _plane_weights_py(p: int, dim: int) -> list[float]:
    """Python twin of the md5(p|dim) weight family — bit-identical to
    the column-expression form (same strings hashed, same 15-hex-char
    h60 prefix, same integer modulo), verified by
    tests/test_extensions.py::test_sign_bucket_literal_matches_expression."""
    import hashlib

    return [
        (int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
        / 1000.0
        for d in range(dim)
    ]


def _sign_bucket(emb_col, n_planes: int = _N_PLANES, dim: int | None = None):
    """Sign-LSH bucket: plane p's pseudo-random normal is derived
    per-dimension from md5(p|dim) (deterministic, no RNG — replayable
    and engine-independent). Returns an int bucket id.

    When `dim` is known, the weight vectors are precomputed in Python
    and embedded as array literals: the weights depend only on
    (plane, dim), but the expression form re-evaluates n_planes×dim
    md5s PER ROW (≈512k digests for 2000×64-dim vectors — measured
    ~4× the whole query's runtime). The literal path keeps the same
    zip_with/aggregate fold, so buckets are bit-identical; dim=None
    falls back to the expression form (works without knowing the
    dimension, e.g. ragged test data)."""
    from datafusion_tpc_spark.functions.digest import h60

    if dim is not None:
        cols = []
        for p in range(n_planes):
            weights = F.array(*[F.lit(w) for w in _plane_weights_py(p, dim)])
            proj = F.aggregate(
                F.zip_with(emb_col, weights, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cols.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        bucket = cols[0]
        for c in cols[1:]:
            bucket = bucket + c
        return bucket

    # weight(p, d) = (h60(p|d) % 2001 - 1000) / 1000  ∈ [-1, 1]
    # bucket bit p = sign(Σ_d w(p,d) * emb[d]) > 0
    # h60 already casts conv()'s STRING result to BIGINT so the modulo
    # is exact integer math (a bare conv() % would coerce through
    # DOUBLE and round away the low ~7 bits of the 60-bit hash); the
    # weight array is derived from the passed-in column, not a
    # hard-coded column name, so aliased callers work.
    # NOTE: the lambda passed to F.transform must be UNARY — a second
    # parameter (even a defaulted one, e.g. `lambda d, _p=p:`) makes
    # PySpark treat it as the (element, index) binary form, binding the
    # default to the index Column and embedding its repr in the hash
    # input instead of the plane number. A closure factory keeps p out
    # of the signature entirely.
    def _plane_weights(p: int):
        return lambda d: (
            h60(F.concat(F.lit(f"{p}|"), d.cast("string"))) % 2001 - 1000
        ) / F.lit(1000.0)

    cols = []
    for p in range(n_planes):
        weights = F.transform(
            F.sequence(F.lit(0), F.size(emb_col) - 1),
            _plane_weights(p),
        )
        proj = F.aggregate(
            F.zip_with(emb_col, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = cols[0]
    for c in cols[1:]:
        bucket = bucket + c
    return bucket


def _ivf_candidates(spark, sf_dir):
    """IVF probe candidate set (vec_id, label, cos_sim, cell) for the
    query vector — everything q_sim_ivf does except the final
    rank+limit, shared with q_sim_ivfeval (r8) so the recall eval
    measures exactly the candidate stream the search ranks.

    Round 10 (VERDICT r9 item 3): the coarse quantizer is the fully
    DISTRIBUTED h60-seeded Lloyd choreography of functions/ivf.py
    (seed_pick TakeOrdered K=8 seeds, 2 broadcast-argmin iterations,
    ROUND-6 centroid state), replacing the r5 driver-side numpy
    sample loop — every step now has a DuckDB twin, so q_sim_ivf and
    q_sim_ivfeval are EXACT-oracled (see functions/ivf.py for the
    full choreography and the 100 TB plan-shape argument)."""
    from datafusion_tpc_spark.functions.ivf import QID, ivf_candidates

    assert QID == _QUERY_VEC_ID
    return ivf_candidates(spark, sf_dir)


def _ivf_oracle() -> str:
    from datafusion_tpc_spark.functions.ivf import ivf_duck_cte

    return f"""
    WITH {ivf_duck_cte()}
    SELECT vec_id, label, cos_sim, cell FROM cand
    ORDER BY cos_sim DESC NULLS LAST, vec_id ASC NULLS LAST
    LIMIT {_K}
    """


@query("q_sim_ivf", oracle=_ivf_oracle())
def q_sim_ivf(spark, sf_dir):
    """IVF approximate nearest neighbors: rank the probe-cell
    candidate stream (_ivf_candidates — distributed h60-seeded coarse
    quantizer, broadcast-argmin assign, search nprobe=2 cells) by
    exact cosine and keep the top-k. EXACT-oracled since r10: the
    DuckDB oracle retrains the identical quantizer in SQL
    (functions/ivf.py::ivf_duck_cte), so every cell assignment and
    every candidate score must match bit-for-bit."""
    return (
        _ivf_candidates(spark, sf_dir)
        .orderBy(F.col("cos_sim").desc_nulls_last(), F.col("vec_id").asc_nulls_last())
        .limit(_K)
    )


_IVF_BATCH_N = 10  # qids 0..9 (the q_sim_batch convention)


def _ivf_batch_oracle() -> str:
    # single source for the batched-search oracle, shared with the
    # materialized-serving twin q_sim_ivf_served_batch (review r11)
    from datafusion_tpc_spark.functions.ivf import ivf_batch_ranked_oracle

    return ivf_batch_ranked_oracle()


@query("q_sim_ivf_batch", oracle=_ivf_batch_oracle())
def q_sim_ivf_batch(spark, sf_dir):
    """Batched IVF search: cosine top-5 for a 10-query batch through
    the nprobe=2 probe path in ONE plan — completes the batch story
    across the search paths (q_sim_batch = brute force,
    q_sim_ndcg_batch/q_sim_anneval_batch = batched evals, THIS = the
    index-backed serving shape). The index (trained codebook + cell
    assignment) comes from functions/ivf.py::ivf_model — the
    identical index q_sim_ivf serves single queries from.

    Plan: the cell assignment is the one broadcast-argmin corpus
    scan; per-qid probe cells are an 80-row ranking (WindowGroupLimit);
    candidates join the (qid, cell) probe table broadcast, score only
    within probed cells, and the per-qid top-5 is a second
    WindowGroupLimit — plan-gated in tests/test_plans.py. At 100 TB
    with a 10k-query batch: one corpus scan, ≤ k·|batch| shuffle rows
    per partition, probe table |batch|·nprobe rows broadcast.

    EXACT-oracled: the oracle retrains the quantizer in SQL
    (ivf_batch_duck_cte) and replays the identical probe + ranking —
    every cell id, candidate membership, and score must match
    bit-for-bit. The candidate stream is ivf_batch_candidates
    (functions/ivf.py), shared verbatim with q_sim_ivfeval_batch so
    the batched recall eval measures exactly what this search
    ranks."""
    from datafusion_tpc_spark.functions.ivf import (
        BATCH_N,
        ivf_batch_candidates,
        ranked_topk_batch,
    )

    assert BATCH_N == _IVF_BATCH_N
    return ranked_topk_batch(ivf_batch_candidates(spark, sf_dir))


def _ann_candidates(spark, sf_dir):
    """Sign-LSH 1-bit multi-probe candidate stream (vec_id, label,
    emb, qe, bucket) — everything q_sim_ann does except the final
    exact-cosine rank+limit, shared with q_sim_anneval (the
    _ivf_candidates pattern) so the recall eval measures exactly the
    candidate set the production search ranks and cannot drift from
    a future probe-policy change."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    # one-row metadata probe: the embedding dimension, so the bucket
    # weights compile to literals instead of per-row md5s
    dim = e.select(F.size("emb")).first()[0]
    bucketed = e.withColumn("bucket", _sign_bucket(F.col("emb"), dim=dim))
    qrow = bucketed.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("emb").alias("qe"), F.col("bucket").alias("qbucket")
    )
    # multi-probe: query bucket + all 1-bit flips of it; the probe
    # buckets are pairwise distinct, so each vector matches at most
    # one probe row — the join is candidate-exact, no dedup needed
    probes = qrow.select(
        "qe",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(_N_PLANES)
                ],
            )
        ).alias("probe_bucket"),
    )
    return bucketed.join(
        F.broadcast(probes), F.col("bucket") == F.col("probe_bucket")
    ).filter(F.col("vec_id") != _QUERY_VEC_ID)


def _ann_oracle() -> str:
    from datafusion_tpc_spark.functions.signlsh import (
        N_PLANES,
        bucket_duck,
        probe_flips_duck,
    )

    assert N_PLANES == _N_PLANES
    return f"""
    WITH b AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             {bucket_duck()} AS bucket
      FROM embeddings
    ),
    qv AS (SELECT bucket AS qbucket, emb AS qe FROM b
           WHERE vec_id = {_QUERY_VEC_ID}),
    probes AS (
      SELECT DISTINCT pb FROM (
        SELECT unnest({probe_flips_duck()}) AS pb FROM qv)
    ),
    cand AS (
      SELECT b.vec_id, b.label,
             ROUND(list_cosine_similarity(b.emb, qv.qe), 6) AS cos_sim,
             b.bucket
      FROM b JOIN probes ON b.bucket = probes.pb, qv
      WHERE b.vec_id <> {_QUERY_VEC_ID}
    )
    SELECT vec_id, label, cos_sim, bucket FROM cand
    ORDER BY cos_sim DESC NULLS LAST, vec_id ASC NULLS LAST
    LIMIT {_K}
    """


@query("q_sim_ann", oracle=_ann_oracle())
def q_sim_ann(spark, sf_dir):
    """Sign-LSH approximate nearest neighbors with 1-bit multi-probe:
    bucket all vectors by the sign signature, probe the query's bucket
    plus every bucket at Hamming distance 1 (n_planes+1 probes —
    _ann_candidates, shared with the recall eval), rank candidates by
    exact cosine. One shuffle on the bucket key; per-bucket work is
    |bucket|·dim. Recall vs q_sim_topk is property-tested.

    EXACT-oracled since late r10 (was † — the last †-by-habit in the
    similarity family): approximate-vs-exact describes the RECALL
    contract, not determinism — the md5-derived buckets, the probe
    set, and the ROUND-6 + vec_id ranking are all bit-reproducible,
    and q_sim_anneval has proven the SQL bucket twin hash-exact since
    r8. The oracle (functions/signlsh.py builders) recomputes buckets,
    probes and the candidate ranking in DuckDB."""
    return (
        _ann_candidates(spark, sf_dir)
        .withColumn("cos_sim", F.round(cosine(F.col("emb"), F.col("qe")), 6))
        .select("vec_id", "label", "cos_sim", "bucket")
        .orderBy(F.col("cos_sim").desc_nulls_last(), F.col("vec_id").asc_nulls_last())
        .limit(_K)
    )


@query(
    "q_sim_centroid",
    oracle="""
    SELECT label, pos,
           ROUND(AVG(CAST(v AS DOUBLE)), 6) AS c,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT label,
             unnest(embedding) AS v,
             CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def q_sim_centroid(spark, sf_dir):
    """Distributed per-label centroid build — the cluster-update half
    of k-means / the IVF codebook build (since r10 q_sim_ivf's coarse
    quantizer trains fully distributed with this same update shape —
    functions/lloyd.py): posexplode the vector column and average
    per (label, dimension). Long-format output (label, pos, c) — one
    row per centroid component — keeps arrays out of the oracle
    comparison entirely.

    100 TB: the shuffle carries |labels|·dim keys with map-side
    combine — corpus size touches only the scan; the update step of
    distributed k-means is exactly this plan with label replaced by
    assigned-cell."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos0", "v"
            ),
        )
        .groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            F.round(F.avg("v"), 6).alias("c"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
