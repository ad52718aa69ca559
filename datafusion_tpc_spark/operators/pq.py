"""Product quantization codebook training (round 7) — the memory-side
half of large-scale ANN (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): split each embedding into M
subspaces, run k-means independently per subspace, and store each
vector as M small codes. With M=2, K=4 here a 64-dim float vector
compresses to 2 codes; production scale (M=8, K=256 → 8 bytes per
vector) changes only the constants.

Relation to the similarity layer: q_sim_ivf is the coarse (first
level) quantizer; PQ is the residual/fine code an IVF-PQ index pairs
with it; q_sim_kmeans (operators/kmeans.py) is the single-space
k-means this generalizes — same broadcast-expansion argmin and
(cell, dim)-keyed update, with `sub` added to every key, and the same
determinism choreography (h60 seeds, 1e-6-quantized argmin encoding,
ROUND(…,6) centroid state each iteration) so the unrolled DuckDB
oracle hash-matches bit-for-bit.

100 TB design: per iteration one broadcast of M·K·(dim/M) doubles
(= K·dim — same as flat k-means), one map-side-combinable argmin agg
keyed by (vec_id, sub), one (sub, cid, pos)-keyed update agg. Corpus
size touches only scans; training state is O(K·dim). The M subspace
problems train CONCURRENTLY in one plan — `sub` is just another key
column, not a loop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck
from datafusion_tpc_spark.functions.seeds import seed_pick
from datafusion_tpc_spark.registry import query

_K = 4
_DIM = 64
_M = 2
_SUBDIM = _DIM // _M
_ITERS = 2

_D2_SPARK = (
    "aggregate(zip_with(e, ce, (x, y) -> (x - y) * (x - y)), "
    "cast(0.0 as double), (acc, x) -> acc + x)"
)


def _assign(v, cents):
    """(vec, sub) → nearest centroid of the SAME subspace: broadcast
    expansion + min over encoded bigint round(d2·1e6)·10 + cid."""
    pairs = v.join(
        F.broadcast(cents.select("sub", "cid", F.col("e").alias("ce"))),
        "sub",
    )
    enc = (
        F.round(F.expr(_D2_SPARK) * 1e6).cast("bigint") * 10 + F.col("cid")
    ).alias("enc")
    return (
        pairs.select("vec_id", "sub", "e", enc)
        .groupBy("vec_id", "sub")
        .agg(F.min("enc").alias("enc"), F.first("e").alias("e"))
    )


def _update(assign):
    """new per-subspace centroids: posexplode → (sub, cid, pos) avg,
    ROUND 6dp so both engines start the next iteration identically."""
    comp = assign.select(
        "sub",
        F.pmod(F.col("enc"), F.lit(10)).cast("int").alias("cid"),
        F.posexplode("e").alias("pos0", "x"),
    )
    return (
        comp.groupBy("sub", "cid", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy("sub", "cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("sub", "cid", F.expr("transform(pc, s -> s.c)").alias("e"))
    )


def _duck_iter(n: int, cent_rel: str) -> str:
    return f"""
    p{n} AS (
      SELECT v.vec_id, v.sub, v.e,
             CAST(ROUND(list_sum(list_transform(range(1, {_SUBDIM + 1}),
                    i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) * 1e6, 0)
                  AS BIGINT) * 10 + c.cid AS enc
      FROM v, {cent_rel} c
      WHERE c.sub = v.sub
    ),
    a{n} AS (
      SELECT vec_id, sub, ANY_VALUE(e) AS e, MIN(enc) AS enc
      FROM p{n} GROUP BY vec_id, sub
    ),
    x{n} AS (
      SELECT sub, CAST(enc % 10 AS INT) AS cid,
             unnest(e) AS x,
             CAST(unnest(range(1, {_SUBDIM + 1})) AS INT) AS pos
      FROM a{n}
    ),
    m{n} AS (
      SELECT sub, cid, pos, ROUND(AVG(x), 6) AS c
      FROM x{n} GROUP BY sub, cid, pos
    ),
    c{n} AS (
      SELECT sub, cid, list(c ORDER BY pos ASC) AS e
      FROM m{n} GROUP BY sub, cid
    )"""


@query(
    "q_sim_pq",
    oracle=f"""
    WITH full_v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fe FROM embeddings
    ),
    v AS (
      SELECT vec_id, 0 AS sub, fe[1:{_SUBDIM}] AS e FROM full_v
      UNION ALL
      SELECT vec_id, 1 AS sub, fe[{_SUBDIM + 1}:{_DIM}] AS e FROM full_v
    ),
    seed_rank AS (
      SELECT vec_id, CAST(ROW_NUMBER() OVER (
               ORDER BY {_h60_duck("concat('pq:', CAST(vec_id AS VARCHAR))")} ASC,
                        vec_id ASC) AS INT) AS cid
      FROM full_v
      QUALIFY cid <= {_K}
    ),
    seeds AS (
      SELECT v.sub, s.cid, v.e
      FROM v JOIN seed_rank s ON s.vec_id = v.vec_id
    ),
    {_duck_iter(1, "seeds")},
    {_duck_iter(2, "c1")}
    SELECT sub, CAST(enc % 10 AS INT) AS cid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG((enc // 10) / 1000000.0), 6) AS avg_d2
    FROM a2
    GROUP BY 1, 2
    """,
)
def q_sim_pq(spark, sf_dir):
    """Product-quantization training, M=2 subspaces × K=4 codes, two
    Lloyd iterations per subspace over the embeddings table:
    deterministic h60 seeding (the same 4 seed vectors contribute
    their slice to each subspace's initial codebook) → per-subspace
    (assign → update) twice → final code assignment, reported as per
    (subspace, code) membership count and mean squared distance — the
    per-subspace distortion a PQ index build monitors. The DuckDB
    oracle unrolls both iterations with `sub` in every key."""
    full_v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("fe")
    )
    v = full_v.select(
        "vec_id", F.lit(0).alias("sub"), F.slice("fe", 1, _SUBDIM).alias("e")
    ).unionAll(
        full_v.select(
            "vec_id",
            F.lit(1).alias("sub"),
            F.slice("fe", _SUBDIM + 1, _SUBDIM).alias("e"),
        )
    )
    # seed_pick = TakeOrderedAndProject(K) map-side heap, NOT a
    # corpus-wide partition-less rank (VERDICT r8 item 2) — identical
    # (h60, vec_id) order so the QUALIFY oracle selects the same rows.
    seed_rank = F.broadcast(seed_pick(full_v, "pq:", _K))
    cents = v.join(seed_rank, "vec_id").select("sub", "cid", "e")
    assign = None
    for _ in range(_ITERS):
        assign = _assign(v, cents)
        cents = _update(assign)
    return (
        assign.select(
            "sub",
            F.pmod(F.col("enc"), F.lit(10)).cast("int").alias("cid"),
            (F.expr("enc div 10").cast("double") / 1e6).alias("d2"),
        )
        .groupBy("sub", "cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("d2"), 6).alias("avg_d2"),
        )
    )
