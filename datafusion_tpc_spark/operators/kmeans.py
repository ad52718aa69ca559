"""Fully distributed fixed-iteration k-means (r5) — the flagship
iterative-ML composite: both halves of Lloyd's algorithm as DataFrame
ops, bit-reproducibly oracled in DuckDB by unrolling the iterations
(the q_graph_pagerank pattern, applied to a vector workload).

Relation to the rest of the similarity layer: since r10 q_sim_ivf's
coarse quantizer trains with THIS choreography (shared via
functions/lloyd.py, on L2-normalized vectors — functions/ivf.py);
q_sim_centroid is the distributed cluster-UPDATE step alone. This
operator runs the full loop distributed — assignment is a broadcast
cross-expansion + encoded-bigint argmin (hash-aggregatable, the
q_geo_nearest trick), update is the posexplode → (cell, dim) average
— so neither step ever funnels the corpus through the driver.

Determinism choreography (why the oracle hash-matches):
- seeds: the k vectors with the smallest md5/h60 keys (driver
  seed=42 convention) — a deterministic, data-independent choice;
- squared distances fold over dimensions in ELEMENT ORDER on both
  engines (Spark aggregate() over zip_with; DuckDB list_sum over
  list_transform) and are quantized to 1e-6 inside the argmin
  encoding, so a last-ulp libm/SIMD divergence cannot flip an
  assignment except at a measure-zero rounding boundary;
- centroid components are ROUND(…, 6)ed at every update, so each
  iteration starts from IDENTICAL doubles on both engines — errors
  cannot compound across iterations.

100 TB design: per iteration, one broadcast of k·dim doubles, one
map-side-combinable argmin agg keyed by vec_id, one (k·dim)-keyed
update agg. Corpus size touches only scans; state is O(k·dim).
k=4, dim=64, 2 iterations here — the constants keep the unrolled
oracle readable, the plan shape is the product.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck
from datafusion_tpc_spark.functions.lloyd import assign as _assign
from datafusion_tpc_spark.functions.lloyd import duck_iter
from datafusion_tpc_spark.functions.lloyd import update as _update
from datafusion_tpc_spark.functions.seeds import seed_pick
from datafusion_tpc_spark.registry import query

_K = 4
_DIM = 64
_ITERS = 2


def _duck_iter(n: int, cent_rel: str) -> str:
    # factored to functions/lloyd.py in r10 (shared with the IVF
    # coarse quantizer, functions/ivf.py) — SQL text unchanged.
    return duck_iter(n, cent_rel, _DIM)


@query(
    "q_sim_kmeans",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    seeds AS (
      SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY {_h60_duck("concat('km:', CAST(vec_id AS VARCHAR))")} ASC,
                        vec_id ASC) AS INT) AS cid, e
      FROM v
      QUALIFY cid <= {_K}
    ),
    {_duck_iter(1, "seeds")},
    {_duck_iter(2, "c1")}
    SELECT CAST(enc % 10 AS INT) AS cid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG((enc // 10) / 1000000.0), 6) AS avg_d2
    FROM a2
    GROUP BY 1
    """,
)
def q_sim_kmeans(spark, sf_dir):
    """Distributed k-means, k=4, two Lloyd iterations over the
    embeddings table: deterministic h60 seeding → (assign → update)
    twice → final assignment, reported as per-cell membership count
    and mean squared distance. The DuckDB oracle unrolls the identical
    two iterations as chained CTEs — every assignment and every
    centroid component must match bit-for-bit for the hash to pass."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # seed_pick = TakeOrderedAndProject(K) map-side heap, NOT a
    # corpus-wide partition-less rank (VERDICT r8 item 2) — identical
    # (h60, vec_id) order so the QUALIFY oracle selects the same rows.
    cents = v.join(F.broadcast(seed_pick(v, "km:", _K)), "vec_id").select(
        "cid", "e"
    )
    assign = None
    for _ in range(_ITERS):
        assign = _assign(v, cents)
        cents = _update(assign)
    return (
        assign.select(
            F.pmod(F.col("enc"), F.lit(10)).cast("int").alias("cid"),
            (F.expr("enc div 10").cast("double") / 1e6).alias("d2"),
        )
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("d2"), 6).alias("avg_d2"),
        )
    )
