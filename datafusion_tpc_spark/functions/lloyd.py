"""Shared distributed Lloyd-iteration choreography (round 10) — the
single-space k-means assign/update steps factored out of
operators/kmeans.py so operators/similarity.py's IVF coarse quantizer
(q_sim_ivf, VERDICT r9 item 3) can train with the identical
bit-reproducible plan instead of a driver-side numpy loop.

Registration-free module (the functions/digest.py discipline): it is
imported by window-scheduled query modules, so it must not register
queries of its own.

Determinism choreography (why the DuckDB oracles hash-match — see
operators/kmeans.py for the full argument):
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
update agg. Corpus size touches only scans; training state is
O(k·dim). The argmin encoding packs (round(d2·1e6), cid) into one
BIGINT so the per-vector reduction is a hash-aggregatable MIN, never
a sort (the geo pattern). cid must stay ≤ 9 (one decimal digit);
operators/quantization.py widens the base to 100 for larger K.
"""

from __future__ import annotations

from pyspark.sql import functions as F

def d2_expr(a: str = "e", b: str = "ce") -> str:
    """Squared L2 distance between vector columns `a` and `b`, folded
    in element order (the cross-engine-exact sequence)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )


# assign()'s default column pairing, kept as a constant for readers.
D2_SPARK = d2_expr()


def assign(v, cents, carry=()):
    """vec → nearest centroid: broadcast expansion + min over the
    encoded bigint round(d2·1e6)·10 + cid (hash agg, no sort).
    `v` carries (vec_id, e[, *carry]); extra `carry` columns ride
    along via first() (constant within a vec_id group)."""
    pairs = v.crossJoin(
        F.broadcast(cents.select("cid", F.col("e").alias("ce")))
    )
    enc = (
        F.round(F.expr(D2_SPARK) * 1e6).cast("bigint") * 10 + F.col("cid")
    ).alias("enc")
    aggs = [F.min("enc").alias("enc"), F.first("e").alias("e")] + [
        F.first(c).alias(c) for c in carry
    ]
    return (
        pairs.select("vec_id", "e", *carry, enc).groupBy("vec_id").agg(*aggs)
    )


def update(assigned):
    """cells' new centroids: posexplode → (cid, dim) avg, components
    rounded to 6dp so both engines start the next iteration from
    identical doubles."""
    comp = assigned.select(
        F.pmod(F.col("enc"), F.lit(10)).cast("int").alias("cid"),
        F.posexplode("e").alias("pos0", "x"),
    )
    return (
        comp.groupBy("cid", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("cid", F.expr("transform(pc, s -> s.c)").alias("e"))
    )


def duck_iter(n: int, cent_rel: str, dim: int, vec_rel: str = "v") -> str:
    """One unrolled Lloyd iteration as DuckDB CTEs p{n}/a{n}/x{n}/
    m{n}/c{n}: the SQL twin of assign(...) + update(...). `vec_rel`
    must expose (vec_id, e); `cent_rel` must expose (cid, e)."""
    return f"""
    p{n} AS (
      SELECT {vec_rel}.vec_id, {vec_rel}.e,
             CAST(ROUND(list_sum(list_transform(range(1, {dim + 1}),
                    i -> ({vec_rel}.e[i] - c.e[i]) * ({vec_rel}.e[i] - c.e[i]))) * 1e6, 0)
                  AS BIGINT) * 10 + c.cid AS enc
      FROM {vec_rel}, {cent_rel} c
    ),
    a{n} AS (
      SELECT vec_id, ANY_VALUE(e) AS e, MIN(enc) AS enc
      FROM p{n} GROUP BY vec_id
    ),
    x{n} AS (
      SELECT CAST(enc % 10 AS INT) AS cid,
             unnest(e) AS x,
             CAST(unnest(range(1, {dim + 1})) AS INT) AS pos
      FROM a{n}
    ),
    m{n} AS (
      SELECT cid, pos, ROUND(AVG(x), 6) AS c FROM x{n} GROUP BY cid, pos
    ),
    c{n} AS (
      SELECT cid, list(c ORDER BY pos ASC) AS e FROM m{n} GROUP BY cid
    )"""
