"""Geospatial nearest-neighbor join (r5) — beyond-reference surface:
haversine great-circle distance + argmin-per-probe, the "nearest
facility" shape, in plain DataFrame ops (neither engine has native
geo types; the reference has none either).

Coordinates are SYNTHESIZED deterministically from the md5/h60 family
(integer mod → IEEE-exact division), so both engines see identical
doubles; the haversine itself uses libm transcendentals, so the
distance is ROUND(…, 6)ed before the argmin and ties break on the
city key — the repo's standard float-boundary discipline.

100 TB design: the city dimension broadcasts (25 rows; any real POI
set in the thousands still broadcasts); the probe side is one
broadcast nested-loop expansion (|probes| × |cities|) followed by a
probe-keyed argmin window. For city sets too big to broadcast, the
scale path is geohash bucketing (join on neighboring cells only) —
same shape as the LSH band join in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query


def _lat_duck(tag: str, key: str) -> str:
    h = _h60_duck(f"concat('{tag}lat:', CAST({key} AS VARCHAR))")
    return f"(({h} % 180000000) / 1000000.0 - 90.0)"


def _lon_duck(tag: str, key: str) -> str:
    h = _h60_duck(f"concat('{tag}lon:', CAST({key} AS VARCHAR))")
    return f"(({h} % 360000000) / 1000000.0 - 180.0)"


def _lat_spark(tag: str, col):
    h = h60(F.concat(F.lit(f"{tag}lat:"), col.cast("string")))
    return (h % 180_000_000) / 1_000_000.0 - 90.0


def _lon_spark(tag: str, col):
    h = h60(F.concat(F.lit(f"{tag}lon:"), col.cast("string")))
    return (h % 360_000_000) / 1_000_000.0 - 180.0


_HAV = (
    "round(2 * 6371.0 * asin(sqrt("
    "pow(sin(radians(({clat} - {plat}) / 2)), 2) + "
    "cos(radians({plat})) * cos(radians({clat})) * "
    "pow(sin(radians(({clon} - {plon}) / 2)), 2)"
    ")), 6)"
)


@query(
    "q_geo_nearest",
    oracle=f"""
    WITH probes AS (
      SELECT c_custkey,
             {_lat_duck("c", "c_custkey")} AS plat,
             {_lon_duck("c", "c_custkey")} AS plon
      FROM customer
    ),
    cities AS (
      SELECT n_nationkey, n_name,
             {_lat_duck("n", "n_nationkey")} AS clat,
             {_lon_duck("n", "n_nationkey")} AS clon
      FROM nation
    ),
    dists AS (
      SELECT c_custkey, n_nationkey, n_name,
             {_HAV.format(clat="clat", plat="plat", clon="clon", plon="plon")}
               AS dist_km,
             ROW_NUMBER() OVER (
               PARTITION BY c_custkey
               ORDER BY {_HAV.format(clat="clat", plat="plat", clon="clon", plon="plon")}
                          ASC NULLS LAST,
                        n_nationkey ASC NULLS LAST) AS rk
      FROM probes, cities
    )
    SELECT c_custkey, n_name AS city, dist_km
    FROM dists WHERE rk = 1
    """,
)
def q_geo_nearest(spark, sf_dir):
    """Nearest city per customer: deterministic synthetic lat/lon,
    haversine over a broadcast 25-city dimension, argmin as
    min(struct(rounded_dist, city_key, name)) — partial-aggregatable,
    so the exchange carries one candidate per probe per map task. The
    oracle expresses the same argmin as a ROW_NUMBER window (identical
    semantics given the rounding + unique tie-break)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    # cos(lat) factors precompute per SIDE (once per probe / per city,
    # below the join) instead of once per PAIR — same FP ops, same
    # bits, 2 fewer transcendentals on each of the |probes|·|cities|
    # expanded rows.
    probes = cust.select(
        "c_custkey",
        _lat_spark("c", F.col("c_custkey")).alias("plat"),
        _lon_spark("c", F.col("c_custkey")).alias("plon"),
    ).withColumn("cplat", F.cos(F.radians("plat")))
    cities = nat.select(
        "n_nationkey",
        "n_name",
        _lat_spark("n", F.col("n_nationkey")).alias("clat"),
        _lon_spark("n", F.col("n_nationkey")).alias("clon"),
    ).withColumn("cclat", F.cos(F.radians("clat")))
    dist = F.round(
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians((F.col("clat") - F.col("plat")) / 2)), 2)
                + F.col("cplat")
                * F.col("cclat")
                * F.pow(
                    F.sin(F.radians((F.col("clon") - F.col("plon")) / 2)), 2
                )
            )
        ),
        6,
    )
    # argmin as min over ONE encoded BIGINT: round(dist·1e6)·100 + key
    # packs (rounded distance, city-key tie-break) into a single
    # integer whose ordering IS the lexicographic struct ordering —
    # and unlike min(struct(...)), which Spark plans as a
    # SortAggregate (two Sorts over the expanded pairs), a bigint min
    # hash-aggregates with map-side combine. Decode is exact: the 6dp
    # round makes dist·1e6 integral, and l/1e6 is correctly-rounded
    # division, reproducing the identical double. Measured on sf0.1:
    # 1.24 s (row_number window) → 1.02 s (struct-min SortAggregate)
    # → 0.93 s (this form, hash agg + per-side cos precompute).
    enc = (
        F.round(dist * 1e6).cast("bigint") * 100 + F.col("n_nationkey")
    ).alias("enc")
    return (
        probes.crossJoin(F.broadcast(cities))
        .select("c_custkey", enc)
        .groupBy("c_custkey")
        .agg(F.min("enc").alias("enc"))
        .select(
            "c_custkey",
            F.pmod(F.col("enc"), F.lit(100)).cast("int").alias("n_nationkey"),
            (F.expr("enc div 100").cast("double") / 1e6).alias("dist_km"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")), "n_nationkey"
        )
        .select("c_custkey", F.col("n_name").alias("city"), "dist_km")
    )
