"""Deterministic mergeable sketches II (round 7) — HyperLogLog and
Count-Min, completing the sketch family of operators/sketches.py
(Misra-Gries, KMV) and queries/stats_ext.py (theta, t-digest†) with
the two classics every telemetry/aggregation service ships. Both are
built from the repo's md5/h60 hash family, so — unusually for
sketches — the APPROXIMATE estimates carry EXACT DuckDB oracles: the
same registers and the same counters materialize on both engines
bit-for-bit (the q_agg_theta precedent, extended to integer-only
register math so not even a float sum order can diverge).

The reference has no sketches (its only aggregate surface is
DataFusion's built-ins, SURVEY §2.4); this is beyond-reference
surface for the 100 TB telemetry tier.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query

# ---- HyperLogLog ------------------------------------------------------

_P = 8                      # 2^8 = 256 registers
_M = 1 << _P
_WBITS = 60 - _P            # 52 value bits per hash
# alpha_256 = 0.7213 / (1 + 1.079/m); computed once in Python and
# embedded via repr on BOTH sides so the engines share the literal.
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)
_POW53 = float(1 << 53)    # exact power of two


@query(
    "q_agg_hll",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT {_h60_duck("concat('hll:', CAST(o_custkey AS VARCHAR))")} AS hv
      FROM orders
    ),
    regs AS (
      SELECT hv >> {_WBITS} AS bucket,
             CASE WHEN hv % (CAST(1 AS BIGINT) << {_WBITS}) = 0
                  THEN {_WBITS + 1}
                  ELSE {_WBITS + 1}
                       - length(bin(hv % (CAST(1 AS BIGINT) << {_WBITS})))
             END AS rho
      FROM h
    ),
    mx AS (
      SELECT bucket, MAX(rho) AS m FROM regs GROUP BY bucket
    ),
    z AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS present,
             SUM(CAST(1 AS BIGINT) << (53 - m)) AS zpart
      FROM mx
    ),
    ex AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM orders
    )
    SELECT ex.n_exact,
           ROUND(CAST({_ALPHA!r} AS DOUBLE) * CAST({_M * _M} AS DOUBLE)
                 * CAST({_POW53!r} AS DOUBLE)
                 / CAST(z.zpart + ({_M} - z.present)
                        * (CAST(1 AS BIGINT) << 53) AS DOUBLE), 6)
             AS hll_est
    FROM z, ex
    """,
)
def q_agg_hll(spark, sf_dir):
    """HyperLogLog distinct-customer estimate (p=8, 256 registers)
    against the exact count. Register math is INTEGER-only end to end:
    bucket = top 8 bits of h60, rho = 53 − bit-length of the low 52
    bits (via bin()-string length — no transcendental log), and the
    harmonic denominator Z is accumulated as Σ 2^(53−M) in BIGINT
    (adding 2^53 per empty register), so the only float ops are the
    final alpha·m²·2^53 / Z division — one deterministic IEEE divide.
    No small/large-range correction: n ≫ 2.5·m here; the correction
    branch is a CASE on the same integers at production m.

    100 TB: registers are a 256-key map-side-combinable MAX agg —
    the canonical mergeable-state distinct counter (KMV twin:
    q_agg_kmv; exactness comparison rides in the output). Standard
    error 1.04/√256 ≈ 6.5%, pytest-pinned at <10% relative error."""
    o = load_table(spark, sf_dir, "orders")
    hv = (
        o.select(
            h60(F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))).alias(
                "hv"
            )
        )
        .distinct()
    )
    w = F.col("hv") % F.lit(1 << _WBITS).cast("long")
    regs = hv.select(
        F.shiftright("hv", _WBITS).alias("bucket"),
        F.when(w == 0, F.lit(_WBITS + 1))
        .otherwise(F.lit(_WBITS + 1) - F.length(F.bin(w)))
        .alias("rho"),
    )
    mx = regs.groupBy("bucket").agg(F.max("rho").alias("m"))
    z = mx.agg(
        F.count(F.lit(1)).cast("bigint").alias("present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m)")).alias("zpart"),
    )
    ex = o.agg(F.countDistinct("o_custkey").cast("bigint").alias("n_exact"))
    zint = F.col("zpart") + (F.lit(_M) - F.col("present")) * F.lit(1 << 53).cast(
        "long"
    )
    return ex.crossJoin(z).select(
        "n_exact",
        F.round(
            F.lit(_ALPHA)
            * F.lit(float(_M * _M))
            * F.lit(_POW53)
            / zint.cast("double"),
            6,
        ).alias("hll_est"),
    )


# ---- Count-Min --------------------------------------------------------

_D = 4    # hash rows
_W = 64   # cells per row


@query(
    "q_agg_cms",
    oracle=f"""
    WITH cells AS (
      SELECT i, {_h60_duck("concat('cms', CAST(i AS VARCHAR), ':', event_type)")}
                 % {_W} AS cell,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events, (SELECT unnest(range({_D})) AS i) g
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY event_type
    ),
    est AS (
      SELECT p.event_type, p.exact_cnt, MIN(c.cnt) AS cms_est
      FROM probes p, (SELECT unnest(range({_D})) AS i) g, cells c
      WHERE c.i = g.i
        AND c.cell = {_h60_duck("concat('cms', CAST(g.i AS VARCHAR), ':', p.event_type)")}
                     % {_W}
      GROUP BY 1, 2
    )
    SELECT event_type, exact_cnt, cms_est,
           cms_est - exact_cnt AS overcount
    FROM est
    ORDER BY event_type ASC NULLS LAST
    """,
)
def q_agg_cms(spark, sf_dir):
    """Count-Min sketch (d=4 rows × w=64 cells) of event-type
    frequencies, probed for every type against its exact count. The
    sketch build is one explode(d) + (row, cell) counting agg — the
    mergeable O(d·w) state a streaming counter keeps; the probe takes
    MIN across the d rows (one-sided error: overcount ≥ 0, pinned in
    pytest). All counters are integers; the estimate is exact-oracled
    because the hash family is the repo's md5/h60.

    100 TB: the d·w counter grid is map-side combinable and
    independent of key cardinality — the point of CMS over an exact
    groupBy when keys are unbounded (URLs, IPs); here event_type is
    small so the exact side is cheap enough to compare against."""
    e = load_table(spark, sf_dir, "events")
    rows = F.explode(F.array(*[F.lit(i) for i in range(_D)])).alias("i")
    cells = (
        e.select("event_type")
        .select("event_type", rows)
        .select(
            "i",
            (
                h60(
                    F.concat(
                        F.lit("cms"),
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("event_type"),
                    )
                )
                % _W
            ).alias("cell"),
        )
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    probes = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .select("event_type", "exact_cnt", rows)
        .select(
            "event_type",
            "exact_cnt",
            "i",
            (
                h60(
                    F.concat(
                        F.lit("cms"),
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("event_type"),
                    )
                )
                % _W
            ).alias("cell"),
        )
    )
    est = (
        probes.join(F.broadcast(cells), ["i", "cell"])
        .groupBy("event_type", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "event_type",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.col("event_type").asc_nulls_last())
