"""Bloom-filter semi-join reduction (r5) — beyond-reference scale
pattern: pre-filter a fact scan with a tiny bitmap built from the dim
side, so the fact table is reduced BEFORE any shuffle or join.

This is the runtime-filter pattern Spark itself applies as
``spark.sql.optimizer.runtime.bloomFilter.enabled`` and engines like
Trino/Velox inject as dynamic filters; here it is expressed as plain
DataFrame ops with a DETERMINISTIC md5-derived bloom (functions/
digest.py h60 family), so the whole construction — bit positions,
filter verdicts, false-positive count — is bit-reproducible in DuckDB
and carries an EXACT oracle. The query also PINS the bloom guarantee:
``n_missed`` (true members rejected by the filter) must be 0, and the
oracle computes the same 0.

Construction: m=4096 bits packed as 128 × 32-bit words in BIGINTs
(bit 31 max — keeps every intermediate positive on both engines; a
63-bit shift would hit DuckDB's signed-overflow error while Spark
wraps silently). k=3 hash functions = salted h60, ``pmod(h60(
'bloomJ:' || key), 4096)``.

100 TB design: the bloom is built from the (filtered) DIM side —
O(m) state, broadcastable at any scale; the fact side probes with
THREE BROADCAST HASH JOINS on word index (no explode → regroup, zero
fact shuffle). At real scale the ``n_bloom_pass`` subset is what you
feed the expensive shuffle join; FP rate here ((k·n/m)^k ≈ 1%) is the
knob the m/k parameters trade against bitmap size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query

_M = 4096  # bloom bits
_WORD = 32  # bits per packed word (31 max shift — safe on both engines)
_SEGMENT = "BUILDING"


def _duck_pos(j: int, expr: str) -> str:
    salted = f"concat('bloom{j}:', CAST({expr} AS VARCHAR))"
    return f"({_h60_duck(salted)} % {_M})"


def _spark_pos(j: int, col):
    return F.pmod(
        h60(F.concat(F.lit(f"bloom{j}:"), col.cast("string"))), F.lit(_M)
    )


@query(
    "q_join_bloom",
    oracle=f"""
    WITH dimkeys AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
    ),
    positions AS (
      SELECT {_duck_pos(0, "c_custkey")} AS pos FROM dimkeys
      UNION ALL SELECT {_duck_pos(1, "c_custkey")} FROM dimkeys
      UNION ALL SELECT {_duck_pos(2, "c_custkey")} FROM dimkeys
    ),
    bloom AS (
      SELECT pos // {_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % {_WORD})) AS bits
      FROM positions GROUP BY 1
    ),
    probed AS (
      SELECT o.o_orderkey,
             (d.c_custkey IS NOT NULL) AS exact_hit,
             (COALESCE(b0.bits, 0) & (CAST(1 AS BIGINT) << (o.pos0 % {_WORD}))) <> 0
               AND (COALESCE(b1.bits, 0) & (CAST(1 AS BIGINT) << (o.pos1 % {_WORD}))) <> 0
               AND (COALESCE(b2.bits, 0) & (CAST(1 AS BIGINT) << (o.pos2 % {_WORD}))) <> 0
               AS bloom_hit
      FROM (SELECT o_orderkey, o_custkey,
                   {_duck_pos(0, "o_custkey")} AS pos0,
                   {_duck_pos(1, "o_custkey")} AS pos1,
                   {_duck_pos(2, "o_custkey")} AS pos2
            FROM orders) o
      LEFT JOIN bloom b0 ON b0.word = o.pos0 // {_WORD}
      LEFT JOIN bloom b1 ON b1.word = o.pos1 // {_WORD}
      LEFT JOIN bloom b2 ON b2.word = o.pos2 // {_WORD}
      LEFT JOIN dimkeys d ON d.c_custkey = o.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(count_if(exact_hit) AS BIGINT) AS n_exact,
           CAST(count_if(bloom_hit) AS BIGINT) AS n_bloom_pass,
           CAST(count_if(bloom_hit AND NOT exact_hit) AS BIGINT) AS n_false_pass,
           CAST(count_if(exact_hit AND NOT bloom_hit) AS BIGINT) AS n_missed
    FROM probed
    """,
)
def q_join_bloom(spark, sf_dir):
    """Bloom-filter join pre-reduction: build a 4096-bit bloom over
    BUILDING-segment customer keys, probe every order via three
    broadcast word-lookups, and report exact vs bloom pass counts.
    ``n_missed`` = members the bloom rejected — pinned 0 by the bloom
    guarantee on BOTH engines; ``n_false_pass`` is the measured FP
    cost of pre-filtering with m/k = 4096/3."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    dimkeys = (
        cust.filter(F.col("c_mktsegment") == _SEGMENT)
        .select("c_custkey")
        .distinct()
    )
    positions = None
    for j in range(3):
        p = dimkeys.select(_spark_pos(j, F.col("c_custkey")).alias("pos"))
        positions = p if positions is None else positions.unionAll(p)
    bloom = positions.groupBy(
        (F.col("pos") / _WORD).cast("int").alias("word")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(cast(1 as bigint), cast(pmod(pos, {_WORD}) as int))")
        ).alias("bits")
    )

    probe = orders.select(
        "o_orderkey",
        "o_custkey",
        *[_spark_pos(j, F.col("o_custkey")).alias(f"pos{j}") for j in range(3)],
    )
    for j in range(3):
        b = bloom.select(
            F.col("word").alias(f"word{j}"), F.col("bits").alias(f"bits{j}")
        )
        probe = probe.join(
            F.broadcast(b),
            (F.col(f"pos{j}") / _WORD).cast("int") == F.col(f"word{j}"),
            "left",
        )
    hit = None
    for j in range(3):
        bitval = F.expr(
            f"shiftleft(cast(1 as bigint), cast(pmod(pos{j}, {_WORD}) as int))"
        )
        h = F.coalesce(F.col(f"bits{j}"), F.lit(0)).bitwiseAND(bitval) != 0
        hit = h if hit is None else (hit & h)

    probed = probe.join(
        F.broadcast(dimkeys.withColumn("present", F.lit(True))),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    ).select(
        F.coalesce(F.col("present"), F.lit(False)).alias("exact_hit"),
        hit.alias("bloom_hit"),
    )
    return probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.count_if(F.col("exact_hit")).cast("bigint").alias("n_exact"),
        F.count_if(F.col("bloom_hit")).cast("bigint").alias("n_bloom_pass"),
        F.count_if(F.col("bloom_hit") & ~F.col("exact_hit"))
        .cast("bigint")
        .alias("n_false_pass"),
        F.count_if(F.col("exact_hit") & ~F.col("bloom_hit"))
        .cast("bigint")
        .alias("n_missed"),
    )
