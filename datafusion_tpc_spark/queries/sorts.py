"""Sorts / limits / top-k — SURVEY.md §2.6.

All Tier B (reference Cargo.toml:15; DF 19 SortExec with fetch fusion).
Spark equivalents: orderBy → SortExec (external/spilling via
UnsafeExternalSorter), ORDER BY + LIMIT fuses into
TakeOrderedAndProject, OFFSET native in 3.4+.

Cross-engine trap (SURVEY §2.6): default null ordering differs — DF/
DuckDB are NULLS LAST on ASC (Postgres style), Spark is NULLS FIRST.
Every ORDER BY here spells the null order explicitly on both sides.

Scale notes: a global ORDER BY is a range-partitioned shuffle
(sampling pass + range exchange) — fine at 100 TB because downstream
is a LIMIT; top-k specifically does per-partition partial top-k then
merges k·partitions rows on a single reducer, never the full data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_sort_multi",
    oracle="""
    WITH src AS (
      SELECT c_custkey, c_acctbal,
             NULLIF(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ),
    ranked AS (
      SELECT c_custkey, c_acctbal, seg,
             row_number() OVER (ORDER BY seg ASC NULLS FIRST,
                                c_acctbal DESC NULLS LAST,
                                c_custkey ASC NULLS LAST) AS pos
      FROM src
    )
    SELECT c_custkey, c_acctbal, seg, CAST(pos AS BIGINT) AS pos FROM ranked
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key ORDER BY with explicit NULLS FIRST/LAST and a
    synthesized NULL column; the row_number makes the sort order
    observable under the driver's order-insensitive hash."""
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    src = c.select(
        "c_custkey", "c_acctbal", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    w = Window.orderBy(
        F.col("seg").asc_nulls_first(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc_nulls_last(),
    )
    return src.withColumn("pos", F.row_number().over(w).cast("bigint"))


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey ASC NULLS LAST
    LIMIT 100 OFFSET 25
    """,
)
def q_limit(spark, sf_dir):
    """LIMIT + OFFSET over a deterministic total order (unique key)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_orderkey").asc_nulls_last())
        .offset(25)
        .limit(100)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
    LIMIT 50
    """,
)
def q_topk(spark, sf_dir):
    """Top-k — ORDER BY … LIMIT k. DF 19 fuses the fetch into SortExec;
    Spark plans TakeOrderedAndProject (partial top-k per partition,
    merge on driver — the only safe 'collect-like' pattern at scale).
    Unique-key tiebreak keeps the result deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last())
        .limit(50)
    )


@query(
    "q_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC NULLS LAST,
                                         o_orderkey ASC NULLS LAST) AS rn
      FROM orders
    )
    WHERE rn <= 2
    """,
)
def q_topk_group(spark, sf_dir):
    """Grouped top-k — the top-2 orders per customer via row_number +
    filter, the per-entity-leaderboard workhorse. Spark 4 compiles
    this shape to WindowGroupLimit (tests/test_plans.py): each map
    task keeps only k rows per group BEFORE the shuffle, so shuffle
    bytes are k×|groups|, not the full table — the grouped analog of
    TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )
