"""Skyline / Pareto-frontier operator (r5) — beyond-reference
analytics: the maximal vector set under dominance, the classic
"best suppliers on every axis at once" query neither engine has as a
built-in (SKYLINE OF was proposed for SQL but never standardized).

Semantics: point a DOMINATES b iff a >= b on every dimension and
a > b on at least one. The skyline is the set of non-dominated
points. Dimensions here are per-supplier INTEGER activity metrics
(distinct parts, distinct orders, shipment count) — integer dominance
compares are exact cross-engine, dodging the float-sum boundary that
a revenue dimension would introduce.

100 TB design (block-nested-loop skyline with local pruning):
1. one fact shuffle aggregates lineitem → per-supplier points
   (supplier-bound cardinality, not corpus-bound);
2. a LOCAL skyline prune per partition (mapInPandas, vectorized
   O(p²) on the partition's points only) — correct because dominance
   is transitive: any dominator of a discarded point is itself in
   that partition's local skyline, so the union of local skylines is
   a superset of the global skyline;
3. the bounded candidate set self-anti-joins under the dominance
   predicate (BroadcastNestedLoopJoin on candidate² — quadratic only
   in the pruned candidate count, never in the input).
The oracle is the direct NOT EXISTS dominance query over all points.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query

_DIMS = ("n_parts", "n_orders", "n_items")


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Drop every point dominated by another point in this partition.
    Vectorized per point: one boolean reduction over the partition's
    (small, supplier-bound) point matrix."""
    for pdf in batches:
        if pdf.empty:
            yield pdf
            continue
        m = pdf[list(_DIMS)].to_numpy()
        keep = []
        for i in range(len(pdf)):
            ge = (m >= m[i]).all(axis=1)
            gt = (m > m[i]).any(axis=1)
            keep.append(not bool((ge & gt).any()))
        yield pdf[pd.Series(keep, index=pdf.index)]


@query(
    "q_skyline",
    oracle="""
    WITH pts AS (
      SELECT l_suppkey AS suppkey,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY 1
    )
    SELECT suppkey, n_parts, n_orders, n_items
    FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.n_parts >= a.n_parts AND b.n_orders >= a.n_orders
        AND b.n_items >= a.n_items
        AND (b.n_parts > a.n_parts OR b.n_orders > a.n_orders
             OR b.n_items > a.n_items)
    )
    ORDER BY suppkey ASC NULLS LAST
    """,
)
def q_skyline(spark, sf_dir):
    """Pareto frontier of suppliers over (distinct parts, distinct
    orders, shipments): aggregate → per-partition local skyline prune
    (mapInPandas; transitivity makes the local pass lossless) → self
    anti-join of the bounded candidate set under the dominance
    predicate. Oracle is the direct NOT EXISTS over all points."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
    schema = "suppkey bigint, n_parts bigint, n_orders bigint, n_items bigint"
    cand = pts.mapInPandas(_local_skyline, schema)
    dom = cand.select(
        *[F.col(c).alias(f"d_{c}") for c in ("suppkey", *_DIMS)]
    )
    dominated = (
        (F.col("d_n_parts") >= F.col("n_parts"))
        & (F.col("d_n_orders") >= F.col("n_orders"))
        & (F.col("d_n_items") >= F.col("n_items"))
        & (
            (F.col("d_n_parts") > F.col("n_parts"))
            | (F.col("d_n_orders") > F.col("n_orders"))
            | (F.col("d_n_items") > F.col("n_items"))
        )
    )
    return (
        cand.join(F.broadcast(dom), dominated, "left_anti")
        .orderBy(F.col("suppkey").asc_nulls_last())
    )
