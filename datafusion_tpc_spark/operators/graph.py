"""Iterative graph algorithms (r5) — beyond-reference extension
completing the iterative-fixpoint family started by
``q_dedup_clusters`` (label-propagation connected components,
dedup.py). The reference has no graph surface; the point here is the
ENGINE shape: synchronous iterative computation expressed as a Python
loop over DataFrame transforms with per-round plan truncation —
Spark's answer to DataFusion's absent recursion (DF 19 parses
WITH RECURSIVE but cannot execute it; SURVEY §2.9).

q_graph_pagerank runs a FIXED 5 iterations so the result is
deterministic and carries an EXACT oracle: the DuckDB side unrolls
the same five update steps as chained CTEs — identical arithmetic,
engine-independent. (Run-to-convergence is the production mode; a
fixed iteration count is the oracle-able twin, same per-round plan.)

Graph: the customer↔supplier trade graph — nodes are customers and
suppliers (disambiguated by a 'c'/'s' prefix), with an undirected
edge per distinct (customer, supplier) trading pair mined from
orders⋈lineitem. Undirected (both directions materialized) so every
node has out-degree ≥ 1 — no dangling-mass correction term needed and
the teleport constant is the only non-edge flow.

100 TB design: per iteration = one join of edges⋈ranks on src (both
hash-partitioned on src — co-partitioned after the first round) + one
groupBy dst shuffle; rank state is |nodes| rows, edge state |edges|
rows, nothing driver-side except the node-count scalar (a single
bounded count, same class as similarity.py's 256-row sample).
localCheckpoint(eager) per round truncates the logical plan — without
it round k replans rounds 1..k-1 (the q_dedup_clusters lesson,
dedup.py:559).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query

_DAMP = 0.85
_ITERS = 5

# Shared subgraph text: distinct trading pairs → undirected edges.
_GRAPH_CTE = """
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT concat('c', CAST(ck AS VARCHAR)) AS src,
             concat('s', CAST(sk AS VARCHAR)) AS dst FROM cs
      UNION ALL
      SELECT concat('s', CAST(sk AS VARCHAR)) AS src,
             concat('c', CAST(ck AS VARCHAR)) AS dst FROM cs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)
"""


def _iter_cte(i: int) -> str:
    """One unrolled PageRank update: r{i} from r{i-1}."""
    return f"""
    r{i} AS (
      SELECT e.dst AS node,
             0.15 / ANY_VALUE(nn.n) + 0.85 * SUM(r.rank / d.d) AS rank
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg d ON e.src = d.src, nn
      GROUP BY e.dst
    )"""


_PAGERANK_SQL = (
    _GRAPH_CTE
    + """,
    r0 AS (SELECT deg.src AS node, 1.0 / nn.n AS rank FROM deg, nn),"""
    + ",".join(_iter_cte(i) for i in range(1, _ITERS + 1))
    + f"""
    SELECT node, ROUND(ANY_VALUE(rank) * ANY_VALUE(nn.n), 6) AS rank_norm
    FROM r{_ITERS}, nn
    GROUP BY node
    ORDER BY rank_norm DESC NULLS LAST, node ASC NULLS LAST
    LIMIT 100
"""
)


@query("q_graph_pagerank", oracle=_PAGERANK_SQL)
def q_graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 5 fixed iterations) over the
    customer↔supplier trade graph; returns the top-100 nodes by
    normalized rank (rank × |nodes|, so the mean is 1.0 and six
    rounded decimals carry six significant figures — raw ranks at
    ~1/|nodes| would waste the ROUND(6) convention's precision).

    The oracle unrolls the identical five update steps as chained
    DuckDB CTEs; per-step arithmetic (teleport + damped degree-
    normalized sum) matches term-for-term, so agreement is limited
    only by float sum order — ~1e-12 relative after 5 rounds, nine
    orders under the rounding granularity."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    cnode = F.concat(F.lit("c"), F.col("ck").cast("string"))
    snode = F.concat(F.lit("s"), F.col("sk").cast("string"))
    edges = (
        cs.select(cnode.alias("src"), snode.alias("dst"))
        .unionAll(cs.select(snode.alias("src"), cnode.alias("dst")))
        .localCheckpoint(eager=True)  # mined once, reused every round
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
    n_nodes = deg.count()  # bounded driver scalar: |customers|+|suppliers|
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(_ITERS):
        ranks = (
            edges.join(ranks, edges.src == F.col("node"))
            .join(deg, "src")
            .groupBy("dst")
            .agg(
                (
                    F.lit(0.15 / n_nodes)
                    + F.lit(_DAMP) * F.sum(F.col("rank") / F.col("d"))
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
            .localCheckpoint(eager=True)  # truncate the per-round plan
        )
    return (
        ranks.select(
            "node", F.round(F.col("rank") * n_nodes, 6).alias("rank_norm")
        )
        .orderBy(F.col("rank_norm").desc_nulls_last(), F.col("node").asc_nulls_last())
        .limit(100)
    )
