"""Set operations — SURVEY.md §2.7 (all Tier B, reference Cargo.toml:15).

UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] / DISTINCT. Spark maps
UNION → union + distinct, INTERSECT ALL → intersectAll, EXCEPT ALL →
exceptAll; Catalyst rewrites distinct set-ops into aggregates /
left-semi/anti joins — the same rewrites DF 19's optimizer does.

Scale notes: distinct set-ops are hash aggregations on the full row —
a shuffle keyed by every column. Keep projections narrow before the
set-op (done here: 1-2 columns) so the shuffle carries minimal bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_union",
    oracle="""
    SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
    UNION
    SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    """,
)
def q_union(spark, sf_dir):
    """UNION (distinct)."""
    c = load_table(spark, sf_dir, "customer").selectExpr("CAST(c_nationkey AS INT) AS nationkey")
    s = load_table(spark, sf_dir, "supplier").selectExpr("CAST(s_nationkey AS INT) AS nationkey")
    return c.union(s).distinct()


@query(
    "q_union_all",
    oracle="""
    SELECT o_orderkey AS k, 'o' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT l_orderkey AS k, 'l' AS src FROM lineitem WHERE l_linenumber = 1
    """,
)
def q_union_all(spark, sf_dir):
    """UNION ALL (bag union — no shuffle at all, pure concatenation)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderstatus = 'F'")
        .selectExpr("o_orderkey AS k", "'o' AS src")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter("l_linenumber = 1")
        .selectExpr("l_orderkey AS k", "'l' AS src")
    )
    return o.unionAll(li)


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_intersect(spark, sf_dir):
    """INTERSECT (distinct) — customers with both finished and open
    orders. Catalyst: left-semi join over distinct inputs."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter("o_orderstatus = 'F'").selectExpr("o_custkey AS custkey")
    op = o.filter("o_orderstatus = 'O'").selectExpr("o_custkey AS custkey")
    return f.intersect(op)


@query(
    "q_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q_except(spark, sf_dir):
    """EXCEPT (distinct) — customers minus big-order customers
    (unfiltered orders would make this empty in the fixture).
    Catalyst: left-anti join over distinct inputs."""
    c = load_table(spark, sf_dir, "customer").selectExpr("c_custkey AS custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter("o_totalprice > 300000")
        .selectExpr("o_custkey AS custkey")
    )
    return c.subtract(o)


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct(spark, sf_dir):
    """DISTINCT — hash aggregate on the projected columns only."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q_except_all",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey FROM orders
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY o_custkey
    """,
)
def q_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference with multiplicity: each customer
    keeps (total orders − finished orders) copies, unlike distinct
    EXCEPT which would drop any customer having even one finished
    order. Catalyst rewrites exceptAll to a count-propagating
    aggregate + generate (no join explosion); the trailing groupBy
    keeps the driver output compact."""
    o = load_table(spark, sf_dir, "orders")
    diff = o.select("o_custkey").exceptAll(
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )
    return diff.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY o_custkey
    """,
)
def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag intersection: each customer appears
    min(#high-value orders, #open orders) times. Same
    count-propagating rewrite as EXCEPT ALL."""
    o = load_table(spark, sf_dir, "orders")
    both = (
        o.filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
        .intersectAll(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )
    return both.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
