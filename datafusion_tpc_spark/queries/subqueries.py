"""Subqueries & CTEs — SURVEY.md §2.9 (Tier B; DF 19 decorrelation
rules decorrelate_where_exists / decorrelate_where_in /
scalar_subquery_to_join ≡ Catalyst RewritePredicateSubquery + scalar
subquery rewrites; reference Cargo.toml:15).

EXISTS/NOT EXISTS land in joins.py (q_join_semi / q_join_anti); here:
IN (subquery), scalar subqueries (correlated + uncorrelated), CTEs.

These run as SQL text through spark.sql — the same entry point the
reference exposes (ctx.sql, benches/query.rs:43) — over temp views,
exercising Catalyst's decorrelation the way DF's optimizer is
exercised. Decorrelation turns each subquery into a join; scale
behavior is that of the resulting join (see joins.py notes).
"""

from __future__ import annotations

from datafusion_tpc_spark.catalog import register_tables
from datafusion_tpc_spark.registry import query


@query(
    "q_sub_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    AND o_orderstatus = 'O'
    """,
)
def q_sub_in(spark, sf_dir):
    """IN (subquery) → left semi join after decorrelation."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        AND o_orderstatus = 'O'
        """
    )


@query(
    "q_sub_notin",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
)
def q_sub_notin(spark, sf_dir):
    """NOT IN (subquery) — null-aware anti join in both engines
    (SURVEY §2.3 ⚠; keys here are non-null so semantics coincide with
    plain anti join, and the oracle pins it). Threshold chosen so the
    result is non-empty at every fixture scale."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        )
        """
    )


@query(
    "q_sub_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 6)
             AS diff_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
    """,
)
def q_sub_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery in both SELECT and WHERE —
    DF scalar_subquery_to_join; Spark evaluates once and broadcasts."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 6)
                 AS diff_from_avg
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
        """
    )


@query(
    "q_sub_corr_scalar",
    oracle="""
    SELECT c.c_custkey,
           ROUND((SELECT MAX(o.o_totalprice) FROM orders o
                  WHERE o.o_custkey = c.c_custkey), 6) AS max_order
    FROM customer c
    WHERE c.c_acctbal > 9500
    """,
)
def q_sub_corr_scalar(spark, sf_dir):
    """Correlated scalar subquery → decorrelated to an aggregate +
    left outer join (both engines)."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey,
               ROUND((SELECT MAX(o.o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 6) AS max_order
        FROM customer c
        WHERE c.c_acctbal > 9500
        """
    )


_GSETS_SQL = """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS prio,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("q_agg_gsets", oracle=_GSETS_SQL)
def q_agg_gsets(spark, sf_dir):
    """Explicit GROUPING SETS (DF supports since v16 — SURVEY §2.4);
    identical SQL text runs on both engines."""
    register_tables(spark, sf_dir)
    return spark.sql(_GSETS_SQL)


@query(
    "q_cte",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice > 30000
      GROUP BY o_custkey
    ),
    segments AS (
      SELECT c_custkey, c_mktsegment FROM customer
    )
    SELECT s.c_mktsegment,
           CAST(SUM(b.n) AS BIGINT) AS big_order_count
    FROM big_orders b
    JOIN segments s ON b.o_custkey = s.c_custkey
    GROUP BY s.c_mktsegment
    """,
)
def q_cte(spark, sf_dir):
    """CTEs (WITH) — sqlparser 0.30 surface; Catalyst inlines."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n
          FROM orders WHERE o_totalprice > 30000
          GROUP BY o_custkey
        ),
        segments AS (
          SELECT c_custkey, c_mktsegment FROM customer
        )
        SELECT s.c_mktsegment,
               CAST(SUM(b.n) AS BIGINT) AS big_order_count
        FROM big_orders b
        JOIN segments s ON b.o_custkey = s.c_custkey
        GROUP BY s.c_mktsegment
        """
    )
