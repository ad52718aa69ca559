"""Predicate algebra & conditional expressions — SURVEY.md §2.2.

Tier A surface is a single string-equality filter (reference
benches/query.rs:25); Tier B is the full sqlparser-0.30 predicate
algebra reachable through ``ctx.sql`` (reference benches/query.rs:43,
Cargo.toml:15): AND/OR/NOT, BETWEEN, IN, LIKE, IS [NOT] NULL,
CASE WHEN, CAST/TRY_CAST, COALESCE/NULLIF.

Scale notes: every predicate here is a row-local expression inside
whole-stage codegen — no shuffle. Conjunctive parts push down to the
Parquet row-group level (PushedFilters); the testdata has no NULLs, so
null semantics are exercised by synthesizing NULLs with NULLIF (same
expression on the oracle side).

Cross-engine trap encoded here: double→int CAST truncates in Spark but
rounds in DuckDB — all declared queries floor() explicitly first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_pred_algebra",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20)
       OR (NOT (l_linestatus = 'O')
           AND l_discount IN (0.05, 0.07)
           AND l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01')
       OR (l_tax IS NULL)
    """,
)
def q_pred_algebra(spark, sf_dir):
    """Full boolean algebra: AND/OR/NOT, BETWEEN, IN-list, range
    comparison, IS NULL (SURVEY §2.2 Tier B)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R") & F.col("l_quantity").between(10, 20))
        | (
            (~(F.col("l_linestatus") == "O"))
            & F.col("l_discount").isin(0.05, 0.07)
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        | F.col("l_tax").isNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "q_pred_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority LIKE '%URGENT'
       OR o_orderpriority LIKE '_-HIGH'
       OR o_orderpriority ILIKE '%medium%'
       OR (o_orderstatus NOT LIKE 'F%' AND o_orderpriority LIKE '%LOW%')
    """,
)
def q_pred_like(spark, sf_dir):
    """LIKE / NOT LIKE / ILIKE with % and _ wildcards (SURVEY §2.2;
    DF 19 via sqlparser 0.30; ILIKE in Spark ≥3.3)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").like("%URGENT")
        | F.col("o_orderpriority").like("_-HIGH")
        | F.col("o_orderpriority").ilike("%medium%")
        | ((~F.col("o_orderstatus").like("F%")) & F.col("o_orderpriority").like("%LOW%"))
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@query(
    "q_case_cast",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_word,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_num,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_back,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
           CAST(o_orderkey AS VARCHAR) AS key_str
    FROM orders
    """,
)
def q_case_cast(spark, sf_dir):
    """CASE WHEN, CAST, TRY_CAST, COALESCE, NULLIF (SURVEY §2.2).
    floor() before the int cast — Spark truncates double→int, DuckDB
    rounds, floor makes them agree.

    prio_num states TRY_CAST semantics (malformed string → NULL) but
    compiles to a regex-guarded plain cast: Spark's TryCast evaluates
    string→int by throwing and catching a JVM exception PER failing
    row — on a column where every value is malformed ('1-URGENT') that
    measured 0.72 s of the query's 0.70 s total at sf0.1, ~7× the cost
    of the whole rest of the plan. The rlike guard short-circuits the
    non-numeric rows for free inside codegen. The genuine try_cast
    builtin stays exercised on key_back (a round-trip that always
    succeeds — the fast, exception-free path)."""
    o = load_table(spark, sf_dir, "orders")
    is_int = F.col("o_orderpriority").rlike("^[+-]?[0-9]+$")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.when(is_int, F.col("o_orderpriority").cast("int")).alias("prio_num"),
        F.expr("try_cast(cast(o_orderkey AS string) AS BIGINT)").alias("key_back"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_or_pending"
        ),
        F.col("o_orderkey").cast("string").alias("key_str"),
    )
