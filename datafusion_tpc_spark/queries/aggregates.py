"""Aggregations — SURVEY.md §2.4.

Tier A anchor: one multi-key grouped AVG (reference benches/query.rs:26
→ q_agg_avg in events.py). Everything else is DF 19's aggregate
surface reachable via ctx.sql (reference Cargo.toml:15): basic aggs,
DISTINCT aggs, ROLLUP/CUBE/GROUPING SETS, statistical aggs, median /
approx percentile (t-digest), approx_distinct (HLL), array_agg, HAVING.

Both engines execute grouped aggregation the same way: two-phase hash
aggregate (Partial map-side combine → shuffle by group key → Final) —
DF's AggregateExec Partial/FinalPartitioned ≡ Spark HashAggregateExec
partial/final.

Scale notes: shuffle volume is bounded by (distinct keys × partial
state), not input rows — the design scales to 100 TB as long as keys
fit the agg hash map per task (Spark spills to UnsafeExternalSorter
otherwise, automatically). DISTINCT aggs add an Expand (row
multiplication by #distinct-columns): keep them to the columns needed.
Approx sketches (HLL, percentile) exist precisely for the 100 TB path
— fixed-size state, no second shuffle; their constants differ across
engines so they are declared rows-only (†, SURVEY §5.2).

Cross-engine traps: DuckDB SUM(BIGINT) → HUGEINT (cast to BIGINT);
DuckDB var_samp/stddev of a single row → NULL in both (fine); float
aggregates rounded to 6dp on both sides per FIXTURES.md conventions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_agg_arrayagg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(array_agg(n_name)), '|') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_arrayagg(spark, sf_dir):
    """array_agg → collect_list, wrapped in array_sort on both sides
    (both engines' agg order is nondeterministic — SURVEY §2.4), then
    string-joined to a scalar: the external driver's hash canonicalizer
    (pandas sort_values) cannot factorize array-typed cells, so oracled
    output must never contain a bare array/map column. The raw
    array-typed form stays covered by a direct pytest case
    (tests/test_extensions.py::test_arrayagg_raw_array)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)                    AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT)           AS n_qty,
           ROUND(SUM(l_quantity), 6)                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 6)              AS sum_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
           ROUND(AVG(l_quantity), 6)                   AS avg_qty,
           ROUND(MIN(l_extendedprice), 6)              AS min_price,
           ROUND(MAX(l_extendedprice), 6)              AS max_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark, sf_dir):
    """TPC-H Q1-style: COUNT/SUM/MIN/MAX/AVG + computed aggregate
    expression over a filtered scan (SURVEY §2.4 q_agg_basic)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("l_quantity").alias("n_qty"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.min("l_extendedprice"), 6).alias("min_price"),
            F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           CAST(SUM(DISTINCT CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_distinct_floor
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark, sf_dir):
    """COUNT(DISTINCT)/SUM(DISTINCT) — Catalyst rewrites multi-distinct
    via Expand exactly like DF's single_distinct_to_groupby family."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.sum_distinct(F.floor("o_totalprice")).alias("sum_distinct_floor"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """ROLLUP + GROUPING() (DF supports GROUPING SETS since v16 —
    SURVEY §2.4). COALESCE over the grouping-null keeps the sentinel
    distinguishable from real data."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
            "sum_qty",
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark, sf_dir):
    """CUBE — all 4 grouping-set combinations."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("prio"),
            "n",
            "avg_price",
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot — Catalyst rewrites to the CASE-WHEN aggregation the
    oracle states. Explicit pivot values: the two-pass value-discovery
    scan is wasteful at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(stddev_pop(l_quantity), 6)  AS sdp_qty,
           ROUND(var_samp(l_quantity), 6)    AS var_qty,
           ROUND(var_pop(l_quantity), 6)     AS varp_qty,
           ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qp,
           ROUND(covar_pop(l_quantity, l_extendedprice), 6)  AS covp_qp,
           ROUND(corr(l_quantity, l_extendedprice), 6)       AS corr_qp
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark, sf_dir):
    """Statistical aggregates: stddev/var (samp+pop), covar, corr
    (SURVEY §2.4 q_agg_stats)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("cov_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias("covp_qp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
    )


@query(
    "q_agg_median",
    oracle="""
    SELECT o_orderstatus,
           ROUND(median(o_totalprice), 6) AS med_price,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.90), 6) AS p90
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_median(spark, sf_dir):
    """Exact median + continuous percentiles — DF 19 median /
    approx_percentile_cont; Spark median (≥3.4) and percentile()
    (exact, interpolating) match DuckDB quantile_cont exactly."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 6).alias("p90"),
    )


@query("q_agg_pctl")  # † rows-only: sketch constants differ (GK vs t-digest)
def q_agg_pctl(spark, sf_dir):
    """approx_percentile — DF 19 t-digest vs Spark GK sketch: same API
    shape, different constants → rows-only check (SURVEY §2.4 †)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.95).alias("approx_p95"),
    )


@query(
    "q_agg_pctl_w",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS w_median,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS w_p90
    FROM (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem, LATERAL (
        SELECT unnest(generate_series(1, CAST(l_quantity AS INT))) AS rep
      ) g
    )
    GROUP BY l_returnflag
    """,
)
def q_agg_pctl_w(spark, sf_dir):
    """Weighted percentile — DataFusion's
    approx_percentile_cont_with_weight (SURVEY §2.4). Spark ≥3.5
    percentile() takes a frequency column: each value counts weight
    times in the interpolated percentile. Exact on both engines — the
    oracle states the same multiset by repeating each row l_quantity
    times (fine at sf0.01; the SPARK side never expands — frequency is
    sketch-free aggregate state, the 100 TB shape). Both percentiles
    come from ONE percentile(…, array(0.5, 0.9), w) aggregate — a
    single sorted-state build instead of two independent ones (two
    separate calls each hold and sort the full per-group value
    multiset; measured ~2× slower)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("int")
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), w
    ).alias("pcts")
    return li.groupBy("l_returnflag").agg(pcts).select(
        "l_returnflag",
        F.round(F.col("pcts")[0], 6).alias("w_median"),
        F.round(F.col("pcts")[1], 6).alias("w_p90"),
    )


@query("q_agg_approxd")  # † rows-only: HLL constants differ
def q_agg_approxd(spark, sf_dir):
    """approx_distinct (HLL) — fixed-size sketch state, the 100 TB
    alternative to exact COUNT(DISTINCT)'s Expand+shuffle. Constants
    differ across engines → rows-only (SURVEY §2.4 †); the exact
    variant is oracled as q_agg_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 6) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 8 AND SUM(o_totalprice) > 100000
    """,
)
def q_agg_having(spark, sf_dir):
    """HAVING — post-aggregation filter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("total_spent"),
        )
        .filter((F.col("n_orders") > 8) & (F.col("total_spent") > 100000))
    )


@query(
    "q_udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf(spark, sf_dir):
    """User-defined aggregate — reference exposes create_udaf (Rust
    closures over Arrow arrays, SURVEY §2.11); Spark analog is a
    grouped-agg pandas_udf (Arrow-batched, one batch per group state).
    The oracle states the same math in plain SQL.

    Scale note: grouped-agg pandas UDFs still get partial aggregation
    disabled — all rows of a group cross the shuffle. Acceptable when
    group count × group size is bounded; for unbounded groups prefer
    an algebraic reformulation (as the oracle shows this one has)."""

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:  # type: ignore[misc]
        total = float(qty.sum())
        return float((price * qty).sum() / total) if total else float("nan")

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 6).alias("weighted_avg_price")
    )


@query(
    "q_agg_salted",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS total_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_salted(spark, sf_dir):
    """Two-phase SALTED aggregation (functions/skew.salted_aggregate):
    phase 1 aggregates on (key, salt) spreading each hot key over 16
    reducers, phase 2 merges the partials — the manual skew weapon for
    aggregation keys, which AQE does not salt (AQE splits skewed JOIN
    partitions only). Oracled exactly against the plain GROUP BY: the
    decomposition is algebraic for sum/count/min/max, and the 6-dp
    round absorbs double-summation-order differences. On this fixture
    the salt costs one extra (tiny) shuffle of 5×16 partial rows —
    at 100 TB with one dominant event_type it is the difference
    between one straggler reducer and 16 balanced ones."""
    from datafusion_tpc_spark.functions.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    out = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": "count",
            "total_value": "sum:value",
            "min_value": "min:value",
            "max_value": "max:value",
        },
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("total_value", 6).alias("total_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )
