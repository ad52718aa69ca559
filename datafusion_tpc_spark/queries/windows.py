"""Window functions — SURVEY.md §2.5 (all Tier B; DF 19 WindowAggExec/
BoundedWindowAggExec via reference Cargo.toml:15).

Ranking (row_number/rank/dense_rank/percent_rank/cume_dist/ntile),
analytic (lag/lead/first_value/last_value/nth_value), aggregates over
ROWS and RANGE frames — all native in both engines.

Determinism: every ORDER BY inside a window carries a unique-key
tiebreak so frame contents are reproducible across engines (SURVEY §5).

Scale notes: a window partitioned by a key is one shuffle on that key
+ a per-partition sort; partitions must fit an executor's sort buffer
(spills otherwise). A window with NO partition key is a single-task
bottleneck — never used here except implicitly nowhere; all declared
windows partition on real keys.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number()   OVER w AS BIGINT) AS rn,
           CAST(rank()         OVER w AS BIGINT) AS rnk,
           CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 6)       AS prnk,
           ROUND(cume_dist()    OVER w, 6)       AS cdist,
           CAST(ntile(4)       OVER w AS INT)    AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST)
    """,
)
def q_win_rank(spark, sf_dir):
    """All six ranking functions over one window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "q_win_lag",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           lag(l_quantity)      OVER w AS prev_qty,
           lead(l_quantity)     OVER w AS next_qty,
           lag(l_quantity, 2, -1.0) OVER w AS prev2_qty_default,
           first_value(l_quantity) OVER w AS first_qty,
           last_value(l_quantity)  OVER (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber ASC NULLS LAST,
                                                  l_partkey ASC NULLS LAST,
                                                  l_suppkey ASC NULLS LAST,
                                                  l_quantity ASC NULLS LAST,
                                                  l_extendedprice ASC NULLS LAST
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_qty,
           nth_value(l_quantity, 2) OVER (PARTITION BY l_orderkey
                                          ORDER BY l_linenumber ASC NULLS LAST,
                                                   l_partkey ASC NULLS LAST,
                                                   l_suppkey ASC NULLS LAST,
                                                   l_quantity ASC NULLS LAST,
                                                   l_extendedprice ASC NULLS LAST
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING) AS second_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber ASC NULLS LAST,
                          l_partkey ASC NULLS LAST,
                          l_suppkey ASC NULLS LAST,
                          l_quantity ASC NULLS LAST,
                          l_extendedprice ASC NULLS LAST)
    """,
)
def q_win_lag(spark, sf_dir):
    """Analytic functions: lag/lead (with offset+default), first/last/
    nth value. last_value and nth_value use explicit unbounded frames:
    Spark evaluates nth_value over the whole partition regardless of
    the default frame while DuckDB honors the growing frame — the
    explicit frame is the only portable form."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the fixture — the
    # full tiebreak chain makes frame contents engine-independent.
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").asc_nulls_last(),
        F.col("l_partkey").asc_nulls_last(),
        F.col("l_suppkey").asc_nulls_last(),
        F.col("l_quantity").asc_nulls_last(),
        F.col("l_extendedprice").asc_nulls_last(),
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.lag("l_quantity", 2, -1.0).over(w).alias("prev2_qty_default"),
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w_full).alias("last_qty"),
        F.nth_value("l_quantity", 2).over(w_full).alias("second_qty"),
    )


@query(
    "q_win_movavg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC NULLS LAST,
                                                  o_orderkey ASC NULLS LAST
                                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
             AS moving_avg,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC NULLS LAST,
                                                  o_orderkey ASC NULLS LAST
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS running_total
    FROM orders
    """,
)
def q_win_movavg(spark, sf_dir):
    """Aggregate-over-window with ROWS frames: 4-row moving average +
    running total (SURVEY §2.5 q_win_movavg)."""
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(base.rowsBetween(-3, 0)), 6).alias("moving_avg"),
        F.round(
            F.sum("o_totalprice").over(base.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("running_total"),
    )


@query(
    "q_win_range",
    oracle="""
    SELECT p_partkey, p_size, p_retailprice,
           CAST(COUNT(*) OVER (ORDER BY p_size ASC NULLS LAST
                               RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
             AS n_similar_size,
           ROUND(AVG(p_retailprice) OVER (ORDER BY p_size ASC NULLS LAST
                                          RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6)
             AS avg_price_similar
    FROM part
    """,
)
def q_win_range(spark, sf_dir):
    """RANGE BETWEEN frame on a numeric ordering — frame membership by
    value distance, not row position. (Unpartitioned: `part` is a
    dimension table; on a fact table this would need a partition key.)"""
    p = load_table(spark, sf_dir, "part")
    w = Window.orderBy(F.col("p_size").asc_nulls_last()).rangeBetween(-2, 2)
    return p.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.count(F.lit(1)).over(w).alias("n_similar_size"),
        F.round(F.avg("p_retailprice").over(w), 6).alias("avg_price_similar"),
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(c_acctbal, 2) AS c_acctbal,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           ROUND(FIRST_VALUE(c_acctbal) OVER (w ROWS BETWEEN UNBOUNDED
             PRECEDING AND UNBOUNDED FOLLOWING), 2) AS nation_min_bal,
           ROUND(LAST_VALUE(c_acctbal) OVER (w ROWS BETWEEN UNBOUNDED
             PRECEDING AND UNBOUNDED FOLLOWING), 2) AS nation_max_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal ASC NULLS LAST, c_custkey ASC NULLS LAST)
    """,
)
def q_win_dist(spark, sf_dir):
    """Distribution window functions — NTILE / PERCENT_RANK /
    CUME_DIST plus FIRST/LAST_VALUE over an explicit full-partition
    frame (the default frame stops at CURRENT ROW, which would make
    LAST_VALUE degenerate). Ordering carries the c_custkey tiebreak
    so ties rank identically on both engines.

    Scale: one hash-partition exchange on c_nationkey, then all five
    functions evaluate in a single WindowExec pass over each sorted
    partition — adding functions to the same window is free."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc_nulls_last(), F.col("c_custkey").asc_nulls_last()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("c_acctbal").over(w_full), 2).alias("nation_min_bal"),
        F.round(F.last("c_acctbal").over(w_full), 2).alias("nation_max_bal"),
    )


@query(
    "q_win_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS LAST,
                   event_id ASC NULLS LAST)
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC NULLS LAST,
                                             event_id ASC NULLS LAST
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def q_win_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization — the pure-window twin of the
    engine-native session_window (q_evt_session): LAG marks gaps
    > 30 min, a running SUM of the marks numbers the islands, and a
    grouped count sizes each session. Ties on ts break by event_id so
    LAG order is deterministic cross-engine. The two formulations
    must agree on session COUNT per user (pinned against
    q_evt_session's gap semantics in spirit; the window form also
    works where session_window doesn't — e.g. assigning the session
    id back onto EVERY event row without a join).

    Scale: one hash exchange on user_id serves both window passes and
    the final aggregation (same partitioning reused across stages —
    Catalyst plans a single shuffle); state is one row per
    (user, open island), never the whole history."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    # microsecond-exact gap compare (a seconds cast truncates and can
    # disagree with the oracle at sub-second boundaries); tie-break the
    # running sum by event_id so duplicate-ts rows order identically
    # ts reads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
    # cast is value-identity under the UTC session tz
    # (catalog.configure_runtime)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "new_session", F.when(gap > 1_800_000_000, 1).otherwise(0)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = marked.withColumn(
        "session_seq", F.sum("new_session").over(wrun).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@query(
    "q_win_ema",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts ASC NULLS LAST,
                                         event_id ASC NULLS LAST) AS rn
      FROM events
    )
    SELECT a.event_id, a.user_id, a.ts, a.value,
           ROUND(0.2 * SUM(COALESCE(b.value, 0) * pow(0.8, a.rn - b.rn)), 6) AS ema
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 31 AND a.rn
    GROUP BY a.event_id, a.user_id, a.ts, a.value
    """,
)
def q_win_ema(spark, sf_dir):
    """Truncated exponential moving average (α=0.2, 32-step lookback)
    per user over (ts, event_id) order — the time-series smoothing
    shape recursive EMA needs, made window-expressible by truncation
    (the weight tail below 0.8^31 ≈ 1e-3 is dropped BY DEFINITION on
    both engines, so the truncation is parity-exact, not an
    approximation error).

    Spark plan: ONE user_id exchange → WindowExec collect_list over a
    bounded 32-row frame → JVM aggregate() lambda folds the frame
    with positional weights — no self-join, no Python. The oracle
    computes the same weighted sum via a bounded rn-band self-join
    (DuckDB has no positional fold over window frames). Float-sum
    order differs between the fold and SUM(); ROUND(…, 6) absorbs it
    per repo convention."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last())
        .rowsBetween(-31, 0)
    )
    # COALESCE(value, 0) on BOTH sides: collect_list silently drops
    # NULLs, which would shift every positional weight after a null —
    # the fixture has no null values today, but a future drop must
    # not turn this into a silent weight misalignment.
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        F.collect_list(F.coalesce(F.col("value"), F.lit(0.0))).over(w).alias("vals"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr(
            "round(0.2 * aggregate(vals,"
            " struct(cast(0.0 as double) as s, 0 as i),"
            " (acc, x) -> struct(acc.s + x * pow(0.8, size(vals) - 1 - acc.i),"
            "                    acc.i + 1),"
            " acc -> acc.s), 6)"
        ).alias("ema"),
    )


@query(
    "q_win_rolling_distinct",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             user_id
      FROM events
    ),
    days AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY day
    )
    SELECT a.day, a.dau,
           (SELECT CAST(COUNT(DISTINCT b.user_id) AS BIGINT)
            FROM d b
            WHERE b.day BETWEEN a.day - INTERVAL 6 DAY AND a.day) AS wau
    FROM days a
    ORDER BY day ASC NULLS LAST
    """,
)
def q_win_rolling_distinct(spark, sf_dir):
    """Rolling distinct actives — the DAU/WAU product metric: daily
    distinct users plus a 7-day rolling distinct, which no engine's
    COUNT(DISTINCT) OVER supports directly. Spark shape: pre-aggregate
    to day grain (collect_set of users per day — the ONLY corpus-sized
    pass), then a RANGE frame over day numbers merges the 7 per-day
    sets JVM-side (flatten → array_distinct → size). The window runs
    over the day-grain table (30 rows here; a few thousand at any
    scale), so the single-partition window is a non-issue — the 100 TB
    cost lives entirely in the one day-keyed exchange."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.collect_set("user_id").alias("users"))
    )
    w = (
        Window.orderBy(
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
        )
        .rangeBetween(-6, 0)
    )
    return (
        daily.select(
            "day",
            F.size("users").cast("bigint").alias("dau"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("users").over(w)))
            )
            .cast("bigint")
            .alias("wau"),
        )
        .orderBy(F.col("day").asc_nulls_last())
    )
