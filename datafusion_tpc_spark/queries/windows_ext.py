"""Window-function batch 2 (r5-born) — gap sessionization, EMA via
recursive window algebra, rolling distinct count. Split from
queries/windows.py in round 6 so the round-7 driver window can
register exactly these three never-driver-verified ids without the
five already-green windows.py ids riding along (registry.load_all
window discipline; imports no query-registering module).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query

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


def _ema_fold_expr():
    """The PRODUCTION EMA positional fold over a column `vals`
    (array<double>, the ≤32-row window frame, oldest→newest):
    ema = ROUND(0.2 · Σ vals[i] · w[i], 6) with w = the reversed
    size(vals)-prefix of the constant pow(0.8, k) table — oldest
    element gets the highest power.

    Weights come from a CONSTANT-FOLDED table (all-literal
    sequence→transform→pow, evaluated once at plan time), not a
    per-element pow() call inside the fold — 3.2M transcendental
    calls dropped, measured 4.1 s → 0.9 s at sf0.1. The fold applies
    x·w in the same sequential order as before, so the result is
    BIT-identical, and the oracle's pow(0.8, rn-band) parity is
    untouched. Factored (r10, VERDICT r9 item 5) so
    tests/test_property_fuzz.py can drive the exact production
    expression over degenerate generated frames."""
    return F.expr(
        "round(0.2 * aggregate("
        " zip_with(vals,"
        "   reverse(slice(transform(sequence(0, 31),"
        "     k -> pow(0.8, cast(k as double))), 1, size(vals))),"
        "   (x, wgt) -> x * wgt),"
        " cast(0.0 as double), (acc, x) -> acc + x), 6)"
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
        _ema_fold_expr().alias("ema"),
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


@query(
    "q_win_ratio",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ROUND(o_totalprice
                 / SUM(o_totalprice) OVER (PARTITION BY o_orderpriority),
                 6) AS ratio_to_report,
           ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC
                   ROWS UNBOUNDED PRECEDING)
                 / SUM(o_totalprice) OVER (PARTITION BY o_orderpriority),
                 6) AS cum_share
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def q_win_ratio(spark, sf_dir):
    """RATIO_TO_REPORT + cumulative-share analytics — each order's
    fraction of its priority class's total and the running
    concentration curve (the Pareto/ABC-analysis shape: 'the top N
    orders carry X% of value'). Spark and DuckDB both express it as
    value / SUM() OVER (partition), with the running share ordered by
    (value DESC, key ASC) for a deterministic curve.

    Cross-engine exactness: the partition total is one hash-agg-style
    window sum (fold-order noise ~1e-12 → ROUND 6); the running sum
    is a sequential frame fold — exact given identical inputs (the
    CUSUM rule) — and both sides divide by the same rounded-free
    total before the single final ROUND.

    Scale: one partition-keyed window exchange shared by all three
    window expressions (same partitioning ⇒ Catalyst computes them in
    one Window operator); per-class state is the running pair. The
    classic use is exactly this shape at |classes| ≫ cores."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    part = Window.partitionBy("o_orderpriority")
    running = part.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = F.sum("o_totalprice").over(part)
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") / total, 6).alias("ratio_to_report"),
        F.round(F.sum("o_totalprice").over(running) / total, 6).alias("cum_share"),
    )
