"""Event-time queries on the `events` fixture — the flagship grouped
AVG (reference `aggregation` bench) plus date/time functions and
batch event-time windows (SURVEY.md §2.8 date/time, §2.10).

The reference's only in-repo aggregate is
``SELECT container, pod, AVG(response_bytes) AS avg_response_size
FROM logs GROUP BY container, pod`` (reference benches/query.rs:26);
``q_agg_avg`` is that query rebased onto the driver's `events` table.

Scale notes: grouped AVG is two-phase hash aggregation (partial
map-side combine → final after shuffle) — Spark's HashAggregateExec
partial/final mirrors DataFusion's Partial→Final AggregateExec
exactly. Cardinality of (event_type,user_id) bounds shuffle volume,
not raw row count, so this scales to 100 TB with the shuffle sized by
distinct keys. Window bucketing (date_bin / tumbling windows) is a
pure per-row projection followed by the same two-phase agg — no extra
shuffle beyond the groupBy.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_agg_avg",
    oracle="""
    SELECT event_type, user_id, ROUND(AVG(value), 6) AS avg_value
    FROM (SELECT event_type, user_id, value FROM events) e
    GROUP BY event_type, user_id
    """,
)
def q_agg_avg(spark, sf_dir):
    """Flagship: multi-key grouped AVG (reference benches/query.rs:26,
    DataFrame form src/main.rs:48-52)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", "user_id").agg(
        F.round(F.avg("value"), 6).alias("avg_value")
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(year FROM ts) AS INT) AS y,
           CAST(EXTRACT(month FROM ts) AS INT) AS mo,
           CAST(EXTRACT(day FROM ts) AS INT) AS d,
           CAST(EXTRACT(hour FROM ts) AS INT) AS h,
           CAST(EXTRACT(minute FROM ts) AS INT) AS mi,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(ts AS DATE) AS dt,
           ts + INTERVAL 3 DAY AS ts_plus3d,
           CAST('2024-02-01 12:30:00' AS TIMESTAMP) AS fixed_ts,
           make_timestamp(CAST(1704067200 AS BIGINT) * 1000000) AS from_epoch
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
    """,
)
def q_fn_date(spark, sf_dir):
    """date_part / date_trunc / casts — DF 19 date/time functions
    (SURVEY §2.8; Tier B via reference Cargo.toml:15)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.col("ts").cast("date").alias("dt"),
        (F.col("ts") + F.expr("INTERVAL 3 DAY")).alias("ts_plus3d"),
        F.to_timestamp(F.lit("2024-02-01 12:30:00")).alias("fixed_ts"),
        F.timestamp_seconds(F.lit(1704067200)).alias("from_epoch"),
    )


@query(
    "q_fn_datebin",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 AS BIGINT) * 1000000)
             AS bucket,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def q_fn_datebin(spark, sf_dir):
    """date_bin — DF 19's date_bin(width, ts, origin) has no direct
    Spark function; implemented as epoch arithmetic (SURVEY §2.8
    mapping): floor((unix - origin)/width)*width + origin, origin=epoch,
    width=15 min."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp("ts") / F.lit(900)) * F.lit(900)).cast("long")
    )
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
    )


@query(
    "q_evt_tumble",
    oracle="""
    WITH b AS (
      SELECT make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT) * 1000000)
               AS window_start,
             event_type, value
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM b
    GROUP BY 1, 2, 3
    """,
)
def q_evt_tumble(spark, sf_dir):
    """Tumbling event-time window (batch) — Spark `window()` (1 hour,
    epoch-aligned). Batch-exact oracle; the streaming variant is
    q_stream_tumble (rows-only). SURVEY §2.10 / M4."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "avg_value",
        )
    )


@query(
    "q_evt_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC NULLS LAST) IS NULL
                    OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts ASC NULLS LAST) > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC NULLS LAST
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM sessions
    GROUP BY user_id, sess
    """,
)
def q_evt_session(spark, sf_dir):
    """Session window (batch) — Spark's built-in `session_window(ts,
    gap)` with a 30-minute gap; oracle reconstructs sessions via
    lag + running-sum sessionization. session_window.end is defined as
    last-event + gap, matched on the oracle side. SURVEY §2.10 / M4."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_evt_hop",
    oracle="""
    WITH b AS (
      SELECT make_timestamp(((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) AS BIGINT) - k.k) * 900) * 1000000)
               AS window_start,
             event_type, value
      FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS total_value
    FROM b
    GROUP BY 1, 2, 3
    """,
)
def q_evt_hop(spark, sf_dir):
    """Sliding/hopping event-time window (batch): 1-hour windows every
    15 minutes — each event belongs to exactly 4 overlapping windows.
    Spark's window(ts, '1 hour', '15 minutes') expands rows window-
    count times BEFORE the shuffle (an Expand, like DISTINCT aggs), so
    shuffle volume is slide-ratio × input — the reason production
    dashboards pick modest overlap ratios. The oracle states the same
    window assignment arithmetic via generate_series. SURVEY §2.10/M4;
    streaming twin: q_stream_hop†."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
