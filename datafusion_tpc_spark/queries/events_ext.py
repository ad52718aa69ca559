"""Event-analytics extensions, round 6 — gaps-and-islands (user
activity streaks). Companion to queries/events.py (funnel, retention,
LOCF, CUSUM, …), in its own module so the r6 registrations queue
behind the driver window without touching events.py's order
(registry.load_all discipline).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_evt_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             date_diff('day', DATE '1970-01-01', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d ASC) AS grp
      FROM days
    ),
    islands AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM numbered GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           MAX(len) AS longest_streak
    FROM islands
    GROUP BY user_id
    ORDER BY longest_streak DESC NULLS LAST, user_id ASC NULLS LAST
    LIMIT 20
    """,
)
def q_evt_islands(spark, sf_dir):
    """Gaps-and-islands: per-user consecutive-day activity streaks —
    the classic sessionize-at-day-granularity SQL shape (retention /
    engagement-streak analytics). An island is a maximal run of
    consecutive active days; the standard trick groups by
    epoch_day − row_number, which is constant exactly within a
    consecutive run. Output: per-user island count and longest
    streak, top-20.

    Cross-engine exactness: epoch-day arithmetic is all-integer
    (datediff from a fixed epoch — the integer-DIV convention for
    date math), row_number is deterministic (partition ordered by the
    distinct day), so island ids match bit-for-bit.

    Scale: one distinct shuffle on (user, day) with map-side combine,
    then the window and both aggregations all share the user_id
    partitioning — Catalyst reuses one exchange; per-user state is
    |active days|. Top-20 is TakeOrdered. At 100 TB this is the
    standard daily-active rollup; nothing is corpus-wide."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("d").asc())
    numbered = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    islands = numbered.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.max("len").alias("longest_streak"),
        )
        .orderBy(
            F.col("longest_streak").desc_nulls_last(),
            F.col("user_id").asc_nulls_last(),
        )
        .limit(20)
    )
