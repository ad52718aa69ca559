"""As-of and range joins — extension operators (SURVEY.md §2.3: DF 19
has NO specialized range/as-of operator; both engines express them as
theta joins. We go further and implement the scalable compositions,
with DuckDB's native ASOF JOIN / range predicates as the oracle).

- as-of join: "for each purchase, the most recent prior click by the
  same user" — implemented as union + last_value window (one shuffle
  on user_id, one sort), NOT a nested-loop theta join. This is the
  composition that survives 100 TB: cost is sort-within-user, never
  |purchases|×|clicks|.
- range join: point-in-interval via interval bucketization — intervals
  explode to covered buckets, points map to one bucket, equi-join on
  bucket + residual filter. Turns an O(n·m) nested loop into a hash
  join; bucket width trades replication factor vs selectivity.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS last_click_ts,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join via union + last-non-null window: tag click/purchase
    rows, sort within user by (ts, kind) — 'click' sorts before
    'purchase' at equal ts, matching ASOF's >= bound — and carry the
    latest click ts forward with last(ignorenulls).

    DuckDB's native ASOF JOIN is the oracle, making this an
    engine-parity proof for an operator Spark lacks natively."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit("p").alias("kind")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit("c").alias("kind"),
    )
    merged = purchases.unionByName(clicks)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("kind").asc_nulls_last()
    )
    carried = merged.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("kind") == "c", F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("kind") == "p").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        (F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts"))
        .cast("bigint")
        .alias("gap_sec"),
    )


_BUCKET = 500.0  # acctbal bucket width == interval half-width*1 → ≤2 buckets/interval


@query(
    "q_range_join",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey,
           ROUND(c.c_acctbal - s.s_acctbal, 6) AS bal_diff
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal >= s.s_acctbal - 250
     AND c.c_acctbal <  s.s_acctbal + 250
    """,
)
def q_range_join(spark, sf_dir):
    """Range (point-in-interval) join: customers whose acctbal falls in
    [s_acctbal−250, s_acctbal+250). Implemented by bucketizing: each
    supplier interval covers ≤2 width-500 buckets (exploded), each
    customer maps to exactly 1 → equi-join on bucket + exact residual.
    DuckDB evaluates the raw range predicate as the oracle.

    Scale: replication factor = interval_width/bucket_width + 1 ≈ 2;
    the join is a plain hash join on the bucket key."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        (F.col("s_acctbal") - 250).alias("lo"),
        (F.col("s_acctbal") + 250).alias("hi"),
    )
    intervals = s.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BUCKET).cast("long"),
                F.floor((F.col("hi") - 1e-9) / _BUCKET).cast("long"),
            )
        ),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.floor(F.col("c_acctbal") / _BUCKET).cast("long").alias("bucket"),
    )
    return (
        intervals.join(c, "bucket")
        .filter((F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi")))
        .select(
            "s_suppkey",
            "c_custkey",
            F.round(F.col("c_acctbal") - F.col("s_acctbal"), 6).alias("bal_diff"),
        )
    )
