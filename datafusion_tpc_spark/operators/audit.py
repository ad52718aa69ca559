"""Warehouse audit operators (r5) — beyond-reference production layer:
declarative data-quality constraint checking (the Deequ/Great-
Expectations shape) and SCD Type-2 dimension building.

The reference has no audit surface at all — its only correctness
signal is an eyeballed row count (reference src/main.rs:79,116). A
100 TB corpus pipeline needs machine-checkable contracts on every
ingest: uniqueness, completeness, referential integrity, domain
ranges. Both operators here are expressed as single-pass aggregations
/ reused-partitioning window plans, so the audit costs one scan per
table, not one scan per constraint.

100 TB design notes:
- q_dq_checks computes ALL per-table constraint metrics in ONE
  aggregation per table (conditional aggregates share the scan and
  combine map-side); the referential-integrity check is the only
  join, and its dimension side (orders keys, pre-projected to one
  column) broadcasts. Nothing here shuffles the fact table.
- q_scd2 uses a single user_id hash partitioning for both window
  passes (change-point detection, then interval close) — Catalyst
  reuses the Exchange; no groupBy is needed because each change row
  IS the version row (valid_to = next change's valid_from).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


def _check(name, metric_col, passed_col):
    return F.struct(
        F.lit(name).alias("check_name"),
        F.round(metric_col.cast("double"), 6).alias("metric"),
        passed_col.cast("boolean").alias("passed"),
    )


@query(
    "q_dq_checks",
    oracle="""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS dk,
             CAST(COUNT(o_custkey) AS BIGINT) AS nn_cust,
             CAST(count_if(o_orderstatus IN ('O','F','P')) AS BIGINT) AS ok_status,
             CAST(count_if(o_totalprice >= 0) AS BIGINT) AS ok_price
      FROM orders
    ),
    l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(l_discount BETWEEN 0 AND 0.1) AS BIGINT) AS ok_disc
      FROM lineitem
    ),
    ri AS (
      -- NOT EXISTS, not NOT IN: a NULL l_orderkey is exactly the
      -- defect this check exists to catch — left_anti (Spark side)
      -- keeps NULL-keyed rows as orphans, and NOT IN would silently
      -- drop them (review r5).
      SELECT CAST(COUNT(*) AS BIGINT) AS orphans
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT check_name, ROUND(metric, 6) AS metric, passed FROM (
      SELECT 'uniqueness:orders.o_orderkey' AS check_name,
             dk * 1.0 / n AS metric, dk = n AS passed FROM o
      UNION ALL
      SELECT 'completeness:orders.o_custkey', nn_cust * 1.0 / n, nn_cust = n FROM o
      UNION ALL
      SELECT 'accepted_values:orders.o_orderstatus', ok_status * 1.0 / n, ok_status = n FROM o
      UNION ALL
      SELECT 'non_negative:orders.o_totalprice', ok_price * 1.0 / n, ok_price = n FROM o
      UNION ALL
      SELECT 'range:lineitem.l_discount[0,0.1]', ok_disc * 1.0 / n, ok_disc = n FROM l
      UNION ALL
      SELECT 'ref_integrity:lineitem.l_orderkey', orphans * 1.0 / (SELECT n FROM l),
             orphans = 0 FROM ri
    )
    ORDER BY check_name ASC NULLS LAST
    """,
)
def q_dq_checks(spark, sf_dir):
    """Declarative constraint suite (Deequ shape): uniqueness,
    completeness, accepted-values, range, and referential-integrity
    checks as one tall (check_name, metric, passed) report.

    All orders-side metrics ride ONE aggregation (conditional
    count_if-style aggregates share the scan, combine map-side);
    lineitem likewise. The RI check is a broadcast anti-join on the
    pre-projected orders key column — the fact table never shuffles.
    pass/fail compares INTEGER counts (dk = n, orphans = 0), never
    floats, so the verdict is boundary-safe cross-engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("dk"),
        F.count("o_custkey").alias("nn_cust"),
        F.count_if(F.col("o_orderstatus").isin("O", "F", "P")).alias("ok_status"),
        F.count_if(F.col("o_totalprice") >= 0).alias("ok_price"),
    )
    l = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("l_discount").between(0.0, 0.1)).alias("ok_disc"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(
            F.broadcast(orders.select("o_orderkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
    )

    o_checks = o.select(
        F.explode(
            F.array(
                _check(
                    "uniqueness:orders.o_orderkey",
                    F.col("dk") / F.col("n"),
                    F.col("dk") == F.col("n"),
                ),
                _check(
                    "completeness:orders.o_custkey",
                    F.col("nn_cust") / F.col("n"),
                    F.col("nn_cust") == F.col("n"),
                ),
                _check(
                    "accepted_values:orders.o_orderstatus",
                    F.col("ok_status") / F.col("n"),
                    F.col("ok_status") == F.col("n"),
                ),
                _check(
                    "non_negative:orders.o_totalprice",
                    F.col("ok_price") / F.col("n"),
                    F.col("ok_price") == F.col("n"),
                ),
            )
        ).alias("c")
    )
    l_checks = l.select(
        F.explode(
            F.array(
                _check(
                    "range:lineitem.l_discount[0,0.1]",
                    F.col("ok_disc") / F.col("n"),
                    F.col("ok_disc") == F.col("n"),
                )
            )
        ).alias("c")
    )
    ri_checks = (
        orphans.crossJoin(F.broadcast(l.select(F.col("n").alias("ln"))))
        .select(
            F.explode(
                F.array(
                    _check(
                        "ref_integrity:lineitem.l_orderkey",
                        F.col("orphans") / F.col("ln"),
                        F.col("orphans") == 0,
                    )
                )
            ).alias("c")
        )
    )
    return (
        o_checks.unionAll(l_checks)
        .unionAll(ri_checks)
        .select("c.check_name", "c.metric", "c.passed")
        .orderBy(F.col("check_name").asc_nulls_last())
    )


@query(
    "q_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           (LEAD(valid_from) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY valid_from ASC NULLS LAST, event_id ASC NULLS LAST)
    ORDER BY user_id ASC NULLS LAST, version ASC NULLS LAST
    """,
)
def q_scd2(spark, sf_dir):
    """SCD Type-2 dimension build: collapse each user's event_type
    history into validity intervals [valid_from, valid_to), keeping a
    row only where the attribute CHANGES; the open interval is the
    current version.

    One user_id hash partitioning serves both window passes (change
    detection over (ts, event_id) — the repo's deterministic
    total-order convention for events — then interval close over
    valid_from, which is unique per user after the change filter).
    No groupBy: each change row IS the version row, so the plan is
    scan -> exchange(user_id) -> window -> filter -> window. At
    100 TB the state per key is one row lookback — no accumulation.
    """
    ev = load_table(spark, sf_dir, "events")
    w_ev = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    changes = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w_ev).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id", "event_type", F.col("ts").alias("valid_from"), "event_id"
        )
    )
    # (valid_from, event_id) tie-break: same-µs change rows for one
    # user exist in principle; event_id makes the interval chain a
    # total order on both engines.
    w_v = Window.partitionBy("user_id").orderBy(
        F.col("valid_from").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    # no presentation orderBy: the driver's hash is order-insensitive
    # and a global sort would add a second (range) exchange to an
    # otherwise single-shuffle plan (tests/test_plans.py pins this).
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_v).alias("valid_to"),
        F.row_number().over(w_v).cast("bigint").alias("version"),
        F.lead("valid_from").over(w_v).isNull().alias("is_current"),
    )


@query(
    "q_join_pit",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS v_type, valid_from,
             LEAD(valid_from) OVER w AS valid_to
      FROM changes
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY valid_from ASC NULLS LAST, event_id ASC NULLS LAST)
    ),
    pit AS (
      SELECT e.event_id, e.event_type, d.v_type
      FROM (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            FROM events) e
      JOIN dim d
        ON d.user_id = e.user_id
       AND d.valid_from <= e.ts
       AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_joined,
           CAST(count_if(event_type <> v_type) AS BIGINT) AS n_mismatch
    FROM pit
    """,
)
def q_join_pit(spark, sf_dir):
    """Point-in-time (temporal) join against the SCD2 dimension built
    by q_scd2: each event joins the version whose validity interval
    contains its timestamp — the bi-temporal lookup every warehouse
    fact-to-history join performs. Two invariants are PINNED by the
    exact oracle: n_joined equals the event count (intervals tile
    each user's timeline with no gap or overlap — a same-µs change
    event joins only the later version because intervals are
    half-open [from, to)), and n_mismatch = 0 (the version active at
    any event's time carries that event's own type, by construction
    of change-point compression).

    100 TB: equi-key on user_id + interval residual — per-key cost is
    versions_per_user × events_per_user, never a cross product (the
    q_join_overlap bound); the dim side is change-compressed, i.e.
    minimal."""
    ev = load_table(spark, sf_dir, "events")
    dim = q_scd2(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("v_type"),
        "valid_from",
        "valid_to",
    )
    e = ev.select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    pit = e.join(
        dim,
        (e.user_id == dim.user_id)
        & (dim.valid_from <= e.ts)
        & (dim.valid_to.isNull() | (e.ts < dim.valid_to)),
    )
    return pit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_joined"),
        F.count_if(F.col("event_type") != F.col("v_type"))
        .cast("bigint")
        .alias("n_mismatch"),
    )
