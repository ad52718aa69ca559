"""Time-series smoothing/forecast (round 7) — Holt's linear-trend
double exponential smoothing over the daily event-count series: the
classic capacity-planning recurrence with two COUPLED state variables
(level, trend), which no window frame can express (running-frame
folds carry one associative state; l_t and b_t feed each other).

Cross-engine exactness choreography (the kmeans/IPF/CUSUM discipline
applied to a genuine recurrence): Spark folds the sorted series with
one sequential `aggregate()` lambda; DuckDB runs the identical
recurrence as a recursive CTE stepping one row per iteration. Both
re-ROUND(…,6) BOTH state variables at every step, so the engines
enter each step with identical doubles and errors cannot compound —
the whole smoothed trajectory is hash-exact, not just the endpoint.

100 TB design: the recurrence runs on the AGGREGATED series
(|days| rows — a per-key series at scale: groupBy(key) →
sort_array(collect_list) → one aggregate() fold per key, O(series
length) state, map-side-combinable count agg underneath). The corpus
touches only the first daily rollup; the sequential part is
vocabulary-of-days-sized. The same shape powers per-key EMA/SLO
forecasting in the metrics tier.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query

_A = 0.5  # level smoothing (exact binary double)
_B = 0.3  # trend smoothing


def _holt_fold_expr():
    """The PRODUCTION Holt fold over a column `s` of
    array<struct<day, v>> (sorted, size ≥ 2): one sequential
    aggregate() with a (l, b, hist) struct accumulator, emitting the
    full array<struct<l, b>> trajectory (length = size(s)).

    Fold over elements 2..n (slice is 1-based): the recurrence
    applies from rn=2; hist[0] is the rn=1 init state (l₁ = v₁,
    b₁ = v₂ − v₁), so hist zips 1:1 with the series. Both state
    variables re-ROUND(…, 6) at EVERY step — the cross-engine
    exactness argument in the module docstring. Factored (r10,
    VERDICT r9 item 5) so tests/test_property_fuzz.py can drive the
    exact production expression over degenerate generated grids the
    events fixture never produces."""
    step_l = f"ROUND({_A!r}D * x.v + (1.0D - {_A!r}D) * (acc.l + acc.b), 6)"
    step_b = (
        f"ROUND({_B!r}D * ({step_l} - acc.l) + (1.0D - {_B!r}D) * acc.b, 6)"
    )
    return F.expr(
        f"""
        aggregate(
          slice(s, 2, size(s) - 1),
          struct(
            CAST(s[0].v AS DOUBLE) AS l,
            CAST(s[1].v - s[0].v AS DOUBLE) AS b,
            array(struct(CAST(s[0].v AS DOUBLE) AS l,
                         CAST(s[1].v - s[0].v AS DOUBLE) AS b)) AS hist
          ),
          (acc, x) -> struct(
            {step_l} AS l,
            {step_b} AS b,
            array_append(acc.hist, struct({step_l} AS l, {step_b} AS b)) AS hist
          ),
          acc -> acc.hist
        )
        """
    )


# Shared by q_evt_holt and q_evt_backtest: daily series + the Holt
# recurrence stepped one row per iteration with per-step ROUND(6) on
# both state variables.
_HOLT_CTE = f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    series AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day ASC) AS INT) AS rn, day, v
      FROM daily
    ),
    rec(rn, l, b) AS (
      SELECT 1,
             CAST(s1.v AS DOUBLE),
             CAST(s2.v - s1.v AS DOUBLE)
      FROM series s1, series s2 WHERE s1.rn = 1 AND s2.rn = 2
      UNION ALL
      SELECT r.rn + 1,
             ROUND(CAST({_A!r} AS DOUBLE) * s.v
                   + (1.0 - CAST({_A!r} AS DOUBLE)) * (r.l + r.b), 6),
             ROUND(CAST({_B!r} AS DOUBLE)
                   * (ROUND(CAST({_A!r} AS DOUBLE) * s.v
                            + (1.0 - CAST({_A!r} AS DOUBLE)) * (r.l + r.b), 6)
                      - r.l)
                   + (1.0 - CAST({_B!r} AS DOUBLE)) * r.b, 6)
      FROM rec r JOIN series s ON s.rn = r.rn + 1
    )
"""


@query(
    "q_evt_holt",
    oracle=_HOLT_CTE
    + """
    SELECT s.rn, s.day, s.v,
           ROUND(r.l, 6) AS level,
           ROUND(r.b, 6) AS trend,
           ROUND(r.l + r.b, 6) AS forecast_next
    FROM rec r JOIN series s ON s.rn = r.rn
    ORDER BY s.rn ASC NULLS LAST
    """,
)
def q_evt_holt(spark, sf_dir):
    """Holt's linear trend (α=0.5, β=0.3) over daily event counts:
    l_t = ROUND(α·v_t + (1−α)(l+b), 6), b_t = ROUND(β(l_t−l) +
    (1−β)b, 6), initialized l₁=v₁, b₁=v₂−v₁. Emits the full smoothed
    trajectory plus the one-step-ahead forecast l+b per day. The
    DuckDB oracle steps the identical recurrence recursively; the
    Spark side folds the sorted series in ONE sequential aggregate()
    over a struct accumulator that appends each step's state to an
    array — then explodes it back to rows."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS BIGINT)"
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    # The recurrence needs two points to initialize (b₁ = v₂ − v₁).
    # On a degenerate single-day series the oracle's recursive init
    # (rn=1 ⋈ rn=2) emits zero rows; match that exactly instead of
    # emitting NULL-trend rows from a missing s[1] (ADVICE r7).
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "v"))).alias("s")
    ).filter(F.size("s") >= 2)
    folded = series.select(_holt_fold_expr().alias("hist"), "s")
    return (
        folded.select(
            F.posexplode(
                F.expr(
                    "zip_with(hist, slice(s, 1, size(hist)), (h, e) -> "
                    "struct(e.day AS day, e.v AS v, h.l AS l, h.b AS b))"
                )
            ).alias("pos0", "row")
        )
        .select(
            (F.col("pos0") + 1).cast("int").alias("rn"),
            F.col("row.day").alias("day"),
            F.col("row.v").alias("v"),
            F.round("row.l", 6).alias("level"),
            F.round("row.b", 6).alias("trend"),
            F.round(F.col("row.l") + F.col("row.b"), 6).alias("forecast_next"),
        )
        .orderBy(F.col("rn").asc_nulls_last())
    )


# ---- autocorrelation (lag-k ACF) -------------------------------------

_MAX_LAG = 7  # weekly-cycle sweep


@query(
    "q_evt_autocorr",
    oracle=f"""
    WITH e AS (
      SELECT epoch_us(ts) // 86400000000 AS d FROM events
    ),
    b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
    grid AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
    daily AS (
      SELECT g.d, CAST(COUNT(e.d) AS BIGINT) AS x
      FROM grid g LEFT JOIN e ON e.d = g.d
      GROUP BY g.d
    ),
    lags AS (SELECT unnest(range(1, {_MAX_LAG} + 1)) AS lag),
    sums AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(a.x) AS BIGINT) AS sx,
             CAST(SUM(c.x) AS BIGINT) AS sy,
             CAST(SUM(a.x * c.x) AS BIGINT) AS sxy,
             CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
             CAST(SUM(c.x * c.x) AS BIGINT) AS syy
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily c ON c.d = a.d + l.lag
      GROUP BY l.lag
    )
    SELECT CAST(lag AS INT) AS lag, n_pairs,
           CASE WHEN n_pairs * sxx - sx * sx = 0
                  OR n_pairs * syy - sy * sy = 0
                THEN CAST(NULL AS DOUBLE)
                ELSE ROUND(
                  CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))), 6)
           END AS acf
    FROM sums
    ORDER BY lag ASC NULLS LAST
    """,
)
def q_evt_autocorr(spark, sf_dir):
    """Lag-1..7 autocorrelation of the daily event-count series — the
    "is there a weekly cycle, and how sticky is load day-over-day"
    diagnostic feeding capacity models; the correlation-structure
    companion to q_evt_holt (level/trend) and q_evt_seasonality
    (hour-of-day chi-square). Days are zero-filled over the full
    min..max grid so gap days count as 0 instead of silently pairing
    non-adjacent days. acf(k) is the Pearson correlation of the
    series against its k-shift.

    Exactness: counts are integers, so every moment (Σx, Σy, Σxy,
    Σx², Σy² over each lag's pair set) is an exact BIGINT on both
    engines — no float accumulation order to diverge; the correlation
    is formed from those integers with one cast-to-double per factor,
    sqrt of each variance factor SEPARATELY (their product can exceed
    BIGINT and the doubles are identical either way), one division,
    ROUND 6. Constant series (zero variance) yield NULL. Note the
    integer moments fit BIGINT while n·Σx² < 2⁶³ — at extreme scale
    the daily counts would be aggregated per shard and the moments
    combined, or cast to double earlier with the usual ROUND
    discipline.

    100 TB: the only corpus-sized stage is the day-keyed count
    (map-side combined); the series itself is O(days) rows, and the
    lag sweep is a |lags|×|days| in-memory join — the aggregate-then-
    analyze shape shared by the whole forecast family."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS BIGINT)"
        ).alias("d")
    )
    # ONE corpus scan: the day-keyed count materializes eagerly
    # (O(days) rows), and the grid bounds, both self-join sides, and
    # the lag sweep all read the checkpoint — uncheckpointed, the
    # daily subplan re-executed for the min/max agg and each side of
    # the a/c self-join, 4 events scans per run (review r7; the
    # q_sim_mmr pool-cache precedent).
    counts = (
        e.groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=True)
    )
    grid = counts.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("d"))
    daily = (
        grid.join(counts, "d", "left")
        .select("d", F.coalesce(F.col("x"), F.lit(0).cast("bigint")).alias("x"))
    )
    lags = spark.range(1, _MAX_LAG + 1).select(F.col("id").alias("lag"))
    a, c = daily.alias("a"), daily.alias("c")
    pairs = (
        lags.crossJoin(a)
        .join(c, F.col("c.d") == F.col("a.d") + F.col("lag"))
        .select("lag", F.col("a.x").alias("xa"), F.col("c.x").alias("xc"))
    )
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("xa").cast("bigint").alias("sx"),
        F.sum("xc").cast("bigint").alias("sy"),
        F.sum(F.col("xa") * F.col("xc")).cast("bigint").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("bigint").alias("sxx"),
        F.sum(F.col("xc") * F.col("xc")).cast("bigint").alias("syy"),
    )
    var_x = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.when(
            (var_x == 0) | (var_y == 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                num.cast("double")
                / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double"))),
                6,
            )
        )
        .alias("acf"),
    ).orderBy(F.col("lag").asc_nulls_last())


# ---- forecast backtest (one-step-ahead errors) -----------------------


@query(
    "q_evt_backtest",
    oracle=_HOLT_CTE
    + """
    , fc AS (
      SELECT s.rn, s.day, ROUND(r.l + r.b, 6) AS f,
             LEAD(s.v) OVER (ORDER BY s.rn) AS a
      FROM rec r JOIN series s ON s.rn = r.rn
    ),
    err AS (
      SELECT rn, day, a, f,
             ABS(f - a) AS abs_err,
             2.0 * ABS(f - a) / (ABS(f) + ABS(a)) AS smape_c
      FROM fc WHERE a IS NOT NULL
    )
    SELECT rn, day, CAST(a AS BIGINT) AS actual_next,
           f AS forecast_next,
           ROUND(abs_err, 6) AS abs_err,
           ROUND(smape_c, 6) AS smape_c,
           ROUND(SUM(abs_err) OVER cum / rn, 6) AS mae_at,
           ROUND(SUM(smape_c) OVER cum / rn, 6) AS smape_at
    FROM err
    WINDOW cum AS (ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY rn ASC NULLS LAST
    """,
)
def q_evt_backtest(spark, sf_dir):
    """One-step-ahead backtest of the Holt forecaster — the eval leg
    of the forecast family (the q_sim_ndcg/q_dq_calibration pattern:
    every model family ships with its measurement): each day's
    forecast l+b is scored against the NEXT day's actual count,
    emitting per-day absolute error and sMAPE contribution plus the
    expanding-window MAE and sMAPE a capacity planner watches for
    model decay.

    Exactness: the forecast column is q_evt_holt's hash-exact
    trajectory (per-step ROUND(6) on both engines); actual is an
    integer; |f−a| and 2|f−a|/(|f|+|a|) are one deterministic IEEE
    expression per row, and the expanding means are sequential-frame
    window folds over identical inputs divided by the integer rn
    (CUSUM-exact), ROUND 6 at display.

    100 TB: inherits q_evt_holt's shape — the corpus touches only the
    daily rollup; the backtest arithmetic runs on |days| rows."""
    h = q_evt_holt(spark, sf_dir)
    w_lead = Window.orderBy("rn")
    fc = h.select(
        "rn",
        "day",
        F.col("forecast_next").alias("f"),
        F.lead("v").over(w_lead).alias("a"),
    ).filter(F.col("a").isNotNull())
    err = fc.select(
        "rn",
        "day",
        "a",
        "f",
        F.abs(F.col("f") - F.col("a")).alias("abs_err"),
        (
            2.0 * F.abs(F.col("f") - F.col("a"))
            / (F.abs(F.col("f")) + F.abs(F.col("a")))
        ).alias("smape_c"),
    )
    cum = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    return err.select(
        "rn",
        "day",
        F.col("a").cast("bigint").alias("actual_next"),
        F.col("f").alias("forecast_next"),
        F.round("abs_err", 6).alias("abs_err"),
        F.round("smape_c", 6).alias("smape_c"),
        F.round(F.sum("abs_err").over(cum) / F.col("rn"), 6).alias("mae_at"),
        F.round(F.sum("smape_c").over(cum) / F.col("rn"), 6).alias("smape_at"),
    ).orderBy(F.col("rn").asc_nulls_last())


# ---- Kaplan-Meier survival (round 8) ---------------------------------

_CONV_TYPE = "purchase"
_CONV_VALUE = 150.0  # conversion = first purchase above this value


def _km_fold_expr():
    """The KM survival fold over a sorted grid array column `s` of
    struct<t, n_risk, d_events, c_censored>: S re-ROUND(6)ed per step
    (the Holt discipline), history accumulated so the whole curve
    comes back as array<double>. Factored out so the hypothesis fuzz
    (tests/test_property_fuzz.py) can drive the EXACT production
    expression over generated grids — degenerate shapes (d=n steps,
    single-row grids, power-of-two tie values at the 7th decimal)
    the fixture never produces."""
    init = (
        "ROUND(1.0D - CAST(s[0].d_events AS DOUBLE)"
        " / CAST(s[0].n_risk AS DOUBLE), 6)"
    )
    step = (
        "ROUND(acc.sv * (1.0D - CAST(x.d_events AS DOUBLE)"
        " / CAST(x.n_risk AS DOUBLE)), 6)"
    )
    return F.expr(
        f"""
        aggregate(
          slice(s, 2, size(s) - 1),
          struct({init} AS sv, array({init}) AS hist),
          (acc, x) -> struct(
            {step} AS sv,
            array_append(acc.hist, {step}) AS hist),
          acc -> acc.hist)
        """
    )


@query(
    "q_evt_survival",
    oracle=f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_type, value,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    se AS (SELECT MAX(day) AS send FROM ev),
    u AS (SELECT user_id, MIN(day) AS fd FROM ev GROUP BY user_id),
    conv AS (
      SELECT user_id, MIN(day) AS cd FROM ev
      WHERE event_type = '{_CONV_TYPE}'
        AND value > CAST({_CONV_VALUE!r} AS DOUBLE)
      GROUP BY user_id
    ),
    obs AS (
      SELECT CASE WHEN c.cd IS NOT NULL THEN 1 ELSE 0 END AS ev_flag,
             CASE WHEN c.cd IS NOT NULL THEN c.cd - u.fd
                  ELSE se.send - u.fd END AS t
      FROM u LEFT JOIN conv c ON c.user_id = u.user_id, se
    ),
    grid AS (
      SELECT t, CAST(SUM(ev_flag) AS BIGINT) AS d_events,
             CAST(COUNT(*) - SUM(ev_flag) AS BIGINT) AS c_censored
      FROM obs GROUP BY t
    ),
    g2 AS (
      SELECT t, d_events, c_censored,
             CAST(SUM(d_events + c_censored) OVER (
               ORDER BY t ASC ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
             CAST(ROW_NUMBER() OVER (ORDER BY t ASC) AS INT) AS rn
      FROM grid
    ),
    rec(rn, s) AS (
      SELECT 1, ROUND(1.0 - CAST(d_events AS DOUBLE)
                            / CAST(n_risk AS DOUBLE), 6)
      FROM g2 WHERE rn = 1
      UNION ALL
      SELECT r.rn + 1,
             ROUND(r.s * (1.0 - CAST(g.d_events AS DOUBLE)
                                / CAST(g.n_risk AS DOUBLE)), 6)
      FROM rec r JOIN g2 g ON g.rn = r.rn + 1
    )
    SELECT g.t, g.n_risk, g.d_events, g.c_censored, r.s AS surv
    FROM g2 g JOIN rec r ON r.rn = g.rn
    ORDER BY g.t ASC NULLS LAST
    """,
)
def q_evt_survival(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-first-conversion
    (first purchase with value > 150, measured in days from each
    user's first event; users who never convert are right-censored at
    the study end — the churn/LTV estimator retention matrices can't
    express because censoring is not a cohort column). Per distinct
    duration t: at-risk count n_t (everyone with duration ≥ t — an
    exact BIGINT suffix-window sum), conversions d_t, censorings c_t,
    and the product-limit estimate S(t) = Π(1 − d/n).

    The survival product is a genuine sequential recurrence (like
    Holt): Spark folds the ≤|days|-row grid with one aggregate()
    lambda, DuckDB steps the identical recursion one row per
    iteration; S is re-ROUND(6)ed at every step so both engines enter
    each step with identical doubles — the whole curve is hash-exact.
    d/n divisions are BIGINT-exact inputs; no float accumulates.

    100 TB: the corpus is touched only by the per-user (fd, cd)
    rollups — map-side-combinable groupBys keyed on user_id; the KM
    grid itself is |distinct durations| ≤ |days| rows, so the
    single-partition window and fold run on a vocabulary-bound
    table (the CUSUM/Holt precedent). Per-cohort curves at scale =
    the same plan with the cohort key added to every groupBy/window
    partition."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS BIGINT)"
        ).alias("day"),
    )
    se = ev.agg(F.max("day").alias("send"))
    u = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    conv = (
        ev.filter(
            (F.col("event_type") == _CONV_TYPE)
            & (F.col("value") > F.lit(_CONV_VALUE))
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("cd"))
    )
    obs = (
        u.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(se))
        .select(
            F.when(F.col("cd").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "ev_flag"
            ),
            F.when(F.col("cd").isNotNull(), F.col("cd") - F.col("fd"))
            .otherwise(F.col("send") - F.col("fd"))
            .alias("t"),
        )
    )
    grid = obs.groupBy("t").agg(
        F.sum("ev_flag").cast("bigint").alias("d_events"),
        (F.count(F.lit(1)) - F.sum("ev_flag")).cast("bigint").alias("c_censored"),
    )
    w_n = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    g2 = grid.select(
        "t",
        "d_events",
        "c_censored",
        F.sum(F.col("d_events") + F.col("c_censored"))
        .over(w_n)
        .cast("bigint")
        .alias("n_risk"),
    )
    # Degenerate-input guard (the q_evt_holt ADVICE-r7 pattern): on an
    # empty events table the agg still emits one row with s = [], and
    # slice(s, 2, -1) would throw at runtime while the oracle's
    # recursive init emits zero rows — filter to match the empty
    # result on both engines. KM needs only ONE grid row (unlike
    # Holt's two-point trend init).
    series = g2.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "n_risk", "d_events", "c_censored"))
        ).alias("s")
    ).filter(F.size("s") >= 1)
    folded = series.select("s", _km_fold_expr().alias("hist"))
    return (
        folded.select(
            F.posexplode(
                F.expr(
                    "zip_with(s, hist, (e, h) -> struct("
                    "e.t AS t, e.n_risk AS n_risk, e.d_events AS d_events, "
                    "e.c_censored AS c_censored, h AS surv))"
                )
            ).alias("idx", "r")
        )
        .select("r.t", "r.n_risk", "r.d_events", "r.c_censored", "r.surv")
        .orderBy(F.col("t").asc_nulls_last())
    )
