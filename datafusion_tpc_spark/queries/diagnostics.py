"""Distribution diagnostics (round 7) — the two health checks a
pipeline runs before/after every large shuffle or ingest: key-skew
profiling (will this join/groupBy hot-spot?) and population-stability
drift between data vintages (did the distribution move?).

Companions to queries/sql_shapes.py's q_join_salted (the FIX for skew
— this is the detector that decides when to apply it) and
operators/audit_ext.py's q_dq_reconcile (row-level reconciliation —
this is the distribution-level complement).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query

_BUCKETS = 32  # mirrors a shuffle-partition count


@query(
    "q_dq_skew",
    oracle=f"""
    WITH per_key AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_custkey
    ),
    per_bucket AS (
      SELECT {_h60_duck("CAST(o_custkey AS VARCHAR)")} % {_BUCKETS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    key_stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_key_cnt,
             CAST(SUM(cnt) AS BIGINT) AS total
      FROM per_key
    ),
    bucket_stats AS (
      SELECT CAST(MAX(cnt) AS BIGINT) AS max_bucket_cnt,
             SUM(cnt * 1.0) / {_BUCKETS} AS mean_bucket,
             SUM(cnt * cnt * 1.0) / {_BUCKETS} AS mean_sq
      FROM per_bucket
    )
    SELECT k.n_keys, k.max_key_cnt,
           ROUND(k.max_key_cnt * 1.0 / k.total, 6) AS max_key_share,
           ROUND(b.max_bucket_cnt / b.mean_bucket, 6) AS bucket_peak_ratio,
           ROUND(sqrt(b.mean_sq - b.mean_bucket * b.mean_bucket)
                 / b.mean_bucket, 6) AS bucket_cv
    FROM key_stats k, bucket_stats b
    """,
)
def q_dq_skew(spark, sf_dir):
    """Key-skew profile of orders.o_custkey — the decision input for
    salting/AQE-skew-join: distinct key count, the hottest key's row
    count and share, and what a 32-way (_BUCKETS) hash shuffle of this key
    would look like (peak-over-mean bucket ratio and coefficient of
    variation across h60 buckets — a direct simulation of partition
    imbalance at the configured shuffle width).

    Determinism: bucket moments are SUM/SUM-of-squares over exactly
    32 bucket counts (integer sums — exact), divided and
    sqrt-ed once, ROUND 6dp. 100 TB: two map-side-combinable aggs
    (key-keyed, bucket-keyed) and O(keys)+O(32) state — this
    profile is exactly as expensive as one groupBy on the key, which
    is what you are about to run anyway."""
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    per_bucket = o.groupBy(
        (h60(F.col("o_custkey").cast("string")) % _BUCKETS).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    key_stats = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_key_cnt"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    bucket_stats = per_bucket.agg(
        F.max("cnt").cast("bigint").alias("max_bucket_cnt"),
        (F.sum(F.col("cnt") * 1.0) / _BUCKETS).alias("mean_bucket"),
        (F.sum(F.col("cnt") * F.col("cnt") * 1.0) / _BUCKETS).alias("mean_sq"),
    )
    return key_stats.crossJoin(bucket_stats).select(
        "n_keys",
        "max_key_cnt",
        F.round(F.col("max_key_cnt") * 1.0 / F.col("total"), 6).alias(
            "max_key_share"
        ),
        F.round(F.col("max_bucket_cnt") / F.col("mean_bucket"), 6).alias(
            "bucket_peak_ratio"
        ),
        F.round(
            F.sqrt(F.col("mean_sq") - F.col("mean_bucket") * F.col("mean_bucket"))
            / F.col("mean_bucket"),
            6,
        ).alias("bucket_cv"),
    )


_K_ANON = 10  # k-anonymity threshold


@query(
    "q_dq_kanon",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group,
           ROUND(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) * 1.0
                 / SUM(n), 6) AS risk_share
    FROM g
    """,
)
def q_dq_kanon(spark, sf_dir):
    """k-anonymity audit over the (lang, source) quasi-identifier
    pair: how many equivalence classes fall below k=10 (_K_ANON), how
    many rows they expose, and the re-identification risk share — the
    gate a release pipeline checks before publishing per-group stats
    (the aggregate complement of q_pipe_pii's row-level redaction and
    q_agg_dp's noised release).

    100 TB: one map-side-combinable groupBy at quasi-identifier
    cardinality, then a second constant-size rollup — exactly the
    cost of the release aggregation being audited. Generalization
    ladders (coarsen lang → lang-family etc.) re-run this same query
    per rung."""
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    below = F.when(F.col("n") < _K_ANON, F.col("n")).otherwise(0)
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") < _K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("n_below_k"),
        F.sum(below).cast("bigint").alias("rows_at_risk"),
        F.min("n").cast("bigint").alias("min_group"),
        F.round(F.sum(below) * 1.0 / F.sum("n"), 6).alias("risk_share"),
    )


_BIN_W = 25_000.0  # o_totalprice bin width
_NBINS = 10


@query(
    "q_dq_drift",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / {_BIN_W}), {_NBINS - 1}) AS INT)
               AS bin,
             o_orderkey % 2 = 0 AS is_ref
      FROM orders
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS nr,
             CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS nc
      FROM binned
    ),
    per_bin AS (
      SELECT b.bin,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
      FROM binned b GROUP BY b.bin
    )
    SELECT p.bin, p.n_ref, p.n_cur,
           ROUND(((p.n_ref + 1.0) / (t.nr + {_NBINS})
                  - (p.n_cur + 1.0) / (t.nc + {_NBINS}))
                 * ln(((p.n_ref + 1.0) / (t.nr + {_NBINS}))
                      / ((p.n_cur + 1.0) / (t.nc + {_NBINS}))), 6)
             AS psi_contrib
    FROM per_bin p, tot t
    ORDER BY p.bin ASC NULLS LAST
    """,
)
def q_dq_drift(spark, sf_dir):
    """Population-stability-index drift report between two order
    vintages (even vs odd orderkey standing in for last-month vs
    this-month): o_totalprice is binned into 10 (_NBINS) fixed-width
    bins and each bin reports its PSI contribution
    (p_ref − p_cur)·ln(p_ref/p_cur) under add-one smoothing (no
    empty-bin ln(0)). Σ|psi| < 0.1 is the conventional "stable"
    gate a pipeline asserts before reusing hyperparameters.

    Fixed-width bins, not quantile bins: quantile edges recomputed
    per vintage would chase the drift they are meant to measure (and
    cross-engine percentile interpolation differs — the gotcha list).
    ln is transcendental so each contribution is ROUND 6dp after one
    application. 100 TB: one scan, 10-key agg."""
    binned = load_table(spark, sf_dir, "orders").select(
        F.least(F.floor(F.col("o_totalprice") / _BIN_W), F.lit(_NBINS - 1))
        .cast("int")
        .alias("bin"),
        (F.col("o_orderkey") % 2 == 0).alias("is_ref"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_cur"),
    )
    tot = binned.agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("nr"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).cast("bigint").alias("nc"),
    )
    p_ref = (F.col("n_ref") + 1.0) / (F.col("nr") + _NBINS)
    p_cur = (F.col("n_cur") + 1.0) / (F.col("nc") + _NBINS)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias(
                "psi_contrib"
            ),
        )
        .orderBy(F.col("bin").asc_nulls_last())
    )


@query(
    "q_dq_prcurve",
    oracle="""
    WITH sc AS (
      SELECT CAST(FLOOR(100.0 * len(list_distinct(string_split(text, ' ')))
                        / len(string_split(text, ' '))) AS INT) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    g AS (
      SELECT s, CAST(SUM(pos) AS BIGINT) AS p,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n
      FROM sc GROUP BY s
    ),
    c AS (
      SELECT s,
             SUM(p) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS tp,
             SUM(n) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS fp,
             SUM(p) OVER () AS pos_total
      FROM g
    )
    SELECT s AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           ROUND(tp * 1.0 / (tp + fp), 6) AS prec,
           ROUND(tp * 1.0 / pos_total, 6) AS recall,
           ROUND(2.0 * tp / (2 * tp + fp + (pos_total - tp)), 6) AS f1
    FROM c ORDER BY threshold DESC NULLS LAST
    """,
)
def q_dq_prcurve(spark, sf_dir):
    """Precision-recall curve for a quality-filter threshold sweep —
    the calibration every score-gated filter (q_pipe_quality_filter,
    q_pipe_classify) needs before its cutoff is chosen: sweep every
    distinct score, report cumulative TP/FP plus precision / recall /
    F1 at each threshold. Score is the integer lexical-diversity
    centile floor(100·unique/total words); the swept "positive" class
    is lang='en' (does the cheap lexical score separate the dominant
    language?).

    Determinism: the score is FLOOR of one IEEE division (floor
    sidesteps the cross-engine ROUND-half tie hazard entirely);
    TP/FP/FN are integer cumulative sums; precision/recall/F1 are
    each ONE division of integers, ROUND(6)-ed for hashing only —
    nothing accumulates in float. 100 TB: per-score partial aggregate
    (≤101 groups, map-side combined), then the running sums windows
    run on the ≤101-row aggregate — corpus size touches only the
    scan."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    s = F.floor(100.0 * F.size(F.array_distinct(words)) / F.size(words)).cast(
        "int"
    )
    g = (
        d.select(
            s.alias("s"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .groupBy("s")
        .agg(
            F.sum("pos").cast("bigint").alias("p"),
            (F.count(F.lit(1)) - F.sum("pos")).cast("bigint").alias("n"),
        )
    )
    run = (
        Window.orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.select(
        "s",
        F.sum("p").over(run).alias("tp"),
        F.sum("n").over(run).alias("fp"),
        F.sum("p").over(Window.partitionBy()).alias("pos_total"),
    )
    return c.select(
        F.col("s").alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6).alias("prec"),
        F.round(F.col("tp") * 1.0 / F.col("pos_total"), 6).alias("recall"),
        F.round(
            2.0
            * F.col("tp")
            / (2 * F.col("tp") + F.col("fp") + (F.col("pos_total") - F.col("tp"))),
            6,
        ).alias("f1"),
    ).orderBy(F.col("threshold").desc_nulls_last())


_L_DIV = 5       # minimum distinct sensitive values per QI class
_BAL_W = 1000.0  # sensitive-attribute bucket width


@query(
    "q_dq_ldiv",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / {_BAL_W}) AS INT))
                  AS BIGINT) AS l_distinct
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, n, l_distinct,
           (l_distinct < {_L_DIV}) AS at_risk
    FROM g
    ORDER BY c_nationkey ASC NULLS LAST, c_mktsegment ASC NULLS LAST
    """,
)
def q_dq_ldiv(spark, sf_dir):
    """l-diversity audit — the companion gate to q_dq_kanon: a QI
    equivalence class can satisfy k-anonymity yet still leak its
    sensitive attribute if (nearly) every member shares one value.
    Per (c_nationkey, c_mktsegment) class: row count, the number of
    DISTINCT sensitive buckets (account balance, 1000-wide — _BAL_W),
    and the at-risk flag (distinct-l < 5, _L_DIV) — the homogeneity-
    attack check a release pipeline runs after the k check passes.

    Determinism: the sensitive bucket is FLOOR of one IEEE division
    (integer-exact cross-engine); everything else is integer counts.
    100 TB: a distinct-count aggregate at (|QI classes| ×
    |sensitive buckets|) key cardinality with partial aggregation —
    the same shape and cost as the release aggregation being
    audited; no row-level shuffle."""
    g = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / _BAL_W).cast("int")
            )
            .cast("bigint")
            .alias("l_distinct"),
        )
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        "l_distinct",
        (F.col("l_distinct") < _L_DIV).alias("at_risk"),
    ).orderBy(
        F.col("c_nationkey").asc_nulls_last(),
        F.col("c_mktsegment").asc_nulls_last(),
    )


# log10(1 + 1/d), d = 1..9 — full-precision literals so both engines
# parse the identical double (never recomputed via log10 at runtime)
_BENFORD = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN '{d}' THEN CAST({v} AS DOUBLE)" for d, v in _BENFORD.items())
    + " END"
)


@query(
    "q_dq_benford",
    oracle=f"""
    WITH d AS (
      SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    g AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    t AS (SELECT SUM(n) AS total FROM g)
    SELECT g.digit, g.n,
           ROUND(g.n * 1.0 / t.total, 6) AS share,
           ROUND({_BENFORD_CASE}, 6) AS expected,
           ROUND(POW(g.n * 1.0 / t.total - {_BENFORD_CASE}, 2)
                 / {_BENFORD_CASE}, 6) AS chi_contrib
    FROM g, t
    ORDER BY g.digit ASC NULLS LAST
    """,
)
def q_dq_benford(spark, sf_dir):
    """Benford's-law first-digit audit on order totals — the
    synthetic-data / fraud screen: observed first-digit shares vs the
    log10(1+1/d) law plus per-digit chi-square contributions (the
    fixture's uniform synthetic prices VIOLATE the law loudly on
    digits 1-4 — exactly the signal the check exists to raise).

    Determinism: the first digit comes from the STRING form of
    floor(value) (no log10 at runtime anywhere — the expected shares
    are full-precision literals both engines parse to the identical
    double); share and chi_contrib are single-expression IEEE
    arithmetic over integer counts, ROUND(6)-ed for display. POW(x,2)
    is x·x on both engines — exempt from the transcendental-pow
    hazard. 100 TB: a 9-group map-side-combined aggregate; corpus
    size touches only the scan."""
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
                1,
                1,
            ).alias("digit")
        )
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = g.agg(F.sum("n").alias("total"))
    expected = F.expr(_BENFORD_CASE)
    share_raw = F.col("n") * 1.0 / F.col("total")
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(share_raw, 6).alias("share"),
            F.round(expected, 6).alias("expected"),
            F.round(
                F.pow(share_raw - expected, 2) / expected, 6
            ).alias("chi_contrib"),
        )
        .orderBy(F.col("digit").asc_nulls_last())
    )


# ---- calibration (ECE / Brier) ---------------------------------------

_CAL_BINS = 10  # reliability-diagram bins over [0, 1)


@query(
    "q_dq_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT {_h60_duck("concat('cal:', CAST(doc_id AS VARCHAR))")} % 1000
               AS sm,
             {_h60_duck("concat('lab:', CAST(doc_id AS VARCHAR))")} % 1000
               AS draw
      FROM documents
    ),
    labeled AS (
      SELECT sm,
             CAST(draw < 100 + (800 * sm) // 1000 AS INT) AS label
      FROM scored
    ),
    bins AS (
      SELECT sm // 100 AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(sm) AS BIGINT) AS sum_s,
             CAST(SUM(label) AS BIGINT) AS sum_l,
             CAST(SUM((sm - 1000 * label) * (sm - 1000 * label)) AS BIGINT)
               AS sq
      FROM labeled GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS big_n,
             CAST(SUM(ABS(sum_s - 1000 * sum_l)) AS BIGINT) AS ece_num,
             CAST(SUM(sq) AS BIGINT) AS brier_num
      FROM bins
    )
    SELECT CAST(bin AS INT) AS bin, n,
           ROUND(sum_s / (1000.0 * n), 6) AS conf,
           ROUND(sum_l * 1.0 / n, 6) AS acc,
           ROUND(ABS(sum_s - 1000 * sum_l) / (1000.0 * n), 6) AS gap,
           ROUND(ABS(sum_s - 1000 * sum_l) / (1000.0 * big_n), 6)
             AS ece_contrib,
           ROUND(ece_num / (1000.0 * big_n), 6) AS ece,
           ROUND(brier_num / (1000000.0 * big_n), 6) AS brier
    FROM bins, tot
    ORDER BY bin ASC NULLS LAST
    """,
)
def q_dq_calibration(spark, sf_dir):
    """Classifier-calibration audit — the reliability diagram, ECE
    (expected calibration error) and Brier score of a deterministic
    pseudo-classifier over documents: confidence sm/1000 with
    sm = h60('cal:'||doc_id) % 1000, label drawn by a second h60
    channel with true rate (100 + 800·sm/1000)/1000 — i.e. the
    classifier is miscalibrated by construction (slope 0.8, offset
    0.1), so every bin shows a non-trivial gap. Per 0.1-wide bin:
    n, mean confidence, empirical accuracy, |gap|, the bin's ECE
    contribution n/N·|gap|, plus the global ECE and Brier repeated on
    every row. The quality-score calibration check a curation
    pipeline runs before trusting q_pipe_classify/q_pipe_quality
    thresholds; companion to q_dq_prcurve (threshold sweep) — this is
    the probability-truthfulness axis PR curves cannot see.

    Exactness: every aggregate is an INTEGER sum — confidences are
    milli-units, so Σscore, Σlabel, the ECE numerator Σ|Σs − 1000·Σl|
    and the Brier numerator Σ(s − 1000·l)² are all exact BIGINTs on
    both engines regardless of partitioning/order; each output metric
    is ONE division of two exact integers, then ROUND 6 (no float
    accumulation anywhere — tighter than the usual ROUND-after-
    transcendental discipline, there is nothing transcendental here).

    100 TB: one scan, 10-key map-side-combinable agg with integer
    state; the bins×tot join is a 10-row broadcast."""
    d = load_table(spark, sf_dir, "documents").select(
        (h60(F.concat(F.lit("cal:"), F.col("doc_id").cast("string"))) % 1000)
        .alias("sm"),
        (h60(F.concat(F.lit("lab:"), F.col("doc_id").cast("string"))) % 1000)
        .alias("draw"),
    )
    labeled = d.select(
        "sm",
        (F.col("draw") < F.lit(100) + F.expr("(800 * sm) DIV 1000"))
        .cast("int")
        .alias("label"),
    )
    bins = labeled.groupBy(F.expr("sm DIV 100").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sm").cast("bigint").alias("sum_s"),
        F.sum("label").cast("bigint").alias("sum_l"),
        F.sum(F.expr("(sm - 1000 * label) * (sm - 1000 * label)"))
        .cast("bigint")
        .alias("sq"),
    )
    tot = bins.agg(
        F.sum("n").cast("bigint").alias("big_n"),
        F.sum(F.abs(F.col("sum_s") - 1000 * F.col("sum_l")))
        .cast("bigint")
        .alias("ece_num"),
        F.sum("sq").cast("bigint").alias("brier_num"),
    )
    gap_num = F.abs(F.col("sum_s") - 1000 * F.col("sum_l"))
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n",
            F.round(F.col("sum_s") / (1000.0 * F.col("n")), 6).alias("conf"),
            F.round(F.col("sum_l") * 1.0 / F.col("n"), 6).alias("acc"),
            F.round(gap_num / (1000.0 * F.col("n")), 6).alias("gap"),
            F.round(gap_num / (1000.0 * F.col("big_n")), 6).alias("ece_contrib"),
            F.round(F.col("ece_num") / (1000.0 * F.col("big_n")), 6).alias("ece"),
            F.round(
                F.col("brier_num") / (1000000.0 * F.col("big_n")), 6
            ).alias("brier"),
        )
        .orderBy(F.col("bin").asc_nulls_last())
    )


# ---- t-closeness (ordered EMD) ---------------------------------------

# at-risk threshold t = 1/5: the flag compares 5·emd_num against the
# integer denominator, so the decision never touches a float.
_T_CLOSE_INV = 5


@query(
    "q_dq_tclose",
    oracle=f"""
    WITH lab AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / {_BAL_W}) AS INT) AS b
      FROM customer
    ),
    gb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM lab GROUP BY b),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                  CAST(SUM(nb) AS BIGINT) AS big_n
           FROM gb),
    gcum AS (
      SELECT b,
             CAST(SUM(nb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_b
      FROM gb
    ),
    cls AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_c
      FROM lab GROUP BY 1, 2
    ),
    cb AS (
      SELECT c_nationkey, c_mktsegment, b, CAST(COUNT(*) AS BIGINT) AS ncb
      FROM lab GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_c, g.b,
             COALESCE(cb.ncb, 0) AS ncb
      FROM cls
      CROSS JOIN (SELECT b FROM gb) g
      LEFT JOIN cb ON cb.c_nationkey = cls.c_nationkey
                  AND cb.c_mktsegment = cls.c_mktsegment
                  AND cb.b = g.b
    ),
    ccum AS (
      SELECT c_nationkey, c_mktsegment, n_c, b,
             CAST(SUM(ncb) OVER (PARTITION BY c_nationkey, c_mktsegment
                                 ORDER BY b ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cb
      FROM grid
    ),
    emd AS (
      SELECT c.c_nationkey, c.c_mktsegment, c.n_c,
             CAST(SUM(ABS(c.cum_cb * mm.big_n - g.cum_b * c.n_c))
                  AS BIGINT) AS emd_num
      FROM ccum c JOIN gcum g ON g.b = c.b, mm
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, n_c AS n,
           ROUND(emd_num
                 / (CAST(n_c AS DOUBLE) * big_n * (mm.m - 1)), 6) AS emd,
           ({_T_CLOSE_INV} * emd_num > n_c * big_n * (mm.m - 1)) AS at_risk
    FROM emd, mm
    ORDER BY c_nationkey ASC NULLS LAST, c_mktsegment ASC NULLS LAST
    """,
)
def q_dq_tclose(spark, sf_dir):
    """t-closeness audit — the third gate of the release-privacy
    triple (q_dq_kanon counts small classes, q_dq_ldiv counts
    sensitive-value variety, THIS measures how far each class's
    sensitive DISTRIBUTION sits from the global one): a class can be
    k-anonymous and l-diverse yet still leak ("this class skews
    rich"). Distance is the 1-D ordered Earth Mover's Distance over
    the 1000-wide account-balance buckets (q_dq_ldiv's bucketing),
    normalized by (m−1); at_risk flags EMD > t = 0.2.

    Exactness (the q_dq_calibration integer discipline): cumulative
    class and global histograms are BIGINT window sums over the
    zero-filled bucket grid; each |ΔCDF| term is the INTEGER
    |cum_cb·N − cum_b·N_c| over the common denominator N_c·N, so the
    EMD numerator is an exact BIGINT sum — one division + ROUND(6)
    for display, and the at-risk decision is the pure-integer
    comparison 5·emd_num > N_c·N·(m−1), immune to rounding at the
    threshold boundary.

    100 TB: ONE map-side-combinable customer scan (the class×bucket
    rollup, eagerly materialized at grid size); the bucket histogram
    and class totals are rollups of that grid, and everything
    downstream runs on |classes|×|buckets| rows (here 125×11) —
    broadcast joins, no row-level shuffle after the first rollup."""
    lab = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _BAL_W).cast("int").alias("b"),
    )
    # ONE corpus scan: the finest rollup (class × bucket) materializes
    # eagerly at grid size, and the bucket histogram and class totals
    # are O(grid) rollups OF IT — uncheckpointed, gb/cls/grid each
    # re-executed the customer scan (review r7, the q_evt_autocorr
    # twin of the q_sim_mmr pool-cache finding).
    cb = (
        lab.groupBy("c_nationkey", "c_mktsegment", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ncb"))
        .localCheckpoint(eager=True)
    )
    gb = cb.groupBy("b").agg(F.sum("ncb").cast("bigint").alias("nb"))
    mm = gb.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("nb").cast("bigint").alias("big_n"),
    )
    w_g = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    gcum = gb.select("b", F.sum("nb").over(w_g).cast("bigint").alias("cum_b"))
    cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("ncb").cast("bigint").alias("n_c")
    )
    grid = (
        cls.crossJoin(F.broadcast(gb.select("b")))
        .join(cb, ["c_nationkey", "c_mktsegment", "b"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_c",
            "b",
            F.coalesce(F.col("ncb"), F.lit(0).cast("bigint")).alias("ncb"),
        )
    )
    w_c = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ccum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "n_c",
        "b",
        F.sum("ncb").over(w_c).cast("bigint").alias("cum_cb"),
    )
    emd = (
        ccum.join(F.broadcast(gcum), "b")
        .crossJoin(F.broadcast(mm))
        .groupBy("c_nationkey", "c_mktsegment", "n_c", "big_n", "m")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_cb") * F.col("big_n")
                    - F.col("cum_b") * F.col("n_c")
                )
            )
            .cast("bigint")
            .alias("emd_num")
        )
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_c").alias("n"),
        F.round(
            F.col("emd_num")
            / (
                F.col("n_c").cast("double")
                * F.col("big_n")
                * (F.col("m") - 1)
            ),
            6,
        ).alias("emd"),
        (
            _T_CLOSE_INV * F.col("emd_num")
            > F.col("n_c") * F.col("big_n") * (F.col("m") - 1)
        ).alias("at_risk"),
    ).orderBy(
        F.col("c_nationkey").asc_nulls_last(),
        F.col("c_mktsegment").asc_nulls_last(),
    )


# ---- chi-square independence (contingency grid) ----------------------


@query(
    "q_dq_chi2",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    r AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS rn FROM o GROUP BY 1),
    c AS (SELECT source, CAST(SUM(n) AS BIGINT) AS cn FROM o GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM o),
    grid AS (
      SELECT r.lang, c.source, r.rn, c.cn, COALESCE(o.n, 0) AS n
      FROM r CROSS JOIN c
      LEFT JOIN o ON o.lang = r.lang AND o.source = c.source
    ),
    cell AS (
      SELECT g.lang, g.source, g.n,
             ROUND(g.rn * g.cn / (1.0 * t.big_n), 6) AS expected,
             (g.n * t.big_n - g.rn * g.cn) * (g.n * t.big_n - g.rn * g.cn)
               / (1.0 * t.big_n * g.rn * g.cn) AS chi_raw
      FROM grid g, t
    )
    SELECT lang, source, n, expected,
           ROUND(chi_raw, 6) AS chi_contrib,
           ROUND(SUM(chi_raw) OVER (ORDER BY lang, source
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW), 6) AS chi_cum
    FROM cell
    ORDER BY lang ASC NULLS LAST, source ASC NULLS LAST
    """,
)
def q_dq_chi2(spark, sf_dir):
    """Chi-square independence test over the (lang × source)
    contingency grid — "does source composition differ by language",
    the mix-shift alarm a multilingual corpus pipeline runs per
    ingest; the two-categorical companion to q_evt_seasonality's
    one-dimensional goodness-of-fit and q_dq_drift's one-variable
    PSI. Per zero-filled cell: observed n, expected rn·cn/N, the cell
    contribution (O·N − rn·cn)²/(N·rn·cn), and the running total
    whose last row is the χ² statistic.

    Exactness: observed/row/column/grand totals are exact BIGINT sums;
    each cell's numerator (O·N − rn·cn)² stays INTEGER, so the
    contribution is one integer-by-double division — identical IEEE
    doubles on both engines — and the running total is a sequential
    frame fold over the uniquely-ordered 100-row grid (CUSUM-exact),
    ROUND 6 applied only at display.

    100 TB: one scan into a |langs|×|sources|-key map-side agg; the
    marginals, grid, and fold all run on ≤100 rows."""
    o = load_table(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=True)
    r = o.groupBy("lang").agg(F.sum("n").cast("bigint").alias("rn"))
    c = o.groupBy("source").agg(F.sum("n").cast("bigint").alias("cn"))
    t = o.agg(F.sum("n").cast("bigint").alias("big_n"))
    grid = (
        r.crossJoin(F.broadcast(c))
        .join(o, ["lang", "source"], "left")
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            "rn",
            "cn",
            "big_n",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
        )
    )
    num = F.col("n") * F.col("big_n") - F.col("rn") * F.col("cn")
    chi_raw = (num * num) / (
        F.lit(1.0) * F.col("big_n") * F.col("rn") * F.col("cn")
    )
    cell = grid.select(
        "lang",
        "source",
        "n",
        F.round(F.col("rn") * F.col("cn") / (F.lit(1.0) * F.col("big_n")), 6)
        .alias("expected"),
        chi_raw.alias("chi_raw"),
    )
    w = Window.orderBy("lang", "source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cell.select(
        "lang",
        "source",
        "n",
        "expected",
        F.round(F.col("chi_raw"), 6).alias("chi_contrib"),
        F.round(F.sum("chi_raw").over(w), 6).alias("chi_cum"),
    ).orderBy(F.col("lang").asc_nulls_last(), F.col("source").asc_nulls_last())
